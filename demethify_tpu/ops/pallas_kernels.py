"""Pallas TPU kernels: fused bandwidth-optimal passes for the solver loops.

Profiling the XLA Gram-form solver shows two traffic sinks per outer
iteration on megabase inputs:
  (a) the u inner loop: n_iter2 (=20) HBM round-trips over the
      (n_cpg x n_u)-sized u/u_prev/C/M arrays, ~1 GB per outer iteration
      at 1M sites;
  (b) the C/M and G/b/ydy precompute passes over Y, D, R.

Two kernels eliminate (a) and fuse (b):

- `u_phase`: ONE pass per outer iteration. For each CpG lane-tile it builds
  C and M in VMEM from (Yt, Dt, Rt) and runs the ENTIRE n_iter2-step FISTA
  loop on the tile without touching HBM, then writes u/u_prev back. The
  per-tile FISTA is exact: the U update is row-separable given alpha
  (SURVEY.md: "no comms in the U step").
- `grams`: one pass computing the per-sample Grams G = R diag(d_s) R',
  b = R'(d_s*y_s) and ydy, accumulated across the sequential grid.

Layout: kernels run on TRANSPOSED arrays — (n_s, n_cpg), (p, n_cpg) — so
the huge CpG axis sits on TPU lanes (128-wide, fully utilized) and the tiny
sample/celltype axes on sublanes. The pallas solver variant keeps its whole
while_loop state transposed and transposes once at entry/exit.

All kernels run in interpret mode off-TPU so the same tests cover them on
the CPU mesh.

The DEFAULT single-device solver path is `u_phase_grams` (the
outer-iteration megakernel, below) via solvers/fused.py. MEASURED (TPU
v5e, 1M sites x 10 samples, n_u=1, device time from jax.profiler): the
megakernel solver runs 0.16-0.19 ms/outer-iter against a 0.144 ms HBM
traffic bound, vs 0.568 ms for the XLA Gram-form solver. `u_phase` and
`grams` are kept as tested single-phase infrastructure; the small
LANE_TILE default they use predates the tile study (larger tiles
amortize per-grid-step overhead — see MEGA_TILE).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE_TILE = 2048


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _pad_lanes(x, tile):
    n = x.shape[-1]
    target = ((n + tile - 1) // tile) * tile
    if target == n:
        return x, n
    pad = [(0, 0)] * (x.ndim - 1) + [(0, target - n)]
    return jnp.pad(x, pad), n


# ---------------------------------------------------------------------------
# u_phase: fused C/M build + full inner FISTA loop, one HBM pass
# ---------------------------------------------------------------------------

def _u_phase_kernel(scal_ref, a1b_ref, a2b_ref, yt_ref, dt_ref, rtt_ref,
                    u_ref, up_ref, u_out_ref, up_out_ref, *, n_steps,
                    n_u, lagged):
    a0_init = scal_ref[0, 0]
    l_w = scal_ref[0, 1]
    l_w_prev0 = scal_ref[0, 2]

    state_dt = u_ref.dtype
    yt = yt_ref[:].astype(state_dt)
    dt = dt_ref[:].astype(state_dt)
    a2b = a2b_ref[:]                      # (n_u, n_s)

    if rtt_ref is not None:
        # resid_known = (Y - Rt a1)^T = Yt - a1' Rt_t
        resid = yt - jax.lax.dot_general(
            a1b_ref[:], rtt_ref[:], (((0,), (0,)), ((), ())),
            preferred_element_type=yt.dtype)
    else:
        resid = yt
    c = jax.lax.dot_general(a2b, dt * resid, (((1,), (0,)), ((), ())),
                            preferred_element_type=yt.dtype)  # (n_u, T)

    # M rows: m[(u,v), :] = sum_s a2[u,s] a2[v,s] d[s,:]
    w2 = (a2b[:, None, :] * a2b[None, :, :]).reshape(n_u * n_u,
                                                     a2b.shape[1])
    m = jax.lax.dot_general(w2, dt, (((1,), (0,)), ((), ())),
                            preferred_element_type=yt.dtype)
    m3 = m.reshape(n_u, n_u, m.shape[-1])

    def body(_, carry):
        u, up, a, l_prev = carry
        a0 = a
        a1n = (1.0 + jnp.sqrt(1.0 + 4.0 * a0 * a0)) / 2.0
        beta = jnp.minimum((a0 - 1.0) / a1n,
                           0.9999 * jnp.sqrt(l_prev / l_w))
        u_t = u + beta * (u - up)
        grad_at = u if lagged else u_t
        mdotu = jnp.sum(m3 * grad_at[None, :, :], axis=1)   # (n_u, T)
        u_new = jnp.clip(u_t + (c - mdotu) / l_w, 0.0, 1.0)
        return (u_new, u, a1n, l_w)

    carry = (u_ref[:], up_ref[:], a0_init, l_w_prev0)
    if n_steps <= 64:     # unrolled: hoists the serial scalar chain
        for _ in range(n_steps):
            carry = body(None, carry)
        u, up, _, _ = carry
    else:
        u, up, _, _ = jax.lax.fori_loop(0, n_steps, body, carry)
    u_out_ref[:] = u
    up_out_ref[:] = up


def u_phase(yt, dt, rtt, a1_block, a2_block, ut, u_prev_t,
            a, l_w, l_w_prev, n_steps: int, *, lagged: bool = False,
            tile: int = LANE_TILE):
    """Run the full U FISTA inner loop in one fused pass.

    Transposed operands: yt/dt (n_s, N), rtt (n_ct, N) or None
    (unsupervised), a1_block (n_ct, n_s) or None, a2_block (n_u, n_s),
    ut/u_prev_t (n_u, N). Returns (ut, u_prev_t, a_new, l_w_prev_new).
    `lagged=True` evaluates the gradient at the previous iterate
    (reference unsupervised quirk, deconvolution.py:163).
    """
    n_u, n_s = a2_block.shape
    n = yt.shape[-1]
    yt, _ = _pad_lanes(yt, tile)
    dt, _ = _pad_lanes(dt, tile)
    ut, _ = _pad_lanes(ut, tile)
    u_prev_t, _ = _pad_lanes(u_prev_t, tile)
    npad = yt.shape[-1]
    grid = (npad // tile,)

    state_dt = ut.dtype
    scal = jnp.reshape(jnp.stack([a.astype(state_dt),
                                  l_w.astype(state_dt),
                                  l_w_prev.astype(state_dt)]), (1, 3))

    lane_spec = lambda rows: pl.BlockSpec(  # noqa: E731
        (rows, tile), lambda k: (0, k), memory_space=pltpu.VMEM)
    full_spec = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda k: (0, 0), memory_space=pltpu.VMEM)

    has_known = rtt is not None
    if has_known:
        rtt, _ = _pad_lanes(rtt, tile)
        n_ct = rtt.shape[0]
        in_specs = [
            pl.BlockSpec((1, 3), lambda k: (0, 0),
                         memory_space=pltpu.SMEM),
            full_spec((n_ct, n_s)), full_spec((n_u, n_s)),
            lane_spec(n_s), lane_spec(n_s), lane_spec(n_ct),
            lane_spec(n_u), lane_spec(n_u),
        ]
        args = (scal, a1_block, a2_block, yt, dt, rtt, ut, u_prev_t)
        kern = functools.partial(_u_phase_kernel, n_steps=n_steps,
                                 n_u=n_u, lagged=lagged)
    else:
        dummy = jnp.zeros((1, 1), state_dt)
        in_specs = [
            pl.BlockSpec((1, 3), lambda k: (0, 0),
                         memory_space=pltpu.SMEM),
            full_spec((1, 1)), full_spec((n_u, n_s)),
            lane_spec(n_s), lane_spec(n_s),
            lane_spec(n_u), lane_spec(n_u),
        ]
        args = (scal, dummy, a2_block, yt, dt, ut, u_prev_t)

        def kern(scal_ref, _dummy, a2b_ref, yt_ref, dt_ref, u_ref,
                 up_ref, u_out_ref, up_out_ref):
            _u_phase_kernel(scal_ref, None, a2b_ref, yt_ref, dt_ref, None,
                            u_ref, up_ref, u_out_ref, up_out_ref,
                            n_steps=n_steps, n_u=n_u, lagged=lagged)

    out_spec = [lane_spec(n_u), lane_spec(n_u)]
    # outputs carry the solver STATE dtype (float32 even when storage is
    # bfloat16), matching the while_loop carry
    state_dtype = ut.dtype
    u_new, up_new = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=[jax.ShapeDtypeStruct((n_u, npad), state_dtype)] * 2,
        interpret=_interpret(),
    )(*args)

    # scalar FISTA bookkeeping replayed outside (data-independent)
    def scal_body(_, carry):
        a, l_prev = carry
        a1n = (1.0 + jnp.sqrt(1.0 + 4.0 * a * a)) / 2.0
        return (a1n, l_w)

    a_new, l_w_prev_new = jax.lax.fori_loop(0, n_steps, scal_body,
                                            (a, l_w_prev))
    return u_new[:, :n], up_new[:, :n], a_new, l_w_prev_new


# ---------------------------------------------------------------------------
# u_phase_grams: the outer-iteration megakernel — ONE HBM pass per outer
# iteration. Per lane-tile it (a) builds C/M in VMEM, (b) runs the entire
# n_iter2 FISTA U loop, (c) writes u/u_prev back, and (d) accumulates the
# u-dependent Gram blocks (G_:u rows, b_u, sum u^2) with the NEW u — so the
# alpha phase, Lipschitz refresh and Gram-identity cost need zero further
# passes over (Y, D, R). The u-update is row-separable given alpha
# (SURVEY.md §2b) and the Gram sums are tile-local partial sums, so the
# fusion is exact. Big-array traffic per outer iteration: read Y, D, Rt,
# u, u_prev once; write u, u_prev — the information-theoretic minimum for
# the reference's update semantics (`demethify/deconvolution.py:190-223`).
# ---------------------------------------------------------------------------

MEGA_TILE = 24576   # measured best on v5e (0.191 vs 0.217 ms/iter at 16384)


def _u_phase_grams_kernel(scal_ref, a1b_ref, a2b_ref, yt_ref, dt_ref,
                          rtt_ref, u_ref, up_ref,
                          u_out_ref, up_out_ref, gu_ref, bu_ref, usq_ref,
                          *, n_steps, n_u, lagged, bf16_compute=False,
                          packed_n_s=0):
    k = pl.program_id(0)
    a0_init = scal_ref[0, 0]
    l_w = scal_ref[0, 1]
    l_w_prev0 = scal_ref[0, 2]

    state_dt = u_ref.dtype
    # bf16_compute: the (n_s|n_ct, T) data blocks stay bf16 end-to-end —
    # consumed directly by the MXU dots (f32 outputs via
    # preferred_element_type) and by bf16 VPU elementwise products —
    # instead of paying a VPU convert per block per pass (measured to
    # eat the entire halved-DMA saving of bf16 storage, ROADMAP r4).
    # The FISTA state/coefficients and every dot OUTPUT stay f32; the
    # accuracy change is bf16 rounding of dy/dresid/drt products
    # (flag-gated; default path is bit-identical to before).
    data_dt = yt_ref.dtype if bf16_compute else state_dt
    # packed_n_s > 0: PACKED-IO mode — yt_ref is one block holding
    # [Y.T; D.T] (+ the Rt.T rows when the block is taller than
    # 2 n_s) and u_ref one (2 n_u, T) block holding [u; u_prev]
    # (dt_ref/rtt_ref/up_ref are None). Cuts the async copies per grid
    # step (7 -> 4, or 3 with Rt folded in): measured n_iter2=1 ==
    # n_iter2=20 shows the kernel is DMA-issue-bound, not VPU-bound.
    # Row-slicing a loaded VMEM block is value-exact, so trajectories
    # are bit-identical to the unpacked layout.
    if packed_n_s:
        yd = yt_ref[:]
        yt = yd[:packed_n_s].astype(data_dt)
        dt = yd[packed_n_s:2 * packed_n_s].astype(data_dt)
        rtt_raw = (yd[2 * packed_n_s:]
                   if yd.shape[0] > 2 * packed_n_s else None)
        uu_in = u_ref[:]
        u_ld, up_ld = uu_in[:n_u], uu_in[n_u:]
    else:
        yt = yt_ref[:].astype(data_dt)
        dt = dt_ref[:].astype(data_dt)
        rtt_raw = None
        u_ld, up_ld = u_ref[:], up_ref[:]
    if rtt_ref is not None:
        rtt_raw = rtt_ref[:]
    a2b = a2b_ref[:]                      # (n_u, n_s)

    dy = dt * yt                          # reused by C and b_u
    if rtt_raw is not None:
        rtt = rtt_raw.astype(data_dt)
        if bf16_compute:
            # Mosaic requires 32-bit matmul accumulators, so a bf16
            # `known` block is not expressible — and an f32 one would
            # reintroduce the (n_s, T) converts. Skip the known/dresid
            # intermediates: C is built below as c1 - c2 over drt rows
            # (the multi kernel's algebra), all-bf16 operands with f32
            # dot outputs.
            known = None
            dresid = dy
            drt = jnp.concatenate(
                [dt * rtt[cc][None, :] for cc in range(rtt.shape[0])],
                axis=0)                               # (n_ct*n_s, T)
        else:
            known = jax.lax.dot_general(
                a1b_ref[:], rtt, (((0,), (0,)), ((), ())),
                preferred_element_type=state_dt)      # (n_s, T)
            dresid = dy - dt * known
            drt = None
    else:
        rtt = None
        dresid = dy
        drt = None
    T = dt.shape[-1]
    SUB = 8
    Tf = T // SUB

    # Two in-VMEM dataflows for the FISTA gradient, both reading the same
    # HBM blocks (unlike the XLA-level gram/direct split, this is purely
    # a VPU-work tradeoff): the GRAM form precomputes C and the per-site
    # curvature rows M (n_u^2 rows) and each step costs O(n_u^2 T); the
    # DIRECT form keeps d*(y - Rt a1) and redoes the two small-K dots per
    # step at O(n_s T). Mirrors ops/fista.use_gram_u.
    use_gram = n_u * n_u <= 3 * dt.shape[0]
    if not use_gram and bf16_compute:
        # the direct dataflow re-reads dresid/dt every step; per-step
        # bf16 math is not worth the accuracy churn — upcast once and
        # rebuild the known-block residual the legacy way
        dt = dt.astype(state_dt)
        dresid = dresid.astype(state_dt)
        if rtt is not None:
            rtt = rtt.astype(state_dt)
            known = jax.lax.dot_general(
                a1b_ref[:], rtt, (((0,), (0,)), ((), ())),
                preferred_element_type=state_dt)
            dresid = dresid - dt * known
        data_dt = state_dt

    if use_gram:
        c = jax.lax.dot_general(a2b.astype(data_dt), dresid,
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=state_dt)
        if drt is not None:
            # bf16 branch: subtract the known-block term
            #   c2[u] = sum_{c,s} (a2b[u,s] a1b[c,s]) (d[s] rtt[c])
            # via one (n_u, n_ct n_s) x (n_ct n_s, T) dot over the drt
            # rows (c-major to match drt's concat order)
            a1b = a1b_ref[:]
            n_ct_c = a1b.shape[0]
            wk = jnp.concatenate(
                [a2b * a1b[cc][None, :] for cc in range(n_ct_c)],
                axis=1)                               # (n_u, n_ct n_s)
            c = c - jax.lax.dot_general(
                wk.astype(data_dt), drt, (((1,), (0,)), ((), ())),
                preferred_element_type=state_dt)
        w2 = (a2b[:, None, :] * a2b[None, :, :]).reshape(
            n_u * n_u, a2b.shape[1])
        m = jax.lax.dot_general(w2.astype(data_dt), dt,
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=state_dt)
        # Fold the lane axis into sublanes: a (n_u, T) array keeps only
        # n_u of 8 VPU sublanes busy; as (n_u, 8, T/8) every elementwise
        # step runs fully packed. The update is elementwise in T, so the
        # (bijective) reshape commutes with it exactly.
        c8 = c.reshape(n_u, SUB, Tf)
        m8 = m.reshape(n_u, n_u, SUB, Tf)
        # Pre-scale by 1/l_w outside the loop: the per-step update
        # becomes clip(fma(u_t, 1 - m/l, c/l)) for n_u = 1 — the VPU
        # floor drops from ~8 to ~5 ops/step. Mathematically identical
        # to clip(u_t + (c - m u_t)/l); rounding differs in the last ulp.
        kc8 = c8 / l_w
        km8 = m8 / l_w

        if n_u == 1:
            km1 = 1.0 - km8[:, 0]                       # (1, SUB, Tf)
            kmn = km8[:, 0]

            def step_fn(u_t, grad_at):
                if lagged:
                    return u_t + (kc8 - kmn * grad_at)
                return u_t * km1 + kc8
        else:
            # COMPONENT-LIST coupled step (round 4, mirrors the multi
            # kernel): the (n_u, n_u, SUB, Tf) coefficient array is
            # sliced ONCE into affine-folded (SUB, Tf) blocks
            # (a4 = delta - km) — slicing/broadcasting it inside the
            # unrolled loop makes Mosaic emit a relayout per step
            # (measured 3.6x on the multi form of the same step).
            kcs = [kc8[i] for i in range(n_u)]
            a4s = [[(1.0 - km8[i, j]) if (i == j and not lagged)
                    else -km8[i, j] for j in range(n_u)]
                   for i in range(n_u)]

            def step_lists(uts, grad):
                new = []
                for i in range(n_u):
                    acc = (uts[i] + kcs[i]) if lagged else kcs[i]
                    for v in range(n_u):
                        acc = acc + a4s[i][v] * grad[v]
                    new.append(jnp.clip(acc, 0.0, 1.0))
                return new

            step_fn = step_lists

        fold = lambda x: x.reshape(n_u, SUB, Tf)        # noqa: E731
        unfold = lambda x: x.reshape(n_u, T)            # noqa: E731
    else:
        a2bT = a2b.T                                     # (n_s, n_u)

        def step_fn(u_t, grad_at):
            model = jax.lax.dot_general(
                a2bT, grad_at, (((1,), (0,)), ((), ())),
                preferred_element_type=state_dt)        # (n_s, T)
            resid = dresid - dt * model
            grad = jax.lax.dot_general(
                a2b, resid, (((1,), (0,)), ((), ())),
                preferred_element_type=state_dt)        # (n_u, T)
            return u_t + grad / l_w

        fold = unfold = lambda x: x                      # noqa: E731

    component_lists = use_gram and n_u >= 2

    def scalars(a, l_prev):
        a1n = (1.0 + jnp.sqrt(1.0 + 4.0 * a * a)) / 2.0
        beta = jnp.minimum((a - 1.0) / a1n,
                           0.9999 * jnp.sqrt(l_prev / l_w))
        return a1n, beta

    if component_lists:
        def body(_, carry):
            us, ups, a, l_prev = carry
            a1n, beta = scalars(a, l_prev)
            uts = [us[v] + beta * (us[v] - ups[v]) for v in range(n_u)]
            new = step_fn(uts, us if lagged else uts)
            return (tuple(new), us, a1n, l_w)
    else:
        def body(_, carry):
            u, up, a, l_prev = carry
            a1n, beta = scalars(a, l_prev)
            u_t = u + beta * (u - up)
            u_new = jnp.clip(step_fn(u_t, u if lagged else u_t),
                             0.0, 1.0)
            return (u_new, u, a1n, l_w)

    # UNROLLED when small: each step's momentum scalar (sqrt/min) is a
    # serial scalar-unit chain; unrolling lets Mosaic hoist the whole
    # scalar sequence and keep the VPU busy (mirrors ops/fista._run_steps).
    # Long schedules (purity: 500) unroll in chunks inside the fori_loop
    # (Mosaic's scan lowering only supports unroll=1, so chunk manually).
    if component_lists:
        u8 = fold(u_ld)
        up8 = fold(up_ld)
        carry = (tuple(u8[i] for i in range(n_u)),
                 tuple(up8[i] for i in range(n_u)),
                 a0_init, l_w_prev0)
    else:
        carry = (fold(u_ld), fold(up_ld), a0_init, l_w_prev0)
    if n_steps <= 64:
        for _ in range(n_steps):
            carry = body(None, carry)
        u, up, _, _ = carry
    else:
        chunk = next(c for c in (125, 100, 64, 50, 32, 25, 20, 16, 10,
                                 8, 5, 4, 2, 1)
                     if n_steps % c == 0)

        def chunk_body(_, carry):
            for _ in range(chunk):
                carry = body(None, carry)
            return carry

        u, up, _, _ = jax.lax.fori_loop(0, n_steps // chunk, chunk_body,
                                        carry)
    if component_lists:
        u = jnp.concatenate([x[None] for x in u], axis=0)
        up = jnp.concatenate([x[None] for x in up], axis=0)
    u = unfold(u)
    up = unfold(up)
    if packed_n_s:
        u_out_ref[:] = jnp.concatenate([u, up], axis=0)
    else:
        u_out_ref[:] = u
        up_out_ref[:] = up

    # Gram partial sums with the NEW u (padded lanes have d = y = u = 0,
    # so they contribute nothing)
    acc = gu_ref.dtype
    n_s = dt.shape[0]
    if bf16_compute and data_dt != state_dt:
        # one (n_u, T) convert of u; all (rows, T) gram operands stay
        # bf16 and the dots accumulate f32 via preferred_element_type.
        # (the direct-dataflow fallback above resets data_dt to f32, in
        # which case the legacy gram casts below apply)
        u_g = u.astype(data_dt)
        cast = lambda x: x                              # noqa: E731
    else:
        u_g = u
        cast = lambda x: x.astype(acc)                  # noqa: E731
    du = (dt[:, None, :] * u_g[None, :, :]).reshape(n_s * n_u,
                                                    dt.shape[-1])
    rhs = u_g if rtt is None else jnp.concatenate([rtt, u_g], axis=0)
    gu_part = jax.lax.dot_general(
        cast(du), cast(rhs), (((1,), (1,)), ((), ())),
        preferred_element_type=acc).reshape(gu_ref.shape)
    bu_part = jax.lax.dot_general(
        cast(u_g), cast(dy), (((1,), (1,)), ((), ())),
        preferred_element_type=acc)                       # (n_u, n_s)
    uacc = u.astype(acc)
    usq_part = jnp.sum(uacc * uacc, keepdims=True)

    @pl.when(k == 0)
    def _():
        gu_ref[:] = gu_part
        bu_ref[:] = bu_part
        usq_ref[:] = usq_part

    @pl.when(k > 0)
    def _():
        gu_ref[:] = gu_ref[:] + gu_part
        bu_ref[:] = bu_ref[:] + bu_part
        usq_ref[:] = usq_ref[:] + usq_part


def u_phase_grams(yt, dt, rtt, a1_block, a2_block, ut, u_prev_t,
                  a, l_w, l_w_prev, n_steps: int, *, lagged: bool = False,
                  bf16_compute: bool = False, tile: int = MEGA_TILE):
    """Fused outer-iteration pass: full U FISTA loop + new-u Gram blocks.

    ``bf16_compute`` (bf16-storage inputs only): consume the bf16 data
    blocks directly in the MXU dots / bf16 VPU products instead of
    upcasting per pass — see the kernel comment. Flag-gated accuracy
    change; ignored (with the exact legacy dataflow) for f32/f64 data.

    Transposed operands as in `u_phase`. Returns
    ``(ut, u_prev_t, a_new, l_w_prev_new, gu, b_u, usq)`` where
    ``gu``: (n_s, n_u, p_r) with ``gu[s, u, q] = sum_i u_iu d_is Rext_iq``
    over ``Rext = [Rt | u]`` (or ``[u]`` when ``rtt is None``),
    ``b_u``: (n_u, n_s) = u' (d_s * y_s), and ``usq``: scalar sum(u*u).
    The returned u arrays keep the caller's (unpadded) lane count.
    """
    n_u, n_s = a2_block.shape
    n = yt.shape[-1]
    yt, _ = _pad_lanes(yt, tile)
    dt, _ = _pad_lanes(dt, tile)
    ut, _ = _pad_lanes(ut, tile)
    u_prev_t, _ = _pad_lanes(u_prev_t, tile)
    npad = yt.shape[-1]
    grid = (npad // tile,)

    state_dtype = ut.dtype
    from demethify_tpu.ops.gram import accum_dtype
    acc = accum_dtype(yt)
    # the flag only means something for 16-bit data; for f32/f64 the
    # legacy dataflow is used verbatim (bit-identical)
    bf16 = bool(bf16_compute) and jnp.dtype(yt.dtype) == jnp.bfloat16
    scal = jnp.reshape(jnp.stack([a.astype(state_dtype),
                                  l_w.astype(state_dtype),
                                  l_w_prev.astype(state_dtype)]), (1, 3))

    lane_spec = lambda rows: pl.BlockSpec(  # noqa: E731
        (rows, tile), lambda k: (0, k), memory_space=pltpu.VMEM)
    full_spec = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda k: tuple(0 for _ in shape),
        memory_space=pltpu.VMEM)

    has_known = rtt is not None
    n_ct = rtt.shape[0] if has_known else 0
    p_r = n_ct + n_u

    if has_known:
        rtt, _ = _pad_lanes(rtt, tile)
        in_specs = [
            pl.BlockSpec((1, 3), lambda k: (0, 0),
                         memory_space=pltpu.SMEM),
            full_spec((n_ct, n_s)), full_spec((n_u, n_s)),
            lane_spec(n_s), lane_spec(n_s), lane_spec(n_ct),
            lane_spec(n_u), lane_spec(n_u),
        ]
        args = (scal, a1_block, a2_block, yt, dt, rtt, ut, u_prev_t)
        kern = functools.partial(_u_phase_grams_kernel, n_steps=n_steps,
                                 n_u=n_u, lagged=lagged,
                                 bf16_compute=bf16)
    else:
        dummy = jnp.zeros((1, 1), state_dtype)
        in_specs = [
            pl.BlockSpec((1, 3), lambda k: (0, 0),
                         memory_space=pltpu.SMEM),
            full_spec((1, 1)), full_spec((n_u, n_s)),
            lane_spec(n_s), lane_spec(n_s),
            lane_spec(n_u), lane_spec(n_u),
        ]
        args = (scal, dummy, a2_block, yt, dt, ut, u_prev_t)

        def kern(scal_ref, _dummy, a2b_ref, yt_ref, dt_ref, u_ref,
                 up_ref, *out_refs):
            _u_phase_grams_kernel(scal_ref, None, a2b_ref, yt_ref, dt_ref,
                                  None, u_ref, up_ref, *out_refs,
                                  n_steps=n_steps, n_u=n_u, lagged=lagged,
                                  bf16_compute=bf16)

    out_specs = [lane_spec(n_u), lane_spec(n_u),
                 full_spec((n_s, n_u, p_r)), full_spec((n_u, n_s)),
                 full_spec((1, 1))]
    # donate the u/u_prev buffers into the matching outputs — without
    # this XLA inserts a copy of each (n_u, N) array every outer
    # iteration to keep the while-loop carry intact
    n_in = len(args)
    u_new, up_new, gu, b_u, usq = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[jax.ShapeDtypeStruct((n_u, npad), state_dtype),
                   jax.ShapeDtypeStruct((n_u, npad), state_dtype),
                   jax.ShapeDtypeStruct((n_s, n_u, p_r), acc),
                   jax.ShapeDtypeStruct((n_u, n_s), acc),
                   jax.ShapeDtypeStruct((1, 1), acc)],
        input_output_aliases={n_in - 2: 0, n_in - 1: 1},
        # raise the 16 MB default scoped-VMEM limit (see the multi
        # kernel's call site) — tiles beyond ~24k lanes exceed it
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 2 ** 20),
        interpret=_interpret(),
    )(*args)

    def scal_body(_, carry):
        a, l_prev = carry
        a1n = (1.0 + jnp.sqrt(1.0 + 4.0 * a * a)) / 2.0
        return (a1n, l_w)

    a_new, l_w_prev_new = jax.lax.fori_loop(0, n_steps, scal_body,
                                            (a, l_w_prev))
    return (u_new[:, :n], up_new[:, :n], a_new, l_w_prev_new,
            gu, b_u, usq[0, 0])


def u_phase_grams_packed(ydt, rtt, a1_block, a2_block, uut,
                         a, l_w, l_w_prev, n_steps: int, *,
                         lagged: bool = False,
                         bf16_compute: bool = False,
                         tile: int = MEGA_TILE):
    """PACKED-IO u_phase_grams: same math, fewer DMA streams.

    ``ydt``: (2 n_s, npad) = [Y.T; D.T] packed once by the caller;
    ``uut``: (2 n_u, npad) = [u; u_prev] carried packed through the
    solver's while_loop (and donated whole). Per grid step the kernel
    issues 3 reads + 1 write instead of 5 + 2 — the single-member
    megakernel measures DMA-issue-bound (n_iter2=1 == n_iter2=20
    device time, tools session notes), so transfers, not VPU work, set
    its floor. Trajectories are bit-identical to u_phase_grams on the
    unpacked operands (row-slicing a VMEM block is value-exact; pinned
    by tests/test_pallas.py). Operands must arrive pre-padded to the
    lane tile (the caller packs once at solver entry).

    Returns (uut_new, a_new, l_w_prev_new, gu, b_u, usq).
    """
    n_u, n_s = a2_block.shape
    npad = ydt.shape[-1]
    grid = (npad // tile,)

    state_dtype = uut.dtype
    from demethify_tpu.ops.gram import accum_dtype
    acc = accum_dtype(ydt)
    bf16 = bool(bf16_compute) and jnp.dtype(ydt.dtype) == jnp.bfloat16
    scal = jnp.reshape(jnp.stack([a.astype(state_dtype),
                                  l_w.astype(state_dtype),
                                  l_w_prev.astype(state_dtype)]), (1, 3))

    lane_spec = lambda rows: pl.BlockSpec(  # noqa: E731
        (rows, tile), lambda k: (0, k), memory_space=pltpu.VMEM)
    full_spec = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda k: tuple(0 for _ in shape),
        memory_space=pltpu.VMEM)

    # known block: either a separate rtt stream (default — measured
    # fastest) or folded into ydt as extra rows (rtt=None with
    # a1_block given; ydt taller than 2 n_s)
    rt_folded = rtt is None and a1_block is not None
    has_known = rtt is not None or rt_folded
    n_ct = (ydt.shape[0] - 2 * n_s) if rt_folded else (
        rtt.shape[0] if has_known else 0)
    p_r = n_ct + n_u

    if rt_folded:
        in_specs = [
            pl.BlockSpec((1, 3), lambda k: (0, 0),
                         memory_space=pltpu.SMEM),
            full_spec((n_ct, n_s)), full_spec((n_u, n_s)),
            lane_spec(2 * n_s + n_ct), lane_spec(2 * n_u),
        ]
        args = (scal, a1_block, a2_block, ydt, uut)

        def kern(scal_ref, a1_ref, a2b_ref, yd_ref, uu_ref, *out_refs):
            _u_phase_grams_kernel(scal_ref, a1_ref, a2b_ref, yd_ref,
                                  None, None, uu_ref, None,
                                  out_refs[0], None, *out_refs[1:],
                                  n_steps=n_steps, n_u=n_u,
                                  lagged=lagged, bf16_compute=bf16,
                                  packed_n_s=n_s)
    elif has_known:
        in_specs = [
            pl.BlockSpec((1, 3), lambda k: (0, 0),
                         memory_space=pltpu.SMEM),
            full_spec((n_ct, n_s)), full_spec((n_u, n_s)),
            lane_spec(2 * n_s), lane_spec(n_ct), lane_spec(2 * n_u),
        ]
        args = (scal, a1_block, a2_block, ydt, rtt, uut)

        def kern(scal_ref, a1_ref, a2b_ref, yd_ref, rtt_ref, uu_ref,
                 *out_refs):
            _u_phase_grams_kernel(scal_ref, a1_ref, a2b_ref, yd_ref,
                                  None, rtt_ref, uu_ref, None,
                                  out_refs[0], None, *out_refs[1:],
                                  n_steps=n_steps, n_u=n_u,
                                  lagged=lagged, bf16_compute=bf16,
                                  packed_n_s=n_s)
    else:
        dummy = jnp.zeros((1, 1), state_dtype)
        in_specs = [
            pl.BlockSpec((1, 3), lambda k: (0, 0),
                         memory_space=pltpu.SMEM),
            full_spec((1, 1)), full_spec((n_u, n_s)),
            lane_spec(2 * n_s), lane_spec(2 * n_u),
        ]
        args = (scal, dummy, a2_block, ydt, uut)

        def kern(scal_ref, _dummy, a2b_ref, yd_ref, uu_ref, *out_refs):
            _u_phase_grams_kernel(scal_ref, None, a2b_ref, yd_ref,
                                  None, None, uu_ref, None,
                                  out_refs[0], None, *out_refs[1:],
                                  n_steps=n_steps, n_u=n_u,
                                  lagged=lagged, bf16_compute=bf16,
                                  packed_n_s=n_s)

    out_specs = [lane_spec(2 * n_u),
                 full_spec((n_s, n_u, p_r)), full_spec((n_u, n_s)),
                 full_spec((1, 1))]
    n_in = len(args)
    uu_new, gu, b_u, usq = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[jax.ShapeDtypeStruct((2 * n_u, npad), state_dtype),
                   jax.ShapeDtypeStruct((n_s, n_u, p_r), acc),
                   jax.ShapeDtypeStruct((n_u, n_s), acc),
                   jax.ShapeDtypeStruct((1, 1), acc)],
        input_output_aliases={n_in - 1: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 2 ** 20),
        interpret=_interpret(),
    )(*args)

    def scal_body(_, carry):
        a_, l_prev = carry
        a1n = (1.0 + jnp.sqrt(1.0 + 4.0 * a_ * a_)) / 2.0
        return (a1n, l_w)

    a_new, l_w_prev_new = jax.lax.fori_loop(0, n_steps, scal_body,
                                            (a, l_w_prev))
    return uu_new, a_new, l_w_prev_new, gu, b_u, usq[0, 0]


# ---------------------------------------------------------------------------
# grams: fused G/b/ydy reduction, one HBM pass
# ---------------------------------------------------------------------------

def _gram_kernel(yt_ref, dt_ref, r_ref, g_ref, b_ref, ydy_ref, *, n_s):
    k = pl.program_id(0)
    yt = yt_ref[:]
    dt = dt_ref[:]
    r = r_ref[:]                      # (p, T)
    dy = dt * yt                      # (n_s, T)

    b_part = jax.lax.dot_general(r, dy, (((1,), (1,)), ((), ())),
                                 preferred_element_type=g_ref.dtype)
    ydy_part = jnp.sum((dy * yt).astype(g_ref.dtype), axis=1,
                       keepdims=True).T   # (1, n_s)

    g_parts = []
    for s in range(n_s):
        rs = r * dt[s][None, :]
        g_parts.append(jax.lax.dot_general(
            rs, r, (((1,), (1,)), ((), ())),
            preferred_element_type=g_ref.dtype))
    g_part = jnp.stack(g_parts, axis=0)   # (n_s, p, p)

    @pl.when(k == 0)
    def _():
        g_ref[:] = g_part
        b_ref[:] = b_part
        ydy_ref[:] = ydy_part

    @pl.when(k > 0)
    def _():
        g_ref[:] = g_ref[:] + g_part
        b_ref[:] = b_ref[:] + b_part
        ydy_ref[:] = ydy_ref[:] + ydy_part


def grams(yt, dt, rt, *, tile: int = LANE_TILE):
    """One-pass per-sample Gram system from transposed operands.

    yt/dt: (n_s, N), rt: (p, N). Returns (G (n_s,p,p), b (p,n_s),
    ydy (n_s,)). Matches ops.gram.sample_grams on the untransposed arrays.
    """
    from demethify_tpu.ops.gram import accum_dtype

    acc = accum_dtype(yt)
    n_s = yt.shape[0]
    p = rt.shape[0]
    yt, _ = _pad_lanes(yt, tile)
    dt, _ = _pad_lanes(dt, tile)
    rt, _ = _pad_lanes(rt, tile)
    npad = yt.shape[-1]
    grid = (npad // tile,)

    lane_spec = lambda rows: pl.BlockSpec(  # noqa: E731
        (rows, tile), lambda k: (0, k), memory_space=pltpu.VMEM)
    acc_spec = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda k: tuple(0 for _ in shape),
        memory_space=pltpu.VMEM)

    G, b, ydy = pl.pallas_call(
        functools.partial(_gram_kernel, n_s=n_s),
        grid=grid,
        in_specs=[lane_spec(n_s), lane_spec(n_s), lane_spec(p)],
        out_specs=[acc_spec((n_s, p, p)), acc_spec((p, n_s)),
                   acc_spec((1, n_s))],
        out_shape=[jax.ShapeDtypeStruct((n_s, p, p), acc),
                   jax.ShapeDtypeStruct((p, n_s), acc),
                   jax.ShapeDtypeStruct((1, n_s), acc)],
        interpret=_interpret(),
    )(yt, dt, rt)
    return G, b, ydy[0]


# ---------------------------------------------------------------------------
# u_phase_grams_multi: the megakernel with a restart-member axis. One read
# of (Y, D, Rt) per lane-tile serves ALL B restart members: the C/M builds
# and Gram accumulations run as STACKED dots over the member axis (one MXU
# call each — B separate small-K dots serialize and waste the systolic
# array), the n_iter2 FISTA loop is vectorized over members (the member
# axis also packs the VPU sublanes a single n_u=1 member leaves idle), and
# per-member freezing (termination) is applied INSIDE the kernel so the
# u/u_prev buffers stay donated (an out-of-kernel select forces XLA to
# copy the (B, n_u, N) carries every outer iteration). A vmapped
# single-member megakernel re-reads Y/D per member (measured 0.269
# ms/iter/restart, ROADMAP); this reads them once.
# ---------------------------------------------------------------------------


def _u_phase_grams_multi_kernel(scal_ref, aw_ref, wk_ref,
                                yt_ref, dt_ref,
                                rtt_ref, w_ref, u_ref, up_ref,
                                u_out_ref, up_out_ref, gu_ref, bu_ref,
                                usq_ref, *, n_steps, n_u, n_b, lagged):
    k = pl.program_id(0)
    state_dt = u_ref.dtype
    yt = yt_ref[:].astype(state_dt)
    dt = dt_ref[:].astype(state_dt)
    # aw_ref ((n_u + n_u^2) B, n_s): the per-member FISTA weight rows
    # [a2 (u-major) ; a2_i*a2_j ((i,j)-major)], and wk_ref (known block
    # only) the C-term weights — all PRECOMPUTED once per outer
    # iteration by the wrapper (round 5). The round-3/4 kernels rebuilt
    # these from (B, n_u, n_s) alpha blocks with 4D broadcast/concat
    # small-array ops PER TILE; Mosaic's relayouts on those dominated
    # the per-iteration cost (~0.5 ms/iter at B=16, n_u=1 — measured
    # via the n_iter2 sweep).
    aw = aw_ref[:]
    a2_um = aw[:n_u * n_b]                    # (n_u B, n_s)
    w2_um = aw[n_u * n_b:]                    # (n_u^2 B, n_s)
    dy = dt * yt
    T = dt.shape[-1]
    n_s = dt.shape[0]

    n_ct = rtt_ref.shape[0] if rtt_ref is not None else 0
    rtt = rtt_ref[:].astype(state_dt) if rtt_ref is not None else None
    if rtt is not None and n_u >= 2:
        # drt rows (c-major): drt[c*n_s + s] = d[s] * rtt[c]. Shared by
        # the general-case C build and Gram known block — built by
        # sublane concat, no lane-axis reshape (Mosaic-safe).
        drt = jnp.concatenate(
            [dt * rtt[cc][None, :] for cc in range(n_ct)], axis=0)
        drt1 = None
    elif rtt is not None:
        # n_u = 1 (round 5): s-major drt rows drt1[s*n_ct + c] =
        # d[s]*rtt[c], shared by the C build's c2 dot (against the
        # host-precomputed wk weights) AND the gram known block below —
        # replacing the per-tile w_known/h temporaries and the 4D
        # rtt*h reduction of the round-3 layout (those small-array 4D
        # broadcast/reduce ops were per-TILE relayout churn).
        drt = None
        drt1 = (dt[:, None, :] * rtt[None, :, :]).reshape(
            n_s * n_ct, T)
    else:
        drt = None
        drt1 = None

    # per-member FISTA scalars as (B, 1) columns (vector unit friendly);
    # scal rows: (a0, l_w, l_w_prev, active)
    a0 = scal_ref[:, 0:1]
    l_w = scal_ref[:, 1:2]
    l_prev0 = scal_ref[:, 2:3]
    active2 = scal_ref[:, 3:4]                # (B, 1)
    rcp = 1.0 / l_w                           # (B, 1)

    def fista_scalars(a, l_prev):
        a1n = (1.0 + jnp.sqrt(1.0 + 4.0 * a * a)) / 2.0
        beta = jnp.minimum((a - 1.0) / a1n,
                           0.9999 * jnp.sqrt(l_prev / l_w))
        return a1n, beta

    def run_steps(carry, body):
        if n_steps <= 64:
            for _ in range(n_steps):
                carry = body(None, carry)
            return carry
        chunk = next(cn for cn in (125, 100, 64, 50, 32, 25, 20, 16, 10,
                                   8, 5, 4, 2, 1)
                     if n_steps % cn == 0)

        def chunk_body(_, carry):
            for _ in range(chunk):
                carry = body(None, carry)
            return carry

        return jax.lax.fori_loop(0, n_steps // chunk, chunk_body, carry)

    if n_u == 1:
        # closed-form n_u = 1 path on (B, 1, T) blocks. The FISTA step
        # is the round-3 layout (measured at the VPU floor); the C
        # build's known-block term is the round-5 rework — one (B,
        # n_s n_ct) x (n_s n_ct, T) dot against the shared drt1 rows,
        # with the wk weights (wk[b, s*n_ct+c] = a2[b,0,s]*a1[b,c,s])
        # PRECOMPUTED per outer iteration by the wrapper instead of
        # rebuilt per tile.
        c1 = jax.lax.dot_general(a2_um, dy, (((1,), (0,)), ((), ())),
                                 preferred_element_type=state_dt)
        if rtt is not None:
            c1 = c1 - jax.lax.dot_general(
                wk_ref[:], drt1, (((1,), (0,)), ((), ())),
                preferred_element_type=state_dt)
        c = c1.reshape(n_b, n_u, T)
        m = jax.lax.dot_general(w2_um, dt, (((1,), (0,)), ((), ())),
                                preferred_element_type=state_dt)
        kc = c * rcp[:, :, None]
        km = m.reshape(n_b, n_u, n_u, T) * rcp[:, :, None, None]
        km1 = 1.0 - km[:, :, 0]                           # (B, 1, T)
        kmn = km[:, :, 0]

        def step_fn(u_t, grad_at):
            if lagged:
                return u_t + (kc - kmn * grad_at)
            return u_t * km1 + kc

        def body(_, carry):
            u, up, a, l_prev = carry      # u (B, 1, T); a/l_prev (B, 1)
            a1n, beta = fista_scalars(a, l_prev)
            u_t = u + beta[:, :, None] * (u - up)
            u_new = jnp.clip(step_fn(u_t, u if lagged else u_t),
                             0.0, 1.0)
            return (u_new, u, a1n, l_w)

        u_in = u_ref[:]
        up_in = up_ref[:]
        u, up, _, _ = run_steps((u_in, up_in, a0, l_prev0), body)
        # freeze converged members in place: keeps the donated buffers
        # live (an out-of-kernel select would copy the carries)
        active3 = active2[:, :, None]
        u = active3 * u + (1.0 - active3) * u_in
        up = active3 * up + (1.0 - active3) * up_in
        u_out_ref[:] = u
        up_out_ref[:] = up
    else:
        # GENERAL (n_u >= 2) COMPONENT-LIST path (round 4). The coupled
        # FISTA step runs on per-component (B, T) blocks: measured 3.6x
        # faster than slicing a (B, n_u, n_u, T) a4 / broadcasting
        # (B, 1, T) factors inside the loop (Mosaic emits a relayout per
        # slice/broadcast per step; with lists everything is sliced
        # exactly once, outside the loop). All C/M dots are built in
        # u-major row order so each component block is a CONTIGUOUS
        # (B, T) row slice of the dot result — no relayout at all.
        # Weight rows (a2_um / w2_um / wk) arrive precomputed (round 5,
        # see the aw_ref comment above).
        c1 = jax.lax.dot_general(a2_um, dy, (((1,), (0,)), ((), ())),
                                 preferred_element_type=state_dt)
        if rtt is not None:
            # c2[(u,b)] = sum_{c,s} (a2[b,u,s] a1[b,c,s]) (d[s] rtt[c]):
            # ONE dot of the tiny (n_u B, n_ct n_s) wk block against
            # drt (wk columns c-major to match drt's c-major rows)
            c2 = jax.lax.dot_general(wk_ref[:], drt,
                                     (((1,), (0,)), ((), ())),
                                     preferred_element_type=state_dt)
            cr = c1 - c2
        else:
            cr = c1
        # m[(i,j,b)] = sum_s a2[b,i,s] a2[b,j,s] d[s] — (i,j)-major rows
        m_um = jax.lax.dot_general(w2_um, dt, (((1,), (0,)), ((), ())),
                                   preferred_element_type=state_dt)
        # affine-folded step coefficients, one (B, T) block per (i, j):
        #   a4s[i][j] = delta_ij - m_ij / l_w   (non-lagged; the grad is
        #   at u_t, so the identity folds into the coupling)
        #   a4s[i][j] =          - m_ij / l_w   (lagged: grad at u)
        kcs = [cr[i * n_b:(i + 1) * n_b] * rcp for i in range(n_u)]
        a4s = []
        for i in range(n_u):
            row = []
            for j in range(n_u):
                blk = m_um[(i * n_u + j) * n_b:
                           (i * n_u + j + 1) * n_b] * rcp
                row.append((1.0 - blk) if (i == j and not lagged)
                           else -blk)
            a4s.append(row)

        def body(_, carry):
            us, ups, a, l_prev = carry
            a1n, beta = fista_scalars(a, l_prev)
            uts = [us[v] + beta * (us[v] - ups[v]) for v in range(n_u)]
            grad = us if lagged else uts
            new = []
            for i in range(n_u):
                acc = (uts[i] + kcs[i]) if lagged else kcs[i]
                for v in range(n_u):
                    acc = acc + a4s[i][v] * grad[v]
                new.append(jnp.clip(acc, 0.0, 1.0))
            return (tuple(new), us, a1n, l_w)

        us_in = tuple(u_ref[:, i, :] for i in range(n_u))
        ups_in = tuple(up_ref[:, i, :] for i in range(n_u))
        us, ups, _, _ = run_steps((us_in, ups_in, a0, l_prev0), body)
        us = [active2 * un + (1.0 - active2) * ui
              for un, ui in zip(us, us_in)]
        ups = [active2 * un + (1.0 - active2) * ui
               for un, ui in zip(ups, ups_in)]
        for i in range(n_u):
            u_out_ref[:, i, :] = us[i]
            up_out_ref[:, i, :] = ups[i]

    # Gram partial sums with each member's (possibly frozen) u. A huge-K
    # (T) contraction with tiny output pays per OUTPUT TILE, so every
    # reduction is packed into the fewest wide dots. With per-member row
    # weights (w_ref, the weighted bootstrap's multiplicity vectors) the
    # weight folds into the LHS u rows — every u-involved reduction
    # carries w exactly once, and the FISTA update above stays raw.
    acc = bu_ref.dtype
    n_ct_loc = rtt.shape[0] if rtt is not None else 0
    if n_u == 1:
        u3 = u.astype(acc)
        u_rows = u3.reshape(n_b * n_u, T)
        if w_ref is not None:
            w_b = w_ref[:].astype(acc)               # (B, T)
            u_w3 = u3 * w_b[:, None, :]
        else:
            u_w3 = u3
        u_rows_w = u_w3.reshape(n_b * n_u, T)
        # n_u = 1 closed form needs NO du rows at all:
        #   gu_known[b,s,c] = sum_t w u[b] (d[s] rtt[c])   (wu vs drt)
        #   gu_self[b,s]    = sum_t w u[b]^2 d[s]          (wu*u vs dt)
        #   bu[b,s]         = sum_t w u[b] (d[s] y[s])     (wu vs dy)
        #   usq[b]          = sum_t w u[b]^2               (wu*u vs ones)
        # -> ONE (2B, T) x (T, n_s n_ct + 2 n_s + 1) dot.
        usq_rows = u_rows_w * u_rows
        lhs = jnp.concatenate([u_rows_w, usq_rows], axis=0)
        rhs_parts = []
        if rtt is not None:
            # drt1 built once above (shared with the C build's c2 dot);
            # state dtype == acc in this kernel (checked by the wrapper)
            rhs_parts.append(drt1.astype(acc))
        rhs_parts += [dy.astype(acc), dt.astype(acc),
                      jnp.ones((1, T), acc)]
        rhs = jnp.concatenate(rhs_parts, axis=0)
        prod = jax.lax.dot_general(
            lhs, rhs, (((1,), (1,)), ((), ())),
            preferred_element_type=acc)
        o = n_s * n_ct_loc
        # FLAT outputs only (the gu/bu refs are 2D in this mode): Mosaic
        # has no layout cast for lane->sublane splitting reshapes like
        # (B, n_s) -> (B, n_s, 1, 1); the host wrapper reshapes instead.
        # gu flat layout: [known (n_s*n_ct) | self (n_s)] per member.
        # (no zero-width concat operand when n_ct == 0 — Mosaic rejects
        # zero-size types)
        self_blk = prod[n_b:, o + n_s:o + 2 * n_s]
        gu_part = (self_blk if o == 0 else
                   jnp.concatenate([prod[:n_b, :o], self_blk], axis=1))
        bu_part = prod[:n_b, o:o + n_s]                      # (B, n_s)
        usq_part = prod[n_b:, o + 2 * n_s:o + 2 * n_s + 1]   # (B, 1)
    else:
        # GENERAL case (round 4): no du stack. Every reduction runs from
        # w-folded u rows (w carried exactly once per product):
        #   gu_known[b,s,u,c] = sum_t (w u[b,u]) (d[s] rtt[c])
        #                       -> ONE (B n_u, T) x (T, n_ct n_s) dot
        #                          against the drt rows built above
        #   bu[b,u,s]         = sum_t (w u[b,u]) (d[s] y[s])
        #   gu_self[b,s,u,v]  = sum_t (w u[b,u] u[b,v]) d[s]  and
        #   usq[b]            = sum_t  w u[b,u]^2
        #                       -> member-LOCAL pair products (i <= j)
        #                          stacked by sublane concat, one dot
        #                          against [dt; ones].
        # The round-3 form materialized du (B n_s n_u rows, the VMEM
        # limiter) and paid B x-member MAC waste + iota masking; this is
        # ~3x fewer MACs and ~8x smaller temporaries. Outputs stay FLAT
        # 2D in U-MAJOR row order — each row block is a frozen
        # component list entry, concatenated without relayout; the host
        # wrapper assembles the public 4D forms (Mosaic has no layout
        # cast for lane-splitting reshapes).
        us_acc = [x.astype(acc) for x in us]
        if w_ref is not None:
            w_b = w_ref[:].astype(acc)               # (B, T)
            us_w = [x * w_b for x in us_acc]
        else:
            us_w = us_acc
        uw_rows = jnp.concatenate(us_w, axis=0)      # (n_u B, T)
        pairs = [(i, j) for i in range(n_u) for j in range(i, n_u)]
        uu = jnp.concatenate(
            [us_w[i] * us_acc[j] for (i, j) in pairs], axis=0)
        rhs_su = jnp.concatenate(
            [dt.astype(acc), jnp.ones((1, T), acc)], axis=0)
        uu_red = jax.lax.dot_general(
            uu, rhs_su, (((1,), (1,)), ((), ())),
            preferred_element_type=acc)            # (P*B, n_s+1)
        bu_part = jax.lax.dot_general(
            uw_rows, dy.astype(acc), (((1,), (1,)), ((), ())),
            preferred_element_type=acc)            # (B n_u, n_s)
        if rtt is not None:
            gk_part = jax.lax.dot_general(
                uw_rows, drt.astype(acc), (((1,), (1,)), ((), ())),
                preferred_element_type=acc)        # (B n_u, n_ct n_s)
        # no known block (general unsupervised): gu_ref is a (1, 1)
        # dummy output — the public gu is assembled host-side from the
        # pair reductions alone
        gu_part = gk_part if rtt is not None else jnp.zeros((1, 1), acc)
        usq_part = uu_red

    @pl.when(k == 0)
    def _():
        gu_ref[:] = gu_part
        bu_ref[:] = bu_part
        usq_ref[:] = usq_part

    @pl.when(k > 0)
    def _():
        gu_ref[:] = gu_ref[:] + gu_part
        bu_ref[:] = bu_ref[:] + bu_part
        usq_ref[:] = usq_ref[:] + usq_part


def u_phase_grams_multi(yt, dt, rtt, a1_b, a2_b, ut_b, u_prev_b,
                        a_vec, l_w_vec, l_w_prev_vec, n_steps: int, *,
                        active=None, lagged: bool = False,
                        weights=None, tile: int = 4096):
    """Multi-member fused U phase: one (Y, D, Rt) read for all members.

    yt/dt (n_s, N), rtt (n_ct, N) or None; a1_b (B, n_ct, n_s) or None;
    a2_b (B, n_u, n_s); ut_b/u_prev_b (B, n_u, N); a/l_w/l_w_prev (B,).
    ``active`` (B,) bool/float: members with active=0 pass their u/u_prev
    through unchanged (in-kernel freeze — solver termination).
    ``weights`` (B, N), optional: per-member row-multiplicity weights
    (weighted bootstrap) — folded into the Gram accumulations only; the
    FISTA update stays per-row raw. Returns
    (ut_b, u_prev_b, a_new (B,), l_w_prev_new (B,),
    gu (B, n_s, n_u, p_r), b_u (B, n_u, n_s), usq (B,)).
    """
    n_b, n_u, n_s = a2_b.shape
    n = yt.shape[-1]
    yt, _ = _pad_lanes(yt, tile)
    dt, _ = _pad_lanes(dt, tile)
    ut_b, _ = _pad_lanes(ut_b, tile)
    u_prev_b, _ = _pad_lanes(u_prev_b, tile)
    npad = yt.shape[-1]
    grid = (npad // tile,)

    state_dtype = ut_b.dtype
    from demethify_tpu.ops.gram import accum_dtype
    acc = accum_dtype(yt)
    # INVARIANT: the solver state dtype equals the accumulation dtype
    # (solvers/fused.py casts u/alpha to accum_dtype(y); bf16 is a
    # STORAGE dtype for y/d/rtt only). The kernel's general-case gram
    # section reuses the state-dtype drt rows (d*rtt) built for the c2
    # dot — in-kernel casts to acc are no-ops ONLY under this
    # invariant; a bf16 state would silently round the gram products
    # (advisor round-4 finding).
    if jnp.dtype(state_dtype) != jnp.dtype(acc):
        raise ValueError(
            f"u_phase_grams_multi: state dtype {state_dtype} must equal "
            f"the accumulation dtype {acc} (cast u/alpha to "
            f"accum_dtype(y) as solvers/fused.py does)")
    if active is None:
        active = jnp.ones((n_b,), state_dtype)
    scal = jnp.stack([a_vec.astype(state_dtype),
                      l_w_vec.astype(state_dtype),
                      l_w_prev_vec.astype(state_dtype),
                      active.astype(state_dtype)], axis=1)    # (B, 4)

    lane2 = lambda rows: pl.BlockSpec(  # noqa: E731
        (rows, tile), lambda k: (0, k), memory_space=pltpu.VMEM)
    lane3 = pl.BlockSpec((n_b, n_u, tile), lambda k: (0, 0, k),
                         memory_space=pltpu.VMEM)
    full_spec = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda k: tuple(0 for _ in shape),
        memory_space=pltpu.VMEM)

    has_known = rtt is not None
    has_w = weights is not None
    n_ct = rtt.shape[0] if has_known else 0
    p_r = n_ct + n_u

    # Per-member FISTA weight rows, precomputed ONCE per outer
    # iteration (tiny XLA ops) instead of rebuilt per tile inside the
    # kernel (round 5 — the in-kernel 4D broadcast/concat builds were
    # Mosaic relayout churn, ~0.5 ms/outer-iter at B=16):
    #   aw = [a2 rows (u-major) ; a2_i*a2_j rows ((i,j)-major)]
    #   wk = the known-block C weights a2[b,u,s]*a1[b,c,s] — s-major
    #        columns at n_u = 1 (matching the kernel's s-major drt1),
    #        c-major at n_u >= 2 (matching its c-major drt)
    a2_cols = [a2_b[:, i, :] for i in range(n_u)]
    aw = jnp.concatenate(
        [jnp.concatenate(a2_cols, axis=0)]
        + [a2_cols[i] * a2_cols[j]
           for i in range(n_u) for j in range(n_u)],
        axis=0).astype(state_dtype)        # ((n_u + n_u^2) B, n_s)
    has_wk = has_known
    if has_wk:
        if n_u == 1:
            wk = (jnp.swapaxes(a1_b, 1, 2)
                  * a2_b[:, 0, :, None]).reshape(n_b, n_s * n_ct)
        else:
            wk = jnp.concatenate(
                [jnp.concatenate(
                    [a2_cols[i] * a1_b[:, cc, :] for i in range(n_u)],
                    axis=0) for cc in range(n_ct)], axis=1)
        wk = wk.astype(state_dtype)        # (n_u B, n_ct n_s)

    if has_known:
        rtt, _ = _pad_lanes(rtt, tile)
        in_specs = [full_spec((n_b, 4)),
                    full_spec(((n_u + n_u * n_u) * n_b, n_s)),
                    lane2(n_s), lane2(n_s), lane2(n_ct)]
        args = [scal, aw, yt, dt, rtt]
    else:
        in_specs = [full_spec((n_b, 4)),
                    full_spec(((n_u + n_u * n_u) * n_b, n_s)),
                    lane2(n_s), lane2(n_s)]
        args = [scal, aw, yt, dt]
    if has_wk:
        in_specs.append(full_spec(wk.shape))
        args.append(wk)
    if has_w:
        wt, _ = _pad_lanes(weights, tile)             # (B, npad)
        in_specs.append(lane2(n_b))
        args.append(wt)
    in_specs += [lane3, lane3]
    args += [ut_b, u_prev_b]

    def kern(scal_ref, aw_ref, yt_ref, dt_ref, *rest):
        i = 0
        rtt_ref = None
        if has_known:
            rtt_ref = rest[i]
            i += 1
        wk_ref = None
        if has_wk:
            wk_ref = rest[i]
            i += 1
        w_ref = None
        if has_w:
            w_ref = rest[i]
            i += 1
        u_ref, up_ref = rest[i], rest[i + 1]
        out_refs = rest[i + 2:]
        _u_phase_grams_multi_kernel(
            scal_ref, aw_ref, wk_ref,
            yt_ref, dt_ref, rtt_ref, w_ref, u_ref, up_ref, *out_refs,
            n_steps=n_steps, n_u=n_u, n_b=n_b, lagged=lagged)

    # flat 2D gram outputs (Mosaic-friendly layouts; see the kernel's
    # gram branches) — reshaped to the public 4D/3D forms below
    n_pairs = n_u * (n_u + 1) // 2
    if n_u == 1:
        gu_shape = (n_b, n_s * n_ct + n_s)
        bu_shape = (n_b, n_s)
        usq_shape = (n_b, 1)
    else:
        gu_shape = ((n_b * n_u, n_ct * n_s) if has_known else (1, 1))
        bu_shape = (n_b * n_u, n_s)
        usq_shape = (n_pairs * n_b, n_s + 1)
    out_specs = [lane3, lane3,
                 full_spec(gu_shape),
                 full_spec(bu_shape),
                 full_spec(usq_shape)]
    n_in = len(args)
    # The runtime's default scoped-VMEM limit is 16 MB (measured: the
    # real compiler rejects larger stacks; interpret mode cannot catch
    # it). The general case deliberately runs larger tiles than fit in
    # 16 MB — raise the per-kernel limit; the budget formulas in
    # solvers/fused.py keep the actual footprint well under this.
    u_new, up_new, gu, b_u, usq = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[jax.ShapeDtypeStruct((n_b, n_u, npad), state_dtype),
                   jax.ShapeDtypeStruct((n_b, n_u, npad), state_dtype),
                   jax.ShapeDtypeStruct(gu_shape, acc),
                   jax.ShapeDtypeStruct(bu_shape, acc),
                   jax.ShapeDtypeStruct(usq_shape, acc)],
        input_output_aliases={n_in - 2: 0, n_in - 1: 1},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 2 ** 20),
        interpret=_interpret(),
    )(*args)
    if n_u == 1:
        known = gu[:, :n_s * n_ct].reshape(n_b, n_s, 1, n_ct)
        self_blk = gu[:, n_s * n_ct:].reshape(n_b, n_s, 1, 1)
        gu = jnp.concatenate([known, self_blk], axis=3)
        b_u = b_u.reshape(n_b, 1, n_s)
        usq = usq[:, 0]
    else:
        # assemble the public (B, n_s, n_u, p_r) gu from the flat kernel
        # outputs: pair reductions (P*B, n_s+1) carry the self block
        # (cols :n_s, per-sample) and usq (col n_s); the known block
        # (n_u B, n_ct n_s) has u-major rows and c-major columns
        pairs = [(i, j) for i in range(n_u) for j in range(i, n_u)]
        uu3 = usq.reshape(n_pairs, n_b, n_s + 1)
        gself = jnp.zeros((n_b, n_s, n_u, n_u), acc)
        usq = jnp.zeros((n_b,), acc)
        for p_idx, (i, j) in enumerate(pairs):
            blk = uu3[p_idx, :, :n_s]                      # (B, n_s)
            gself = gself.at[:, :, i, j].set(blk)
            if i != j:
                gself = gself.at[:, :, j, i].set(blk)
            else:
                usq = usq + uu3[p_idx, :, n_s]
        if has_known:
            gu = jnp.concatenate(
                [gu.reshape(n_u, n_b, n_ct, n_s).transpose(1, 3, 0, 2),
                 gself], axis=3)
        else:
            gu = gself
        b_u = b_u.reshape(n_u, n_b, n_s).transpose(1, 0, 2)

    def scal_body(_, carry):
        a, l_prev = carry
        a1n = (1.0 + jnp.sqrt(1.0 + 4.0 * a * a)) / 2.0
        return (a1n, l_w_vec)

    a_adv, l_w_prev_adv = jax.lax.fori_loop(0, n_steps, scal_body,
                                            (a_vec, l_w_prev_vec))
    act = active.astype(a_vec.dtype)
    a_new = act * a_adv + (1.0 - act) * a_vec
    l_w_prev_new = act * l_w_prev_adv + (1.0 - act) * l_w_prev_vec
    return (u_new[:, :, :n], up_new[:, :, :n], a_new, l_w_prev_new,
            gu, b_u, usq)
