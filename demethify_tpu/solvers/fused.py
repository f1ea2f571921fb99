"""Pallas-fused solver variants: ONE HBM pass per outer iteration.

Same math and termination as solvers/partial_ref.py & friends, but the
while_loop state keeps the big arrays TRANSPOSED ((n_s|p|n_u) x n_cpg,
CpG on TPU lanes) and each outer iteration is a single
`ops.pallas_kernels.u_phase_grams` megakernel pass that

  1. builds C/M per lane-tile in VMEM,
  2. runs the whole n_iter2 FISTA U loop without touching HBM,
  3. accumulates the u-dependent Gram blocks (G_:u, b_u, sum u^2) with the
     NEW u in the same pass.

The alpha FISTA / Frank-Wolfe loops, Lipschitz refreshes, and the
Gram-identity cost then run on O(p^2 n_s) data — zero further passes over
the CpG axis. The loop-invariant known-block Grams (G_tt, b_t, ydy) are
computed once before the loop (ops/gram.py). Big-array traffic per outer
iteration: read Y, D, Rt, u, u_prev once, write u/u_prev — the minimum the
reference's update semantics admit (`demethify/deconvolution.py:190-223`).

All arrays are padded to the kernel lane-tile ONCE at entry and stay
padded through the loop (zero-padded lanes provably stay zero through the
FISTA updates and contribute nothing to the Gram sums); outputs are
sliced back at exit.
"""

import functools
from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from demethify_tpu.ops.cost import weighted_cost
from demethify_tpu.ops.gram import accum_dtype, known_block_grams
from demethify_tpu.ops.pallas_small import (
    alpha_phase_full,
    alpha_phase_full_multi,
    fw_phase_full,
    fw_phase_full_multi,
)
from demethify_tpu.ops.pallas_kernels import (
    MEGA_TILE,
    _pad_lanes,
    u_phase_grams,
)


def _axis_sum(x, axis_name):
    """Cross-shard sum when running inside shard_map over the CpG axis
    (axis_name set); identity on a single device."""
    return x if axis_name is None else jax.lax.psum(x, axis_name)


def _axis_max(x, axis_name):
    return x if axis_name is None else jax.lax.pmax(x, axis_name)


# Source fingerprint of ops/pallas_kernels._u_phase_grams_kernel — same
# tripwire contract as _MULTI_KERNEL_SRC_SHA1 below: auto_tile models
# that kernel's VMEM temporaries, so a kernel edit must re-derive the
# formula, re-run the hardware compile smoke, and touch this line.
_MEGA_KERNEL_SRC_SHA1 = "070cba369419"
# (round 5 packed-IO: the kernel also accepts [Y.T; D.T] / [u; u_prev]
# packed blocks (packed_n_s>0) — same rows, same bytes, fewer DMA
# streams; per-lane VMEM is unchanged, so auto_tile needs no new
# branch.)
# (round 5: bf16_compute flag added — the bf16 branch builds C as
# c1 - c2 over (n_ct n_s, T) bf16 drt rows instead of the known/dresid
# intermediates, because Mosaic requires 32-bit matmul accumulators —
# a bf16 `known` cannot exist, and an f32 one would reintroduce the
# per-block converts the flag exists to remove. auto_tile has a
# matching bf16_compute branch modelling the halved data blocks + drt.
# Default f32 dataflow unchanged; hardware compile smoke re-run.)


def auto_tile(n_u: int, n_s: int, n_ct: int = 0,
              itemsize: int = 4, bf16_compute: bool = False) -> int:
    """Largest lane tile whose per-step VMEM footprint stays within
    budget: double-buffered IO blocks (y, d, rt, 2x u in + 2x u out) plus
    the in-kernel temporaries (dy, dresid, du, c, m with its n_u^2 rows,
    folded FISTA carries). The n_u^2 curvature rows dominate for large
    n_u, which is what shrinks the tile. ``itemsize`` is the byte width
    of the solver's accumulation dtype (8 under --dtype float64).

    ``bf16_compute`` models the kernel's bf16 branch instead: data
    blocks/dy/du at half width, no dresid/known, plus the bf16
    (n_ct n_s, T) drt rows its c1 - c2 build materializes."""
    # the n_u^2 curvature rows exist only in the kernel's gram dataflow
    # (pallas_kernels: use_gram = n_u^2 <= 3 n_s); the direct dataflow
    # trades them for per-step (n_s, T) temporaries
    curv = n_u * n_u if n_u * n_u <= 3 * n_s else 2 * n_s
    if bf16_compute and n_u * n_u <= 3 * n_s:
        units2 = (2 * (2 * n_s + n_ct)        # bf16 IO blocks, dbl-buf
                  + n_s                       # dy (bf16)
                  + n_ct * n_s                # drt rows (bf16)
                  + n_s * n_u + n_u)          # du + u_g (bf16)
        bytes_per_lane = itemsize * (
            2 * 4 * n_u                       # u IO (state dtype)
            + curv + 6 * n_u) + (itemsize // 2) * units2
    else:
        bytes_per_lane = itemsize * (
            2 * (2 * n_s + n_ct + 4 * n_u)                 # IO, dbl-buf
            + 3 * n_s                                      # dy/dresid/...
            + n_s * n_u + curv + 6 * n_u)
    budget = 10 * 2 ** 20
    tile = budget // max(bytes_per_lane, 1)
    tile = (tile // 1024) * 1024
    return int(max(1024, min(MEGA_TILE, tile)))


def _cost_t(yt, dt, rt_full, alpha):
    resid = yt - alpha.T @ rt_full
    return jnp.sum(dt * resid * resid)


@partial(jax.jit, static_argnames=("n_u", "n_iter1", "n_iter2",
                                   "record_trace", "tile", "tol_relative",
                                   "axis_name", "bf16_compute",
                                   "packed_io"))
def partial_ref_solve_fused(u, alpha, y, d, R_trunc, n_u: int,
                            n_iter1: int = 10000, n_iter2: int = 20,
                            tol: float = 1e-2, record_trace: bool = False,
                            tile: int = 0, tol_relative: bool = False,
                            row_mask=None, axis_name=None,
                            bf16_compute: bool = False,
                            packed_io=None):
    """Drop-in equivalent of partial_ref_solve (same trajectory).

    With ``axis_name`` set the function runs inside shard_map over that
    mesh axis: y/d/R_trunc/u are this device's CpG row block, every
    cross-CpG reduction (cost, Grams, Lipschitz norms, max coverage)
    psums over the axis, and the U FISTA phase stays shard-local.

    ``bf16_compute`` (only meaningful with bf16-storage y/d/R_trunc):
    the megakernel consumes the bf16 blocks directly in its dots instead
    of upcasting per pass — trades bf16 rounding of the dy/dresid/gram
    products for the halved-DMA bound (flag-gated accuracy change; the
    loop-invariant Grams and cost here keep f32 accumulation either
    way).

    ``packed_io``: run the megakernel on PACKED blocks — [Y.T; D.T] as
    one (2 n_s, N) array and [u; u_prev] as one (2 n_u, N) while-loop
    carry — 3 reads + 1 write per grid step instead of 5 + 2. The
    kernel is DMA-issue-bound (same device time at n_iter2=1 and 20),
    so fewer transfers is the remaining lever: measured -9% device time
    at 1M sites f32 (0.1988 -> 0.1806 ms/iter, v5e). Trajectory
    bit-identical to the unpacked layout (tests pin it). Default (None)
    = ON except for bf16 storage, where slicing the 20-row packed
    block crosses bf16's (16, 128) sublane tile and measures SLOWER
    than the unpacked layout (0.177 vs 0.158 ms/iter).
    """
    dtype = accum_dtype(y)
    if packed_io is None:
        packed_io = jnp.dtype(y.dtype) != jnp.bfloat16
    if tile == 0:
        tile = auto_tile(n_u, y.shape[1], R_trunc.shape[1],
                         itemsize=jnp.dtype(dtype).itemsize,
                         bf16_compute=bf16_compute
                         and jnp.dtype(y.dtype) == jnp.bfloat16)
    u = u.astype(dtype)
    alpha = alpha.astype(dtype)
    n = y.shape[0]
    n_ct = R_trunc.shape[1]
    yt, _ = _pad_lanes(y.T, tile)
    dt, _ = _pad_lanes(d.T, tile)
    rtt, _ = _pad_lanes(R_trunc.T, tile)
    ut, _ = _pad_lanes(u.T, tile)
    dmax2 = _axis_max(jnp.max(d), axis_name) ** 2
    rt0 = jnp.concatenate([rtt.astype(dtype), ut], axis=0)
    l_w0 = jnp.sum(alpha[-n_u:] ** 2) * dmax2
    l_h0 = _axis_sum(jnp.sum(rt0 * rt0), axis_name) * dmax2
    cf0 = _axis_sum(_cost_t(yt.astype(dtype), dt.astype(dtype), rt0,
                            alpha), axis_name)
    tol = tol * cf0 if tol_relative else tol
    # loop-invariant known-block Grams from the pre-pad arrays
    # (single implementation shared with the XLA solvers)
    G_tt, b_t, ydy = (_axis_sum(t, axis_name)
                      for t in known_block_grams(R_trunc, d, y))
    rt_sq = _axis_sum(jnp.sum(rtt.astype(dtype) ** 2), axis_name)

    trace0 = (jnp.full((n_iter1,), jnp.nan, dtype) if record_trace
              else jnp.zeros((0,), dtype))

    if packed_io:
        from demethify_tpu.ops.pallas_kernels import u_phase_grams_packed

        # packed_io == "rt" additionally folds the loop-invariant Rt
        # rows into the block (2 reads + 1 write per grid step)
        rt_fold = packed_io == "rt"
        ydt = jnp.concatenate(
            [yt, dt] + ([rtt] if rt_fold else []), axis=0)
        rtt_arg = None if rt_fold else rtt
        ustate0 = jnp.concatenate([ut, ut], axis=0)   # (2 n_u, npad)
    else:
        ustate0 = (ut, ut)

    def cond(carry):
        (_, _, _, _, _, _, _, _, cf, cf_prev, k, _) = carry
        return (k < n_iter1) & (jnp.abs(cf - cf_prev) >= tol)

    def body(carry):
        (ustate, alpha, alpha_prev, a1, a2,
         l_w, l_w_prev, l_h_prev, cf, _, k, trace) = carry

        if packed_io:
            ustate, a1, l_w_prev, gu, b_u, usq = u_phase_grams_packed(
                ydt, rtt_arg, alpha[:-n_u], alpha[-n_u:], ustate,
                a1, l_w, l_w_prev, n_iter2, tile=tile,
                bf16_compute=bf16_compute)
        else:
            ut_, upt_ = ustate
            ut_, upt_, a1, l_w_prev, gu, b_u, usq = u_phase_grams(
                yt, dt, rtt, alpha[:-n_u], alpha[-n_u:], ut_, upt_,
                a1, l_w, l_w_prev, n_iter2, tile=tile,
                bf16_compute=bf16_compute)
            ustate = (ut_, upt_)
        gu = _axis_sum(gu, axis_name)
        b_u = _axis_sum(b_u, axis_name)
        usq = _axis_sum(usq, axis_name)

        alpha, alpha_prev, a2, l_h_prev, l_w, cf_new = alpha_phase_full(
            G_tt, b_t, gu, b_u, usq, ydy, alpha, alpha_prev,
            a2, l_h_prev, rt_sq, dmax2, n_iter2, n_u,
            row_mask=row_mask)

        if record_trace:
            trace = trace.at[k].set(cf_new)
        return (ustate, alpha, alpha_prev, a1, a2,
                l_w, l_w_prev, l_h_prev, cf_new, cf, k + 1, trace)

    init = (ustate0, alpha, alpha,
            jnp.ones((), dtype), jnp.ones((), dtype),
            l_w0, l_w0, l_h0,
            cf0, jnp.asarray(jnp.inf, dtype), jnp.zeros((), jnp.int32),
            trace0)
    out = jax.lax.while_loop(cond, body, init)
    ustate, alpha, _, _, _, _, _, _, cf, _, k, trace = out
    ut = ustate[:n_u] if packed_io else ustate[0]
    return ut[:, :n].T, alpha, {"cost": cf, "n_iter": k, "trace": trace}


@partial(jax.jit, static_argnames=("n_u", "n_iter1", "n_iter2",
                                   "record_trace", "tile", "tol_relative",
                                   "axis_name", "packed_io"))
def unsupervised_solve_fused(u, alpha, y, d, n_u: int,
                             n_iter1: int = 10000, n_iter2: int = 20,
                             tol: float = 1e-2,
                             record_trace: bool = False,
                             tile: int = 0, tol_relative: bool = False,
                             axis_name=None, packed_io=None):
    """Fused unsupervised NMF (R = U, lagged-gradient quirk preserved).
    ``packed_io`` as in partial_ref_solve_fused (default: on except
    bf16 storage)."""
    dtype = accum_dtype(y)
    if packed_io is None:
        packed_io = jnp.dtype(y.dtype) != jnp.bfloat16
    if tile == 0:
        tile = auto_tile(n_u, y.shape[1],
                         itemsize=jnp.dtype(dtype).itemsize)
    u = u.astype(dtype)
    alpha = alpha.astype(dtype)
    n = y.shape[0]
    yt, _ = _pad_lanes(y.T, tile)
    dt, _ = _pad_lanes(d.T, tile)
    ut, _ = _pad_lanes(u.T, tile)
    dmax2 = _axis_max(jnp.max(d), axis_name) ** 2
    l_w0 = jnp.sum(alpha * alpha) * dmax2
    l_h0 = _axis_sum(jnp.sum(ut * ut), axis_name) * dmax2
    cf0 = _axis_sum(_cost_t(yt.astype(dtype), dt.astype(dtype), ut,
                            alpha), axis_name)
    tol = tol * cf0 if tol_relative else tol
    ydy = _axis_sum(jnp.sum((dt * yt * yt).astype(dtype), axis=1),
                    axis_name)

    trace0 = (jnp.full((n_iter1,), jnp.nan, dtype) if record_trace
              else jnp.zeros((0,), dtype))

    if packed_io:
        from demethify_tpu.ops.pallas_kernels import u_phase_grams_packed

        ydt = jnp.concatenate([yt, dt], axis=0)
        ustate0 = jnp.concatenate([ut, ut], axis=0)
    else:
        ustate0 = (ut, ut)

    def cond(carry):
        (_, _, _, _, _, _, _, _, cf, cf_prev, k, _) = carry
        return (k < n_iter1) & (jnp.abs(cf - cf_prev) >= tol)

    def body(carry):
        (ustate, alpha, alpha_prev, a1, a2,
         l_w, l_w_prev, l_h_prev, cf, _, k, trace) = carry

        if packed_io:
            ustate, a1, l_w_prev, gu, b_u, usq = u_phase_grams_packed(
                ydt, None, None, alpha, ustate,
                a1, l_w, l_w_prev, n_iter2, lagged=True, tile=tile)
        else:
            ut_, upt_ = ustate
            ut_, upt_, a1, l_w_prev, gu, b_u, usq = u_phase_grams(
                yt, dt, None, None, alpha, ut_, upt_,
                a1, l_w, l_w_prev, n_iter2, lagged=True, tile=tile)
            ustate = (ut_, upt_)
        gu = _axis_sum(gu, axis_name)
        b_u = _axis_sum(b_u, axis_name)
        usq = _axis_sum(usq, axis_name)

        alpha, alpha_prev, a2, l_h_prev, l_w, cf_new = alpha_phase_full(
            None, None, gu, b_u, usq, ydy, alpha, alpha_prev,
            a2, l_h_prev, 0.0, dmax2, n_iter2, n_u)

        if record_trace:
            trace = trace.at[k].set(cf_new)
        return (ustate, alpha, alpha_prev, a1, a2,
                l_w, l_w_prev, l_h_prev, cf_new, cf, k + 1, trace)

    init = (ustate0, alpha, alpha,
            jnp.ones((), dtype), jnp.ones((), dtype),
            l_w0, l_w0, l_h0,
            cf0, jnp.asarray(jnp.inf, dtype), jnp.zeros((), jnp.int32),
            trace0)
    out = jax.lax.while_loop(cond, body, init)
    ustate, alpha, _, _, _, _, _, _, cf, _, k, trace = out
    ut = ustate[:n_u] if packed_io else ustate[0]
    return ut[:, :n].T, alpha, {"cost": cf, "n_iter": k, "trace": trace}


@partial(jax.jit, static_argnames=("n_u", "n_iter1", "n_iter2",
                                   "record_trace", "tile", "tol_relative",
                                   "axis_name", "packed_io"))
def purity_solve_fused(u, alpha, y, d, R_trunc, purity, n_u: int,
                       n_iter1: int = 100, n_iter2: int = 500,
                       tol: float = 1e-2, record_trace: bool = False,
                       tile: int = 0, tol_relative: bool = False,
                       axis_name=None, packed_io=None):
    """Fused purity-constrained solver (Frank-Wolfe alpha on Grams).
    ``packed_io`` as in partial_ref_solve_fused, but DEFAULT OFF here:
    the purity schedule's 500-step U phase is VPU-bound, so the fewer
    DMA streams buy nothing and the packed write-back costs ~2%
    (measured 2.0006 vs 1.9656 ms/iter same-session)."""
    dtype = accum_dtype(y)
    if packed_io is None:
        packed_io = False
    if tile == 0:
        tile = auto_tile(n_u, y.shape[1], R_trunc.shape[1],
                         itemsize=jnp.dtype(dtype).itemsize)
    u = u.astype(dtype)
    alpha = alpha.astype(dtype)
    n = y.shape[0]
    n_ct = R_trunc.shape[1]
    yt, _ = _pad_lanes(y.T, tile)
    dt, _ = _pad_lanes(d.T, tile)
    rtt, _ = _pad_lanes(R_trunc.T, tile)
    ut, _ = _pad_lanes(u.T, tile)
    dmax2 = _axis_max(jnp.max(d), axis_name) ** 2
    rt0 = jnp.concatenate([rtt.astype(dtype), ut], axis=0)
    l_w0 = jnp.sum(alpha[-n_u:] ** 2) * dmax2
    cf0 = _axis_sum(_cost_t(yt.astype(dtype), dt.astype(dtype), rt0,
                            alpha), axis_name)
    tol = tol * cf0 if tol_relative else tol
    # loop-invariant known-block Grams from the pre-pad arrays
    # (single implementation shared with the XLA solvers)
    G_tt, b_t, ydy = (_axis_sum(t, axis_name)
                      for t in known_block_grams(R_trunc, d, y))

    trace0 = (jnp.full((n_iter1,), jnp.nan, dtype) if record_trace
              else jnp.zeros((0,), dtype))

    if packed_io:
        from demethify_tpu.ops.pallas_kernels import u_phase_grams_packed

        ydt = jnp.concatenate([yt, dt], axis=0)
        ustate0 = jnp.concatenate([ut, ut], axis=0)
    else:
        ustate0 = (ut, ut)

    def cond(carry):
        (_, _, _, _, _, cf, cf_prev, k, _) = carry
        return (k < n_iter1) & (jnp.abs(cf - cf_prev) >= tol)

    def body(carry):
        (ustate, alpha, a1, l_w, l_w_prev, cf, _, k, trace) = carry

        if packed_io:
            ustate, a1, l_w_prev, gu, b_u, _ = u_phase_grams_packed(
                ydt, rtt, alpha[:-n_u], alpha[-n_u:], ustate,
                a1, l_w, l_w_prev, n_iter2, tile=tile)
        else:
            ut_, upt_ = ustate
            ut_, upt_, a1, l_w_prev, gu, b_u, _ = u_phase_grams(
                yt, dt, rtt, alpha[:-n_u], alpha[-n_u:], ut_, upt_,
                a1, l_w, l_w_prev, n_iter2, tile=tile)
            ustate = (ut_, upt_)
        gu = _axis_sum(gu, axis_name)
        b_u = _axis_sum(b_u, axis_name)

        alpha, l_w, cf_new = fw_phase_full(
            G_tt, b_t, gu, b_u, ydy, alpha, purity, dmax2, n_iter2, n_u)

        if record_trace:
            trace = trace.at[k].set(cf_new)
        return (ustate, alpha, a1, l_w, l_w_prev, cf_new, cf, k + 1,
                trace)

    init = (ustate0, alpha, jnp.ones((), dtype),
            l_w0, l_w0, cf0, jnp.asarray(jnp.inf, dtype),
            jnp.zeros((), jnp.int32), trace0)
    out = jax.lax.while_loop(cond, body, init)
    ustate, alpha, _, _, _, cf, _, k, trace = out
    ut = ustate[:n_u] if packed_io else ustate[0]
    return ut[:, :n].T, alpha, {"cost": cf, "n_iter": k, "trace": trace}


# ---------------------------------------------------------------------------
# Sharded (multi-chip) megakernel solvers: shard_map over the 'cpg' mesh
# axis. The U FISTA phase is row-local by construction (SURVEY.md §2b:
# "no comms in the U step"), so each device runs the Pallas megakernel on
# its own CpG lane block; only the O(p^2 n_s) Gram partials (gu, b_u, usq)
# and the scalar norms psum over ICI per outer iteration. The alpha /
# Frank-Wolfe phase runs replicated on every device (tiny tensors). The
# trajectory equals the single-device fused solver up to the psum's
# floating-point reassociation.
# ---------------------------------------------------------------------------

def _row_specs(mesh):
    from demethify_tpu.parallel.mesh import CPG_AXIS

    row = P(CPG_AXIS, None)
    rep = P()
    info = {"cost": rep, "n_iter": rep, "trace": rep}
    return CPG_AXIS, row, rep, info


def partial_ref_solve_fused_sharded(u, alpha, y, d, R_trunc, n_u: int,
                                    n_iter1: int = 10000,
                                    n_iter2: int = 20,
                                    tol: float = 1e-2,
                                    record_trace: bool = False,
                                    tile: int = 0,
                                    tol_relative: bool = False):
    """Multi-chip form of partial_ref_solve_fused: y/d/R_trunc/u are
    globally row-sharded on the 'cpg' mesh axis (CLI --shard/--multihost
    layout); returns a row-sharded u and replicated alpha/info."""
    mesh = y.sharding.mesh
    axis, row, rep, info = _row_specs(mesh)

    def local_fn(u_, a_, y_, d_, r_):
        return partial_ref_solve_fused(
            u_, a_, y_, d_, r_, n_u, n_iter1=n_iter1, n_iter2=n_iter2,
            tol=tol, record_trace=record_trace, tile=tile,
            tol_relative=tol_relative, axis_name=axis)

    fn = jax.jit(jax.shard_map(local_fn, mesh=mesh,
                               in_specs=(row, rep, row, row, row),
                               out_specs=(row, rep, info),
                               check_vma=False))
    return fn(u, alpha, y, d, R_trunc)


def unsupervised_solve_fused_sharded(u, alpha, y, d, n_u: int,
                                     n_iter1: int = 10000,
                                     n_iter2: int = 20,
                                     tol: float = 1e-2,
                                     record_trace: bool = False,
                                     tile: int = 0,
                                     tol_relative: bool = False):
    """Multi-chip form of unsupervised_solve_fused."""
    mesh = y.sharding.mesh
    axis, row, rep, info = _row_specs(mesh)

    def local_fn(u_, a_, y_, d_):
        return unsupervised_solve_fused(
            u_, a_, y_, d_, n_u, n_iter1=n_iter1, n_iter2=n_iter2,
            tol=tol, record_trace=record_trace, tile=tile,
            tol_relative=tol_relative, axis_name=axis)

    fn = jax.jit(jax.shard_map(local_fn, mesh=mesh,
                               in_specs=(row, rep, row, row),
                               out_specs=(row, rep, info),
                               check_vma=False))
    return fn(u, alpha, y, d)


def purity_solve_fused_sharded(u, alpha, y, d, R_trunc, purity, n_u: int,
                               n_iter1: int = 100, n_iter2: int = 500,
                               tol: float = 1e-2,
                               record_trace: bool = False,
                               tile: int = 0,
                               tol_relative: bool = False):
    """Multi-chip form of purity_solve_fused."""
    mesh = y.sharding.mesh
    axis, row, rep, info = _row_specs(mesh)

    def local_fn(u_, a_, y_, d_, r_, p_):
        return purity_solve_fused(
            u_, a_, y_, d_, r_, p_, n_u, n_iter1=n_iter1,
            n_iter2=n_iter2, tol=tol, record_trace=record_trace,
            tile=tile, tol_relative=tol_relative, axis_name=axis)

    fn = jax.jit(jax.shard_map(local_fn, mesh=mesh,
                               in_specs=(row, rep, row, row, row, rep),
                               out_specs=(row, rep, info),
                               check_vma=False))
    return fn(u, alpha, y, d, R_trunc, purity)


# Mosaic lowers the multi kernels' member-sliced dataflow only when the
# member axis is a MULTIPLE of the 8-wide sublane dimension: B < 8
# fails outright, and any B % 8 != 0 puts the flat-gram row slices at a
# sublane offset whose concat Mosaic rejects ("result/input offset
# mismatch on non-concat dimension" — hit in production at B=29 by the
# genome-scale bootstrap rehearsal, round 5; interpret mode cannot
# catch it). Batches are padded UP to a multiple of MIN_MULTI_MEMBERS
# by repeating member 0 (identical trajectory, no numerics risk) and
# the outputs sliced back.
MIN_MULTI_MEMBERS = 8


def _member_pad(n_b_out: int) -> int:
    target = -(-n_b_out // MIN_MULTI_MEMBERS) * MIN_MULTI_MEMBERS
    return target - n_b_out


def _pad_members(x_b, n_pad):
    return jnp.concatenate(
        [x_b, jnp.repeat(x_b[:1], n_pad, axis=0)], axis=0)


def _weighted_multi_invariants(w_b, u_b, alpha_b, y, d, R_trunc, tile,
                               dtype, axis_name):
    """Per-member loop invariants for the weighted (row-multiplicity)
    multi solvers: padded weight blocks, surviving-row max coverage,
    initial weighted costs, and the w-weighted known-block Grams.
    Shared by the partial-ref and purity batched solvers."""
    wt_b, _ = _pad_lanes(w_b, tile)                   # (B, npad)
    rowmax = jnp.max(d, axis=1)
    dmax2 = _axis_max(
        jnp.max(jnp.where(w_b > 0, rowmax[None, :], 0.0), axis=1),
        axis_name) ** 2                               # (B,)
    cf0 = _axis_sum(jax.vmap(
        lambda u0, a0, w: weighted_cost(
            y, jnp.concatenate([R_trunc.astype(dtype), u0], axis=1),
            a0, d, row_weights=w))(u_b, alpha_b, w_b), axis_name)
    G_tt, b_t, ydy = (_axis_sum(t, axis_name) for t in jax.vmap(
        lambda w: known_block_grams(R_trunc, d, y,
                                    row_weights=w))(w_b))
    return wt_b, dmax2, cf0, G_tt, b_t, ydy


def _batch_row_specs(mesh):
    """Specs for the sharded multi-restart solvers: (B, n_cpg, n_u)
    factors row-sharded on their middle axis, everything small
    replicated."""
    from demethify_tpu.parallel.mesh import CPG_AXIS

    row = P(CPG_AXIS, None)
    brow = P(None, CPG_AXIS, None)
    rep = P()
    info = {"cost": rep, "n_iter": rep, "trace": rep}
    return CPG_AXIS, row, brow, rep, info


@functools.lru_cache(maxsize=64)
def _multi_sharded_fn(mesh, n_u, n_iter1, n_iter2, tol, record_trace,
                      tile, tol_relative, weighted):
    """Build (once per config — chunked bootstrap calls reuse it) the
    jitted shard_map program for the multi-restart megakernel."""
    axis, row, brow, rep, info = _batch_row_specs(mesh)

    if weighted:
        def local_fn(u_, a_, y_, d_, r_, w_):
            return partial_ref_solve_fused_multi(
                u_, a_, y_, d_, r_, n_u, n_iter1=n_iter1,
                n_iter2=n_iter2, tol=tol, record_trace=record_trace,
                tile=tile, tol_relative=tol_relative, axis_name=axis,
                row_weights_b=w_)

        return jax.jit(jax.shard_map(
            local_fn, mesh=mesh,
            in_specs=(brow, rep, row, row, row, P(None, axis)),
            out_specs=(brow, rep, info), check_vma=False))

    def local_fn(u_, a_, y_, d_, r_):
        return partial_ref_solve_fused_multi(
            u_, a_, y_, d_, r_, n_u, n_iter1=n_iter1,
            n_iter2=n_iter2, tol=tol, record_trace=record_trace,
            tile=tile, tol_relative=tol_relative, axis_name=axis)

    return jax.jit(jax.shard_map(local_fn, mesh=mesh,
                                 in_specs=(brow, rep, row, row, row),
                                 out_specs=(brow, rep, info),
                                 check_vma=False))


def partial_ref_solve_fused_multi_sharded(u_b, alpha_b, y, d, R_trunc,
                                          n_u: int,
                                          n_iter1: int = 10000,
                                          n_iter2: int = 20,
                                          tol: float = 1e-2,
                                          record_trace: bool = False,
                                          tile: int = 0,
                                          tol_relative: bool = False,
                                          row_weights_b=None):
    """Multi-chip multi-restart form: y/d/R_trunc globally row-sharded on
    the 'cpg' mesh axis and u_b (B, n_cpg, n_u) sharded on its row axis;
    alpha_b and per-member info replicated. One megakernel pass per outer
    iteration per device serves ALL restart members. ``row_weights_b``
    ((B, n_cpg), sharded like u_b's row axis) runs one bootstrap
    replicate per member on the sharded data (weighted Gram partials
    psum over the axis). The jitted shard_map program is cached per
    (mesh, config) so chunked bootstrap calls do not re-trace."""
    fn = _multi_sharded_fn(y.sharding.mesh, n_u, n_iter1, n_iter2, tol,
                           record_trace, tile, tol_relative,
                           row_weights_b is not None)
    if row_weights_b is None:
        return fn(u_b, alpha_b, y, d, R_trunc)
    return fn(u_b, alpha_b, y, d, R_trunc, row_weights_b)


def unsupervised_solve_fused_multi_sharded(u_b, alpha_b, y, d, n_u: int,
                                           n_iter1: int = 10000,
                                           n_iter2: int = 20,
                                           tol: float = 1e-2,
                                           record_trace: bool = False,
                                           tile: int = 0,
                                           tol_relative: bool = False):
    """Multi-chip form of unsupervised_solve_fused_multi."""
    mesh = y.sharding.mesh
    axis, row, brow, rep, info = _batch_row_specs(mesh)

    def local_fn(u_, a_, y_, d_):
        return unsupervised_solve_fused_multi(
            u_, a_, y_, d_, n_u, n_iter1=n_iter1, n_iter2=n_iter2,
            tol=tol, record_trace=record_trace, tile=tile,
            tol_relative=tol_relative, axis_name=axis)

    fn = jax.jit(jax.shard_map(local_fn, mesh=mesh,
                               in_specs=(brow, rep, row, row),
                               out_specs=(brow, rep, info),
                               check_vma=False))
    return fn(u_b, alpha_b, y, d)


def purity_solve_fused_multi_sharded(u_b, alpha_b, y, d, R_trunc, purity,
                                     n_u: int,
                                     n_iter1: int = 100,
                                     n_iter2: int = 500,
                                     tol: float = 1e-2,
                                     record_trace: bool = False,
                                     tile: int = 0,
                                     tol_relative: bool = False,
                                     row_weights_b=None):
    """Multi-chip form of purity_solve_fused_multi (shard_map program
    cached per mesh/config like partial_ref_solve_fused_multi_sharded).
    """
    fn = _purity_multi_sharded_fn(y.sharding.mesh, n_u, n_iter1,
                                  n_iter2, tol, record_trace, tile,
                                  tol_relative,
                                  row_weights_b is not None)
    if row_weights_b is None:
        return fn(u_b, alpha_b, y, d, R_trunc, purity)
    return fn(u_b, alpha_b, y, d, R_trunc, purity, row_weights_b)


@functools.lru_cache(maxsize=64)
def _purity_multi_sharded_fn(mesh, n_u, n_iter1, n_iter2, tol,
                             record_trace, tile, tol_relative, weighted):
    axis, row, brow, rep, info = _batch_row_specs(mesh)

    if weighted:
        def local_fn(u_, a_, y_, d_, r_, p_, w_):
            return purity_solve_fused_multi(
                u_, a_, y_, d_, r_, p_, n_u, n_iter1=n_iter1,
                n_iter2=n_iter2, tol=tol, record_trace=record_trace,
                tile=tile, tol_relative=tol_relative, axis_name=axis,
                row_weights_b=w_)

        return jax.jit(jax.shard_map(
            local_fn, mesh=mesh,
            in_specs=(brow, rep, row, row, row, rep, P(None, axis)),
            out_specs=(brow, rep, info), check_vma=False))

    def local_fn(u_, a_, y_, d_, r_, p_):
        return purity_solve_fused_multi(
            u_, a_, y_, d_, r_, p_, n_u, n_iter1=n_iter1,
            n_iter2=n_iter2, tol=tol, record_trace=record_trace,
            tile=tile, tol_relative=tol_relative, axis_name=axis)

    return jax.jit(jax.shard_map(local_fn, mesh=mesh,
                                 in_specs=(brow, rep, row, row, row,
                                           rep),
                                 out_specs=(brow, rep, info),
                                 check_vma=False))


# ---------------------------------------------------------------------------
# Multi-restart megakernel solver: B random restarts share ONE (Y, D, Rt)
# read per outer iteration (ops/pallas_kernels.u_phase_grams_multi). A
# vmapped single-member megakernel re-reads the big arrays per member
# (measured 0.269 ms/iter/restart); the XLA batched form does too
# (0.141); here the per-member traffic is just its own u/u_prev.
# Per-member termination matches jax.vmap of the single solver: a member
# whose |Δcost| falls below tol freezes (its carry stops changing, so it
# stays frozen) while the rest continue; n_iter counts each member's own
# executed iterations.
# ---------------------------------------------------------------------------

# Fingerprint of ops/pallas_kernels._u_phase_grams_multi_kernel's SOURCE.
# _multi_bytes_per_lane below models that kernel's VMEM temporaries; a
# kernel-dataflow edit silently invalidates the model, and the real
# compiler (scoped-VMEM OOM) is the only thing that would catch it.
# tests/test_pallas.py::TestMultiVmemBudget fails when the kernel
# changes without this line being touched: re-derive the byte formula,
# re-run `timeout 3000 python tools/tpu_compile_smoke.py` (10/10 OK),
# then update the hash.
_MULTI_KERNEL_SRC_SHA1 = "7cb40805969d"
# (round 5: EVERY per-member FISTA weight block (a2 rows, a2_i*a2_j
# rows, and the known-block C weights wk) is precomputed once per
# outer iteration by the wrapper and passed in; the n_u = 1 known
# C term is one wk x drt1 dot with the s-major drt1 rows shared with
# the gram section — replacing the per-tile w_known/h temporaries and
# 4D broadcast/concat builds (Mosaic relayout churn, ~0.5 ms/iter at
# B=16). Per-lane footprint unchanged-or-smaller (the removed
# temporaries were small-array, never in the byte model), so
# _multi_bytes_per_lane needs no new term. Hardware compile smoke
# re-run.)


def _multi_bytes_per_lane(n_b: int, n_u: int, n_s: int, n_ct: int,
                          itemsize: int, weighted: bool) -> int:
    """Per-lane VMEM footprint of the multi-member megakernel: IO blocks,
    per-member C / curvature rows, FISTA carries, and the Gram-section
    temporaries. Terms mirror the kernel's named temporaries
    (ops/pallas_kernels._u_phase_grams_multi_kernel); update BOTH when
    changing a kernel dataflow (tests/test_pallas.py pins consistency).
    The n_u == 1 closed form is the round-3 layout (kept verbatim — its
    tile is perf-tuned); the general case is the round-4 rework: drt
    rows replace the h temporary and pair products replace the du stack,
    so the footprint stops scaling with B*n_s*n_u."""
    if n_u == 1:
        common = (2 * (2 * n_s + n_ct + 4 * n_b * n_u)  # IO, dbl-buf
                  + 2 * n_s                             # dy / dresid
                  + n_b * n_u + n_b * n_u * n_u         # kc / km
                  + 4 * n_b * n_u)                      # FISTA carries
        gram = 4 * n_b + n_s * n_ct + 2 * n_s + 1       # lhs stack + rhs
        w_rows = (3 * n_b if weighted else 0)           # w + w*u rows
        return itemsize * (common + gram + w_rows)
    rows = (2 * (2 * n_s + n_ct + 4 * n_b * n_u         # IO, dbl-buf
                 + (n_b if weighted else 0))            # w blocks
            + n_s                                       # dy
            + n_ct * n_s                                # drt
            + 3 * n_b * n_u                             # c1/c2 -> c/kc
            + 2 * n_b * n_u * n_u                       # m -> a4
            + 4 * n_b * n_u                             # u/up/u_t/acc
            + 2 * n_b * n_u                             # u3 / u_w3
            + n_b * n_u * (n_u + 1) // 2                # uu pair rows
            + n_s + 1)                                  # rhs_su
    return itemsize * rows


_MULTI_VMEM_BUDGET = 10 * 2 ** 20
# The general (n_u >= 2) kernel gets a larger budget: its footprint is
# dominated by the unavoidable per-member IO and a4 curvature rows, so
# the 10 MiB budget (tuned for the n_u = 1 closed form's tile) floors
# the tile at 1024 and the ~1000-step grid's fixed costs dominate.
# 40 MiB (~⅓ of v5e VMEM incl. Mosaic's own buffers) verified to lower
# and run on hardware (tools/tpu_compile_smoke.py).
_MULTI_VMEM_BUDGET_GENERAL = 40 * 2 ** 20


def _multi_budget(n_u: int) -> int:
    return _MULTI_VMEM_BUDGET if n_u == 1 else _MULTI_VMEM_BUDGET_GENERAL


def auto_tile_multi(n_b: int, n_u: int, n_s: int, n_ct: int = 0,
                    itemsize: int = 4, weighted: bool = False) -> int:
    """Lane-tile budget for the multi-member kernel (see
    _multi_bytes_per_lane). NOTE the 1024 floor: if the per-lane
    footprint alone exceeds budget/1024 the launch will overrun VMEM —
    cap the member count first (max_multi_members)."""
    bpl = _multi_bytes_per_lane(n_b, n_u, n_s, n_ct, itemsize, weighted)
    tile = (_multi_budget(n_u) // max(bpl, 1) // 1024) * 1024
    return int(max(1024, min(MEGA_TILE, tile)))


def max_multi_members(n_u: int, n_s: int, n_ct: int = 0,
                      itemsize: int = 4, weighted: bool = False) -> int:
    """Largest member count whose kernel fits the VMEM budget at the
    minimum (1024) lane tile — callers batching replicates/restarts
    through the multi megakernel chunk to this. Rounded DOWN to a
    multiple of MIN_MULTI_MEMBERS (above it) so chunks need no member
    padding (the kernel pads any batch up to a multiple of 8 — see
    _member_pad — which would otherwise waste up to 7 members' compute
    per chunk)."""
    limit = _multi_budget(n_u) // 1024
    n_b = 1
    while (n_b < 4096 and _multi_bytes_per_lane(
            2 * n_b, n_u, n_s, n_ct, itemsize, weighted) <= limit):
        n_b *= 2
    while _multi_bytes_per_lane(n_b + 1, n_u, n_s, n_ct, itemsize,
                                weighted) <= limit and n_b < 4096:
        n_b += 1
    if n_b > MIN_MULTI_MEMBERS:
        n_b -= n_b % MIN_MULTI_MEMBERS
    return n_b


@partial(jax.jit, static_argnames=("n_u", "n_iter1", "n_iter2",
                                   "record_trace", "tile", "tol_relative",
                                   "axis_name"))
def partial_ref_solve_fused_multi(u_b, alpha_b, y, d, R_trunc, n_u: int,
                                  n_iter1: int = 10000, n_iter2: int = 20,
                                  tol: float = 1e-2,
                                  record_trace: bool = False,
                                  tile: int = 0,
                                  tol_relative: bool = False,
                                  axis_name=None,
                                  row_weights_b=None):
    """Batched-restart partial-reference solve; same per-member
    trajectories as vmapping partial_ref_solve_fused. u_b: (B, n_cpg,
    n_u); alpha_b: (B, p, n_s). Returns (u_b, alpha_b, info) with
    per-member cost/n_iter/trace — drop-in for the vmapped restart path.

    With ``axis_name`` set the function runs inside shard_map over that
    mesh axis (y/d/R_trunc/u_b hold this device's CpG row block); every
    cross-CpG reduction psums over the axis and the per-member U FISTA
    phases stay shard-local, exactly like the single-member sharded form.

    With ``row_weights_b`` ((B, n_cpg) nonneg) each member solves ITS OWN
    row-multiplicity problem (one bootstrap replicate per member) on the
    SHARED (Y, D, Rt): the weights fold into the megakernel's Gram
    accumulations, the per-member known-block Grams / Lipschitz norms /
    max-coverage are w-weighted, and the raw U FISTA stays shared — so B
    bootstrap replicates cost one (Y, D, Rt) read per outer iteration.
    Trajectories equal vmapping partial_ref_solve(row_weights=...).
    """
    from demethify_tpu.ops.pallas_kernels import u_phase_grams_multi

    dtype = accum_dtype(y)
    n_b_out = u_b.shape[0]
    pad = _member_pad(n_b_out)
    if pad:
        u_b = _pad_members(u_b, pad)
        alpha_b = _pad_members(alpha_b, pad)
        if row_weights_b is not None:
            row_weights_b = _pad_members(row_weights_b, pad)
    n_b = u_b.shape[0]
    if tile == 0:
        tile = auto_tile_multi(n_b, n_u, y.shape[1], R_trunc.shape[1],
                               itemsize=jnp.dtype(dtype).itemsize,
                               weighted=row_weights_b is not None)
    u_b = u_b.astype(dtype)
    alpha_b = alpha_b.astype(dtype)
    n = y.shape[0]
    yt, _ = _pad_lanes(y.T, tile)
    dt, _ = _pad_lanes(d.T, tile)
    rtt, _ = _pad_lanes(R_trunc.T, tile)
    ut_b, _ = _pad_lanes(jnp.swapaxes(u_b, 1, 2), tile)   # (B, n_u, N)
    if row_weights_b is None:
        wt_b = None
        dmax2 = _axis_max(jnp.max(d), axis_name) ** 2
        rt_sq = _axis_sum(jnp.sum(rtt.astype(dtype) ** 2), axis_name)
        usq0 = _axis_sum(jnp.sum(ut_b * ut_b, axis=(1, 2)), axis_name)
        cf0 = _axis_sum(jnp.stack([
            _cost_t(yt.astype(dtype), dt.astype(dtype),
                    jnp.concatenate([rtt.astype(dtype), ut_b[b]],
                                    axis=0),
                    alpha_b[b])
            for b in range(n_b)]), axis_name)
        G_tt, b_t, ydy = (_axis_sum(t, axis_name)
                          for t in known_block_grams(R_trunc, d, y))
    else:
        w_b = row_weights_b.astype(dtype)
        wt_b, dmax2, cf0, G_tt, b_t, ydy = _weighted_multi_invariants(
            w_b, u_b, alpha_b, y, d, R_trunc, tile, dtype, axis_name)
        rt_sq = _axis_sum(
            w_b @ jnp.sum((R_trunc * R_trunc).astype(dtype), axis=1),
            axis_name)                                # (B,)
        usq0 = _axis_sum(jnp.einsum("bi,biu->b", w_b, u_b * u_b),
                         axis_name)
    l_w0 = jnp.sum(alpha_b[:, -n_u:] ** 2, axis=(1, 2)) * dmax2
    l_h0 = (rt_sq + usq0) * dmax2
    tol_b = tol * cf0 if tol_relative else jnp.full_like(cf0, tol)

    trace0 = (jnp.full((n_b, n_iter1), jnp.nan, dtype) if record_trace
              else jnp.zeros((n_b, 0), dtype))

    # member-batched alpha phase: ONE launch for all B members (a vmap of
    # the single-member kernel serializes across the lifted grid axis)
    def alpha_phase_b(gu, b_u, usq, alpha, alpha_prev, a2, l_h_prev):
        return alpha_phase_full_multi(G_tt, b_t, gu, b_u, usq, ydy,
                                      alpha, alpha_prev, a2, l_h_prev,
                                      rt_sq, dmax2, n_iter2, n_u)

    def active_mask(cf, cf_prev):
        return jnp.abs(cf - cf_prev) >= tol_b

    def cond(carry):
        (_, _, _, _, _, _, _, _, _, cf, cf_prev, k, _, _) = carry
        return (k < n_iter1) & jnp.any(active_mask(cf, cf_prev))

    def sel(active, new, old):
        extra = (1,) * (new.ndim - 1)
        return jnp.where(active.reshape((-1,) + extra), new, old)

    def body(carry):
        (ut, upt, alpha, alpha_prev, a1, a2,
         l_w, l_w_prev, l_h_prev, cf, cf_prev, k, n_it, trace) = carry
        active = active_mask(cf, cf_prev)

        # the big (B, n_u, N) carries freeze INSIDE the kernel (keeps the
        # buffers donated); only the small per-member state selects here
        ut_n, upt_n, a1_n, l_w_prev_n, gu, b_u, usq = u_phase_grams_multi(
            yt, dt, rtt, alpha[:, :-n_u], alpha[:, -n_u:], ut, upt,
            a1, l_w, l_w_prev, n_iter2, active=active.astype(dtype),
            weights=wt_b, tile=tile)
        gu = _axis_sum(gu, axis_name)
        b_u = _axis_sum(b_u, axis_name)
        usq = _axis_sum(usq, axis_name)

        (alpha_n, alpha_prev_n, a2_n, l_h_prev_n, l_w_n,
         cf_new) = alpha_phase_b(gu, b_u, usq, alpha, alpha_prev,
                                 a2, l_h_prev)

        out = (ut_n, upt_n,
               sel(active, alpha_n, alpha), sel(active, alpha_prev_n,
                                                alpha_prev),
               a1_n, sel(active, a2_n, a2),
               sel(active, l_w_n, l_w), l_w_prev_n,
               sel(active, l_h_prev_n, l_h_prev),
               sel(active, cf_new, cf), sel(active, cf, cf_prev),
               k + 1, n_it + active.astype(n_it.dtype))
        if record_trace:
            trace = trace.at[:, k].set(jnp.where(active, cf_new,
                                                 trace[:, k]))
        return out + (trace,)

    ones_b = jnp.ones((n_b,), dtype)
    init = (ut_b, ut_b, alpha_b, alpha_b, ones_b, ones_b,
            l_w0, l_w0, l_h0, cf0, jnp.full((n_b,), jnp.inf, dtype),
            jnp.zeros((), jnp.int32), jnp.zeros((n_b,), jnp.int32),
            trace0)
    out = jax.lax.while_loop(cond, body, init)
    ut, _, alpha, _, _, _, _, _, _, cf, _, _, n_it, trace = out
    B = n_b_out
    return (jnp.swapaxes(ut[:B, :, :n], 1, 2), alpha[:B],
            {"cost": cf[:B], "n_iter": n_it[:B], "trace": trace[:B]})


@partial(jax.jit, static_argnames=("n_u", "n_iter1", "n_iter2",
                                   "record_trace", "tile", "tol_relative",
                                   "axis_name"))
def unsupervised_solve_fused_multi(u_b, alpha_b, y, d, n_u: int,
                                   n_iter1: int = 10000,
                                   n_iter2: int = 20,
                                   tol: float = 1e-2,
                                   record_trace: bool = False,
                                   tile: int = 0,
                                   tol_relative: bool = False,
                                   axis_name=None):
    """Batched-restart unsupervised NMF (R = U, lagged-gradient quirk);
    one Y/D read per outer iteration for all members."""
    from demethify_tpu.ops.pallas_kernels import u_phase_grams_multi

    dtype = accum_dtype(y)
    n_b_out = u_b.shape[0]
    pad = _member_pad(n_b_out)
    if pad:
        u_b = _pad_members(u_b, pad)
        alpha_b = _pad_members(alpha_b, pad)
    n_b = u_b.shape[0]
    if tile == 0:
        tile = auto_tile_multi(n_b, n_u, y.shape[1],
                               itemsize=jnp.dtype(dtype).itemsize)
    u_b = u_b.astype(dtype)
    alpha_b = alpha_b.astype(dtype)
    n = y.shape[0]
    yt, _ = _pad_lanes(y.T, tile)
    dt, _ = _pad_lanes(d.T, tile)
    ut_b, _ = _pad_lanes(jnp.swapaxes(u_b, 1, 2), tile)   # (B, n_u, N)
    dmax2 = _axis_max(jnp.max(d), axis_name) ** 2
    l_w0 = jnp.sum(alpha_b * alpha_b, axis=(1, 2)) * dmax2
    l_h0 = _axis_sum(jnp.sum(ut_b * ut_b, axis=(1, 2)), axis_name) * dmax2
    cf0 = _axis_sum(jnp.stack([
        _cost_t(yt.astype(dtype), dt.astype(dtype), ut_b[b], alpha_b[b])
        for b in range(n_b)]), axis_name)
    tol_b = tol * cf0 if tol_relative else jnp.full_like(cf0, tol)
    ydy = _axis_sum(jnp.sum((dt * yt).astype(dtype) * yt.astype(dtype),
                            axis=1), axis_name)

    trace0 = (jnp.full((n_b, n_iter1), jnp.nan, dtype) if record_trace
              else jnp.zeros((n_b, 0), dtype))

    def alpha_phase_b(gu, b_u, usq, alpha, alpha_prev, a2, l_h_prev):
        return alpha_phase_full_multi(None, None, gu, b_u, usq, ydy,
                                      alpha, alpha_prev, a2, l_h_prev,
                                      0.0, dmax2, n_iter2, n_u)

    def active_mask(cf, cf_prev):
        return jnp.abs(cf - cf_prev) >= tol_b

    def cond(carry):
        (_, _, _, _, _, _, _, _, _, cf, cf_prev, k, _, _) = carry
        return (k < n_iter1) & jnp.any(active_mask(cf, cf_prev))

    def sel(active, new, old):
        extra = (1,) * (new.ndim - 1)
        return jnp.where(active.reshape((-1,) + extra), new, old)

    def body(carry):
        (ut, upt, alpha, alpha_prev, a1, a2,
         l_w, l_w_prev, l_h_prev, cf, cf_prev, k, n_it, trace) = carry
        active = active_mask(cf, cf_prev)

        ut_n, upt_n, a1_n, l_w_prev_n, gu, b_u, usq = u_phase_grams_multi(
            yt, dt, None, None, alpha, ut, upt,
            a1, l_w, l_w_prev, n_iter2, active=active.astype(dtype),
            lagged=True, tile=tile)
        gu = _axis_sum(gu, axis_name)
        b_u = _axis_sum(b_u, axis_name)
        usq = _axis_sum(usq, axis_name)

        (alpha_n, alpha_prev_n, a2_n, l_h_prev_n, l_w_n,
         cf_new) = alpha_phase_b(gu, b_u, usq, alpha, alpha_prev,
                                 a2, l_h_prev)

        out = (ut_n, upt_n,
               sel(active, alpha_n, alpha), sel(active, alpha_prev_n,
                                                alpha_prev),
               a1_n, sel(active, a2_n, a2),
               sel(active, l_w_n, l_w), l_w_prev_n,
               sel(active, l_h_prev_n, l_h_prev),
               sel(active, cf_new, cf), sel(active, cf, cf_prev),
               k + 1, n_it + active.astype(n_it.dtype))
        if record_trace:
            trace = trace.at[:, k].set(jnp.where(active, cf_new,
                                                 trace[:, k]))
        return out + (trace,)

    ones_b = jnp.ones((n_b,), dtype)
    init = (ut_b, ut_b, alpha_b, alpha_b, ones_b, ones_b,
            l_w0, l_w0, l_h0, cf0, jnp.full((n_b,), jnp.inf, dtype),
            jnp.zeros((), jnp.int32), jnp.zeros((n_b,), jnp.int32),
            trace0)
    out = jax.lax.while_loop(cond, body, init)
    ut, _, alpha, _, _, _, _, _, _, cf, _, _, n_it, trace = out
    B = n_b_out
    return (jnp.swapaxes(ut[:B, :, :n], 1, 2), alpha[:B],
            {"cost": cf[:B], "n_iter": n_it[:B], "trace": trace[:B]})


@partial(jax.jit, static_argnames=("n_u", "n_iter1", "n_iter2",
                                   "record_trace", "tile", "tol_relative",
                                   "axis_name"))
def purity_solve_fused_multi(u_b, alpha_b, y, d, R_trunc, purity,
                             n_u: int,
                             n_iter1: int = 100, n_iter2: int = 500,
                             tol: float = 1e-2,
                             record_trace: bool = False,
                             tile: int = 0,
                             tol_relative: bool = False,
                             axis_name=None,
                             row_weights_b=None):
    """Batched-restart purity-constrained solve (Frank-Wolfe alpha);
    one Y/D read per outer iteration for all members. ``row_weights_b``
    runs one bootstrap replicate per member on the shared data (see
    partial_ref_solve_fused_multi)."""
    from demethify_tpu.ops.pallas_kernels import u_phase_grams_multi

    dtype = accum_dtype(y)
    n_b_out = u_b.shape[0]
    pad = _member_pad(n_b_out)
    if pad:
        u_b = _pad_members(u_b, pad)
        alpha_b = _pad_members(alpha_b, pad)
        if row_weights_b is not None:
            row_weights_b = _pad_members(row_weights_b, pad)
    n_b = u_b.shape[0]
    if tile == 0:
        tile = auto_tile_multi(n_b, n_u, y.shape[1], R_trunc.shape[1],
                               itemsize=jnp.dtype(dtype).itemsize,
                               weighted=row_weights_b is not None)
    u_b = u_b.astype(dtype)
    alpha_b = alpha_b.astype(dtype)
    n = y.shape[0]
    yt, _ = _pad_lanes(y.T, tile)
    dt, _ = _pad_lanes(d.T, tile)
    rtt, _ = _pad_lanes(R_trunc.T, tile)
    ut_b, _ = _pad_lanes(jnp.swapaxes(u_b, 1, 2), tile)   # (B, n_u, N)
    if row_weights_b is None:
        wt_b = None
        dmax2 = _axis_max(jnp.max(d), axis_name) ** 2
        cf0 = _axis_sum(jnp.stack([
            _cost_t(yt.astype(dtype), dt.astype(dtype),
                    jnp.concatenate([rtt.astype(dtype), ut_b[b]],
                                    axis=0),
                    alpha_b[b])
            for b in range(n_b)]), axis_name)
        G_tt, b_t, ydy = (_axis_sum(t, axis_name)
                          for t in known_block_grams(R_trunc, d, y))
    else:
        w_b = row_weights_b.astype(dtype)
        wt_b, dmax2, cf0, G_tt, b_t, ydy = _weighted_multi_invariants(
            w_b, u_b, alpha_b, y, d, R_trunc, tile, dtype, axis_name)
    l_w0 = jnp.sum(alpha_b[:, -n_u:] ** 2, axis=(1, 2)) * dmax2
    tol_b = tol * cf0 if tol_relative else jnp.full_like(cf0, tol)

    trace0 = (jnp.full((n_b, n_iter1), jnp.nan, dtype) if record_trace
              else jnp.zeros((n_b, 0), dtype))

    def fw_phase_b(gu, b_u, alpha):
        return fw_phase_full_multi(G_tt, b_t, gu, b_u, ydy, alpha,
                                   purity, dmax2, n_iter2, n_u)

    def active_mask(cf, cf_prev):
        return jnp.abs(cf - cf_prev) >= tol_b

    def cond(carry):
        (_, _, _, _, _, _, cf, cf_prev, k, _, _) = carry
        return (k < n_iter1) & jnp.any(active_mask(cf, cf_prev))

    def sel(active, new, old):
        extra = (1,) * (new.ndim - 1)
        return jnp.where(active.reshape((-1,) + extra), new, old)

    def body(carry):
        (ut, upt, alpha, a1, l_w, l_w_prev,
         cf, cf_prev, k, n_it, trace) = carry
        active = active_mask(cf, cf_prev)

        ut_n, upt_n, a1_n, l_w_prev_n, gu, b_u, _ = u_phase_grams_multi(
            yt, dt, rtt, alpha[:, :-n_u], alpha[:, -n_u:], ut, upt,
            a1, l_w, l_w_prev, n_iter2, active=active.astype(dtype),
            weights=wt_b, tile=tile)
        gu = _axis_sum(gu, axis_name)
        b_u = _axis_sum(b_u, axis_name)

        alpha_n, l_w_n, cf_new = fw_phase_b(gu, b_u, alpha)

        out = (ut_n, upt_n, sel(active, alpha_n, alpha),
               a1_n, sel(active, l_w_n, l_w), l_w_prev_n,
               sel(active, cf_new, cf), sel(active, cf, cf_prev),
               k + 1, n_it + active.astype(n_it.dtype))
        if record_trace:
            trace = trace.at[:, k].set(jnp.where(active, cf_new,
                                                 trace[:, k]))
        return out + (trace,)

    ones_b = jnp.ones((n_b,), dtype)
    init = (ut_b, ut_b, alpha_b, ones_b, l_w0, l_w0,
            cf0, jnp.full((n_b,), jnp.inf, dtype),
            jnp.zeros((), jnp.int32), jnp.zeros((n_b,), jnp.int32),
            trace0)
    out = jax.lax.while_loop(cond, body, init)
    ut, _, alpha, _, _, _, cf, _, _, n_it, trace = out
    B = n_b_out
    return (jnp.swapaxes(ut[:B, :, :n], 1, 2), alpha[:B],
            {"cost": cf[:B], "n_iter": n_it[:B], "trace": trace[:B]})
