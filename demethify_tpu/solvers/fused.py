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

from functools import partial

import jax
import jax.numpy as jnp

from demethify_tpu.ops.gram import accum_dtype, known_block_grams
from demethify_tpu.ops.pallas_small import alpha_phase_full, fw_phase_full
from demethify_tpu.ops.pallas_kernels import (
    MEGA_TILE,
    _pad_lanes,
    u_phase_grams,
)


def auto_tile(n_u: int, n_s: int, n_ct: int = 0,
              itemsize: int = 4) -> int:
    """Largest lane tile whose per-step VMEM footprint stays within
    budget: double-buffered IO blocks (y, d, rt, 2x u in + 2x u out) plus
    the in-kernel temporaries (dy, dresid, du, c, m with its n_u^2 rows,
    folded FISTA carries). The n_u^2 curvature rows dominate for large
    n_u, which is what shrinks the tile. ``itemsize`` is the byte width
    of the solver's accumulation dtype (8 under --dtype float64)."""
    # the n_u^2 curvature rows exist only in the kernel's gram dataflow
    # (pallas_kernels: use_gram = n_u^2 <= 3 n_s); the direct dataflow
    # trades them for per-step (n_s, T) temporaries
    curv = n_u * n_u if n_u * n_u <= 3 * n_s else 2 * n_s
    bytes_per_lane = itemsize * (
        2 * (2 * n_s + n_ct + 4 * n_u)                     # IO, dbl-buf
        + 3 * n_s                                          # dy/dresid/...
        + n_s * n_u + curv + 6 * n_u)
    budget = 10 * 2 ** 20
    tile = budget // max(bytes_per_lane, 1)
    tile = (tile // 1024) * 1024
    return int(max(1024, min(MEGA_TILE, tile)))


def _cost_t(yt, dt, rt_full, alpha):
    resid = yt - alpha.T @ rt_full
    return jnp.sum(dt * resid * resid)


@partial(jax.jit, static_argnames=("n_u", "n_iter1", "n_iter2",
                                   "record_trace", "tile", "tol_relative"))
def partial_ref_solve_fused(u, alpha, y, d, R_trunc, n_u: int,
                            n_iter1: int = 10000, n_iter2: int = 20,
                            tol: float = 1e-2, record_trace: bool = False,
                            tile: int = 0, tol_relative: bool = False,
                            row_mask=None):
    """Drop-in equivalent of partial_ref_solve (same trajectory)."""
    dtype = accum_dtype(y)
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
    dmax2 = jnp.max(d) ** 2
    rt0 = jnp.concatenate([rtt.astype(dtype), ut], axis=0)
    l_w0 = jnp.sum(alpha[-n_u:] ** 2) * dmax2
    l_h0 = jnp.sum(rt0 * rt0) * dmax2
    cf0 = _cost_t(yt.astype(dtype), dt.astype(dtype), rt0, alpha)
    tol = tol * cf0 if tol_relative else tol
    # loop-invariant known-block Grams from the pre-pad arrays
    # (single implementation shared with the XLA solvers)
    G_tt, b_t, ydy = known_block_grams(R_trunc, d, y)
    rt_sq = jnp.sum(rtt.astype(dtype) ** 2)

    trace0 = (jnp.full((n_iter1,), jnp.nan, dtype) if record_trace
              else jnp.zeros((0,), dtype))

    def cond(carry):
        (_, _, _, _, _, _, _, _, _, cf, cf_prev, k, _) = carry
        return (k < n_iter1) & (jnp.abs(cf - cf_prev) >= tol)

    def body(carry):
        (ut, upt, alpha, alpha_prev, a1, a2,
         l_w, l_w_prev, l_h_prev, cf, _, k, trace) = carry

        ut, upt, a1, l_w_prev, gu, b_u, usq = u_phase_grams(
            yt, dt, rtt, alpha[:-n_u], alpha[-n_u:], ut, upt,
            a1, l_w, l_w_prev, n_iter2, tile=tile)

        alpha, alpha_prev, a2, l_h_prev, l_w, cf_new = alpha_phase_full(
            G_tt, b_t, gu, b_u, usq, ydy, alpha, alpha_prev,
            a2, l_h_prev, rt_sq, dmax2, n_iter2, n_u,
            row_mask=row_mask)

        if record_trace:
            trace = trace.at[k].set(cf_new)
        return (ut, upt, alpha, alpha_prev, a1, a2,
                l_w, l_w_prev, l_h_prev, cf_new, cf, k + 1, trace)

    init = (ut, ut, alpha, alpha,
            jnp.ones((), dtype), jnp.ones((), dtype),
            l_w0, l_w0, l_h0,
            cf0, jnp.asarray(jnp.inf, dtype), jnp.zeros((), jnp.int32),
            trace0)
    out = jax.lax.while_loop(cond, body, init)
    ut, _, alpha, _, _, _, _, _, _, cf, _, k, trace = out
    return ut[:, :n].T, alpha, {"cost": cf, "n_iter": k, "trace": trace}


@partial(jax.jit, static_argnames=("n_u", "n_iter1", "n_iter2",
                                   "record_trace", "tile", "tol_relative"))
def unsupervised_solve_fused(u, alpha, y, d, n_u: int,
                             n_iter1: int = 10000, n_iter2: int = 20,
                             tol: float = 1e-2,
                             record_trace: bool = False,
                             tile: int = 0, tol_relative: bool = False):
    """Fused unsupervised NMF (R = U, lagged-gradient quirk preserved)."""
    dtype = accum_dtype(y)
    if tile == 0:
        tile = auto_tile(n_u, y.shape[1],
                         itemsize=jnp.dtype(dtype).itemsize)
    u = u.astype(dtype)
    alpha = alpha.astype(dtype)
    n = y.shape[0]
    yt, _ = _pad_lanes(y.T, tile)
    dt, _ = _pad_lanes(d.T, tile)
    ut, _ = _pad_lanes(u.T, tile)
    dmax2 = jnp.max(d) ** 2
    l_w0 = jnp.sum(alpha * alpha) * dmax2
    l_h0 = jnp.sum(ut * ut) * dmax2
    cf0 = _cost_t(yt.astype(dtype), dt.astype(dtype), ut, alpha)
    tol = tol * cf0 if tol_relative else tol
    ydy = jnp.sum((dt * yt * yt).astype(dtype), axis=1)

    trace0 = (jnp.full((n_iter1,), jnp.nan, dtype) if record_trace
              else jnp.zeros((0,), dtype))

    def cond(carry):
        (_, _, _, _, _, _, _, _, _, cf, cf_prev, k, _) = carry
        return (k < n_iter1) & (jnp.abs(cf - cf_prev) >= tol)

    def body(carry):
        (ut, upt, alpha, alpha_prev, a1, a2,
         l_w, l_w_prev, l_h_prev, cf, _, k, trace) = carry

        ut, upt, a1, l_w_prev, gu, b_u, usq = u_phase_grams(
            yt, dt, None, None, alpha, ut, upt,
            a1, l_w, l_w_prev, n_iter2, lagged=True, tile=tile)

        alpha, alpha_prev, a2, l_h_prev, l_w, cf_new = alpha_phase_full(
            None, None, gu, b_u, usq, ydy, alpha, alpha_prev,
            a2, l_h_prev, 0.0, dmax2, n_iter2, n_u)

        if record_trace:
            trace = trace.at[k].set(cf_new)
        return (ut, upt, alpha, alpha_prev, a1, a2,
                l_w, l_w_prev, l_h_prev, cf_new, cf, k + 1, trace)

    init = (ut, ut, alpha, alpha,
            jnp.ones((), dtype), jnp.ones((), dtype),
            l_w0, l_w0, l_h0,
            cf0, jnp.asarray(jnp.inf, dtype), jnp.zeros((), jnp.int32),
            trace0)
    out = jax.lax.while_loop(cond, body, init)
    ut, _, alpha, _, _, _, _, _, _, cf, _, k, trace = out
    return ut[:, :n].T, alpha, {"cost": cf, "n_iter": k, "trace": trace}


@partial(jax.jit, static_argnames=("n_u", "n_iter1", "n_iter2",
                                   "record_trace", "tile", "tol_relative"))
def purity_solve_fused(u, alpha, y, d, R_trunc, purity, n_u: int,
                       n_iter1: int = 100, n_iter2: int = 500,
                       tol: float = 1e-2, record_trace: bool = False,
                       tile: int = 0, tol_relative: bool = False):
    """Fused purity-constrained solver (Frank-Wolfe alpha on Grams)."""
    dtype = accum_dtype(y)
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
    dmax2 = jnp.max(d) ** 2
    rt0 = jnp.concatenate([rtt.astype(dtype), ut], axis=0)
    l_w0 = jnp.sum(alpha[-n_u:] ** 2) * dmax2
    cf0 = _cost_t(yt.astype(dtype), dt.astype(dtype), rt0, alpha)
    tol = tol * cf0 if tol_relative else tol
    # loop-invariant known-block Grams from the pre-pad arrays
    # (single implementation shared with the XLA solvers)
    G_tt, b_t, ydy = known_block_grams(R_trunc, d, y)

    trace0 = (jnp.full((n_iter1,), jnp.nan, dtype) if record_trace
              else jnp.zeros((0,), dtype))

    def cond(carry):
        (_, _, _, _, _, _, cf, cf_prev, k, _) = carry
        return (k < n_iter1) & (jnp.abs(cf - cf_prev) >= tol)

    def body(carry):
        (ut, upt, alpha, a1, l_w, l_w_prev, cf, _, k, trace) = carry

        ut, upt, a1, l_w_prev, gu, b_u, _ = u_phase_grams(
            yt, dt, rtt, alpha[:-n_u], alpha[-n_u:], ut, upt,
            a1, l_w, l_w_prev, n_iter2, tile=tile)

        alpha, l_w, cf_new = fw_phase_full(
            G_tt, b_t, gu, b_u, ydy, alpha, purity, dmax2, n_iter2, n_u)

        if record_trace:
            trace = trace.at[k].set(cf_new)
        return (ut, upt, alpha, a1, l_w, l_w_prev, cf_new, cf, k + 1,
                trace)

    init = (ut, ut, alpha, jnp.ones((), dtype),
            l_w0, l_w0, cf0, jnp.asarray(jnp.inf, dtype),
            jnp.zeros((), jnp.int32), trace0)
    out = jax.lax.while_loop(cond, body, init)
    ut, _, alpha, _, _, _, cf, _, k, trace = out
    return ut[:, :n].T, alpha, {"cost": cf, "n_iter": k, "trace": trace}
