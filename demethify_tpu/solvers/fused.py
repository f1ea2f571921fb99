"""Pallas-fused solver variants: transposed state, one HBM pass per phase.

Same math and termination as solvers/partial_ref.py & friends, but the
while_loop state keeps the big arrays TRANSPOSED ((n_s|p|n_u) x n_cpg,
CpG on TPU lanes) and each outer iteration runs exactly two fused passes:

  1. ops.pallas_kernels.u_phase — builds C/M per tile in VMEM and runs the
     whole n_iter2 FISTA loop without touching HBM;
  2. ops.pallas_kernels.grams  — one-pass per-sample Gram system; the alpha
     FISTA / Frank-Wolfe loops and the cost then run on O(p^2 n_s) data.

Transposes happen once at entry/exit.
"""

from functools import partial

import jax
import jax.numpy as jnp

from demethify_tpu.ops import fista
from demethify_tpu.ops.cost import weighted_cost_gram
from demethify_tpu.ops.gram import accum_dtype
from demethify_tpu.ops.frank_wolfe import frank_wolfe_gram
from demethify_tpu.ops.pallas_kernels import grams, u_phase


def _cost_t(yt, dt, rt_full, alpha):
    resid = yt - alpha.T @ rt_full
    return jnp.sum(dt * resid * resid)


@partial(jax.jit, static_argnames=("n_u", "n_iter1", "n_iter2",
                                   "record_trace"))
def partial_ref_solve_fused(u, alpha, y, d, R_trunc, n_u: int,
                            n_iter1: int = 10000, n_iter2: int = 20,
                            tol: float = 1e-2, record_trace: bool = False):
    """Drop-in equivalent of partial_ref_solve (same trajectory)."""
    dtype = accum_dtype(y)
    u = u.astype(dtype)
    alpha = alpha.astype(dtype)
    yt, dt, rtt, ut = y.T, d.T, R_trunc.T, u.T
    dmax2 = jnp.max(d) ** 2
    rt0 = jnp.concatenate([rtt, ut], axis=0)
    l_w0 = jnp.sum(alpha[-n_u:] ** 2) * dmax2
    l_h0 = jnp.sum(rt0 * rt0) * dmax2
    cf0 = _cost_t(yt, dt, rt0, alpha)

    trace0 = (jnp.full((n_iter1,), jnp.nan, dtype) if record_trace
              else jnp.zeros((0,), dtype))

    def cond(carry):
        (_, _, _, _, _, _, _, _, _, cf, cf_prev, k, _) = carry
        return (k < n_iter1) & (jnp.abs(cf - cf_prev) >= tol)

    def body(carry):
        (ut, upt, alpha, alpha_prev, a1, a2,
         l_w, l_w_prev, l_h_prev, cf, _, k, trace) = carry

        ut, upt, a1, l_w_prev = u_phase(
            yt, dt, rtt, alpha[:-n_u], alpha[-n_u:], ut, upt,
            a1, l_w, l_w_prev, n_iter2)

        rt = jnp.concatenate([rtt, ut], axis=0)
        G, b, ydy = grams(yt, dt, rt)
        l_h = jnp.sum(rt * rt) * dmax2

        alpha, alpha_prev, a2, l_h_prev = fista.fista_alpha_gram(
            alpha, alpha_prev, a2, l_h_prev, l_h, G, b, n_iter2)

        l_w = jnp.sum(alpha[-n_u:] ** 2) * dmax2
        cf_new = weighted_cost_gram(G, b, ydy, alpha)

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
    return ut.T, alpha, {"cost": cf, "n_iter": k, "trace": trace}


@partial(jax.jit, static_argnames=("n_u", "n_iter1", "n_iter2",
                                   "record_trace"))
def unsupervised_solve_fused(u, alpha, y, d, n_u: int,
                             n_iter1: int = 10000, n_iter2: int = 20,
                             tol: float = 1e-2,
                             record_trace: bool = False):
    """Fused unsupervised NMF (R = U, lagged-gradient quirk preserved)."""
    dtype = accum_dtype(y)
    u = u.astype(dtype)
    alpha = alpha.astype(dtype)
    yt, dt, ut = y.T, d.T, u.T
    dmax2 = jnp.max(d) ** 2
    l_w0 = jnp.sum(alpha * alpha) * dmax2
    l_h0 = jnp.sum(ut * ut) * dmax2
    cf0 = _cost_t(yt, dt, ut, alpha)

    trace0 = (jnp.full((n_iter1,), jnp.nan, dtype) if record_trace
              else jnp.zeros((0,), dtype))

    def cond(carry):
        (_, _, _, _, _, _, _, _, _, cf, cf_prev, k, _) = carry
        return (k < n_iter1) & (jnp.abs(cf - cf_prev) >= tol)

    def body(carry):
        (ut, upt, alpha, alpha_prev, a1, a2,
         l_w, l_w_prev, l_h_prev, cf, _, k, trace) = carry

        ut, upt, a1, l_w_prev = u_phase(
            yt, dt, None, None, alpha, ut, upt,
            a1, l_w, l_w_prev, n_iter2, lagged=True)

        G, b, ydy = grams(yt, dt, ut)
        l_h = jnp.sum(ut * ut) * dmax2

        alpha, alpha_prev, a2, l_h_prev = fista.fista_alpha_gram(
            alpha, alpha_prev, a2, l_h_prev, l_h, G, b, n_iter2)

        l_w = jnp.sum(alpha * alpha) * dmax2
        cf_new = weighted_cost_gram(G, b, ydy, alpha)

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
    return ut.T, alpha, {"cost": cf, "n_iter": k, "trace": trace}


@partial(jax.jit, static_argnames=("n_u", "n_iter1", "n_iter2",
                                   "record_trace"))
def purity_solve_fused(u, alpha, y, d, R_trunc, purity, n_u: int,
                       n_iter1: int = 100, n_iter2: int = 500,
                       tol: float = 1e-2, record_trace: bool = False):
    """Fused purity-constrained solver (Frank-Wolfe alpha on Grams)."""
    dtype = accum_dtype(y)
    u = u.astype(dtype)
    alpha = alpha.astype(dtype)
    yt, dt, rtt, ut = y.T, d.T, R_trunc.T, u.T
    dmax2 = jnp.max(d) ** 2
    rt0 = jnp.concatenate([rtt, ut], axis=0)
    l_w0 = jnp.sum(alpha[-n_u:] ** 2) * dmax2
    cf0 = _cost_t(yt, dt, rt0, alpha)

    trace0 = (jnp.full((n_iter1,), jnp.nan, dtype) if record_trace
              else jnp.zeros((0,), dtype))

    def cond(carry):
        (_, _, _, _, _, _, cf, cf_prev, k, _) = carry
        return (k < n_iter1) & (jnp.abs(cf - cf_prev) >= tol)

    def body(carry):
        (ut, upt, alpha, a1, l_w, l_w_prev, cf, _, k, trace) = carry

        ut, upt, a1, l_w_prev = u_phase(
            yt, dt, rtt, alpha[:-n_u], alpha[-n_u:], ut, upt,
            a1, l_w, l_w_prev, n_iter2)

        rt = jnp.concatenate([rtt, ut], axis=0)
        G, b, ydy = grams(yt, dt, rt)

        alpha1, alpha2 = frank_wolfe_gram(
            alpha[:-n_u], alpha[-n_u:], G, b, purity, n_iter2)
        alpha = jnp.concatenate([alpha1, alpha2], axis=0)

        l_w = jnp.sum(alpha2 * alpha2) * dmax2
        cf_new = weighted_cost_gram(G, b, ydy, alpha)

        if record_trace:
            trace = trace.at[k].set(cf_new)
        return (ut, upt, alpha, a1, l_w, l_w_prev, cf_new, cf, k + 1,
                trace)

    init = (ut, ut, alpha, jnp.ones((), dtype),
            l_w0, l_w0, cf0, jnp.asarray(jnp.inf, dtype),
            jnp.zeros((), jnp.int32), trace0)
    out = jax.lax.while_loop(cond, body, init)
    ut, _, alpha, _, _, _, cf, _, k, trace = out
    return ut.T, alpha, {"cost": cf, "n_iter": k, "trace": trace}
