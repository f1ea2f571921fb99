"""Compile-once model-selection sweep: all candidate ranks in ONE batch.

The reference sweeps n_u = 1..25 serially (`demethify/ic.py:192-207`), and
a naive port re-jits the solver for every rank (every n_u is a new factor
shape). On a TPU runtime where each fresh compilation goes through a remote
compile service, 25 compiles dominate wall-clock by orders of magnitude.

This module pads every candidate to a common shape and solves ALL ranks as
one vmapped computation:

- member i solves with n_u = i+1 unknowns, padded to n_u_max;
- inactive u columns and alpha rows start at zero: the Gram-form gradients
  then keep them at exactly zero (C/M/b/G contributions vanish), and the
  simplex projection is restricted to active rows by pushing inactive
  entries to -1e30 before the sort (`project_columns_to_simplex_masked`),
  which reproduces the lower-dimensional projection EXACTLY;
- per-member Lipschitz constants, costs, and the cost-delta termination
  come out identical to standalone solves (verified to machine precision
  in tests/test_batched_sweep.py);
- the vmapped while_loop freezes converged members until all are done.

One compilation, one device dispatch, n_u_max-way batch parallelism.
"""

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from demethify_tpu.selection.criteria import compute_aic, compute_bic


def _member_masks(n_ct: int, n_u_max: int):
    """(n_u_max, n_ct + n_u_max) alpha row masks; member i activates
    n_u = i+1 unknown rows."""
    n_active = jnp.arange(1, n_u_max + 1)
    unknown = jnp.arange(n_u_max)[None, :] < n_active[:, None]
    known = jnp.ones((n_u_max, n_ct), bool)
    return jnp.concatenate([known, unknown], axis=1)


def _masked_uniform_init(key, n_cpg, n_ct, n_u_max, n_s, dtype, row_mask):
    """uniform_ init on the active support: u ~ U(0,1) on active columns,
    alpha ~ Dirichlet(ones(active)) per sample via gamma normalization."""
    k1, k2 = jax.random.split(key)
    u_mask = row_mask[n_ct:]
    u0 = jax.random.uniform(k1, (n_cpg, n_u_max), dtype) * u_mask[None, :]
    g = jax.random.gamma(k2, 1.0, (n_ct + n_u_max, n_s)).astype(dtype)
    g = g * row_mask[:, None]
    alpha0 = g / jnp.sum(g, axis=0, keepdims=True)
    return u0, alpha0


def batched_rank_sweep(y, d, ref, *, n_u_max: int, key,
                       iter1: int, iter2: int, tol: float,
                       tol_relative: bool = False):
    """Solve partial-reference (ref given) or unsupervised (ref None)
    deconvolution for every n_u in 1..n_u_max as one vmapped computation.

    Returns (u_b, alpha_b, costs, n_iters): u_b (n_u_max, n_cpg, n_u_max)
    padded factors, alpha_b (n_u_max, p_max, n_s), per-member final costs
    and iteration counts. Member i's valid slice is u_b[i][:, :i+1] /
    the active alpha rows.
    """
    from demethify_tpu.solvers.partial_ref import partial_ref_solve
    from demethify_tpu.solvers.unsupervised import unsupervised_solve

    y = jnp.asarray(y)
    d = jnp.asarray(d)
    n_cpg, n_s = y.shape
    dtype = y.dtype
    n_ct = 0 if ref is None else ref.shape[1]
    masks = _member_masks(n_ct, n_u_max)
    keys = jax.random.split(key, n_u_max)

    def init_one(k, row_mask):
        return _masked_uniform_init(k, n_cpg, n_ct, n_u_max, n_s, dtype,
                                    row_mask)

    u0_b, a0_b = jax.vmap(init_one)(keys, masks)

    if ref is not None:
        ref = jnp.asarray(ref)

        def solve_one(u0, a0, row_mask):
            return partial_ref_solve(
                u0, a0, y, d, ref, n_u_max, n_iter1=iter1, n_iter2=iter2,
                tol=tol, tol_relative=tol_relative, row_mask=row_mask)
    else:
        def solve_one(u0, a0, row_mask):
            return unsupervised_solve(
                u0, a0, y, d, n_u_max, n_iter1=iter1, n_iter2=iter2,
                tol=tol, tol_relative=tol_relative, row_mask=row_mask)

    u_b, alpha_b, info = jax.vmap(solve_one)(u0_b, a0_b, masks)
    return u_b, alpha_b, info["cost"], info["n_iter"]


def evaluate_ic_batched(y, d, ref, ic: str, *, key=None, seed: int = 1,
                        iter1: int, iter2: int, tol: float,
                        n_u_max: int = 25):
    """AIC/BIC sweep over n_u = 1..n_u_max with ONE compile + dispatch.

    Returns (best_u, best_alpha, best_n_u, list_ic) like
    selection.sweep.evaluate_best_ic.
    """
    if ic not in ("AIC", "BIC"):
        raise ValueError("batched sweep supports AIC/BIC (CCC/BCV/minka "
                         "go through selection.sweep)")
    if key is None:
        key = jax.random.PRNGKey(seed)

    n_cpg, n_samples = y.shape
    n_ct = 0 if ref is None else ref.shape[1]
    u_b, alpha_b, costs, _ = batched_rank_sweep(
        y, d, ref, n_u_max=n_u_max, key=key, iter1=iter1, iter2=iter2,
        tol=tol)
    costs = np.asarray(costs, dtype=np.float64)

    fn = compute_bic if ic == "BIC" else compute_aic
    list_ic = [float(fn(costs[i], i + 1, n_cpg, n_ct, n_samples))
               for i in range(n_u_max)]
    best_i = int(np.argmin(list_ic))
    best_n_u = best_i + 1

    u_best = np.asarray(u_b[best_i])[:, :best_n_u]
    alpha_full = np.asarray(alpha_b[best_i])
    # active rows: all known + first best_n_u unknown
    alpha_best = np.concatenate([alpha_full[:n_ct],
                                 alpha_full[n_ct:n_ct + best_n_u]], axis=0)
    return u_best, alpha_best, best_n_u, list_ic
