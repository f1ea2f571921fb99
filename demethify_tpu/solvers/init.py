"""Initialization strategies for the iterative solvers.

Reference: `init_BSSMF_md` / `init_BSSMF_md_p` (`demethify/deconvolution.py:
40-78, 228-267`) and the inlined unsupervised options
(`deconvolution.py:113-137`). Five options: uniform, uniform_, beta, SVD,
ICA — with the reference's fallback rule (n_u > n_samples forces uniform_)
and the zero-guard on the first unknown-alpha row
(`deconvolution.py:74-76`).

RNG: `jax.random` keys instead of the reference's global NumPy RNG; bitwise
init parity with NumPy's stateful draws is impossible, so parity is judged
statistically (and exactly, via init_provided, for the solver itself).
"""

import jax
import jax.numpy as jnp

from demethify_tpu.ops.nndsvd import constrained_nndsvd, nndsvd_initialize
from demethify_tpu.ops.nnica import (
    constrained_nn_ica,
    run_nn_ica,
    run_nn_ica_dual,
)
from demethify_tpu.ops.nnls import wls_intercept_batch
from demethify_tpu.ops.simplex import project_columns_to_simplex

INIT_OPTIONS = ("uniform", "uniform_", "beta", "SVD", "ICA")

# Above this many CpG rows the ICA init switches to the column-space dual
# form (ops/nnica.run_nn_ica_dual): the reference algorithm whitens an
# (n_cpg x n_cpg) covariance, which is panel-scale only.
ICA_DUAL_THRESHOLD = 4096


def _rand_u(key, n_cpg, n_u, dtype):
    return jax.random.uniform(key, (n_cpg, n_u), dtype)


def _rand_beta_u(key, n_cpg, n_u, dtype):
    return jax.random.beta(key, 0.5, 0.5, (n_cpg, n_u)).astype(dtype)


def _rand_dirichlet_alpha(key, p, n_s, dtype):
    return jax.random.dirichlet(key, jnp.ones((p,), dtype),
                                (n_s,)).T.astype(dtype)


def _zero_guard(alpha, n_u):
    """Reference `deconvolution.py:74-76`: if any entry of the FIRST unknown
    row is exactly zero, set that whole row to 1e-10 and scale the known
    block by (1 - 1e-10)."""
    first_unknown = alpha[-n_u]
    trigger = jnp.any(first_unknown == 0.0)
    fixed_row = jnp.where(trigger, jnp.full_like(first_unknown, 1e-10),
                          first_unknown)
    alpha = alpha.at[-n_u].set(fixed_row)
    known = alpha[:-n_u] * jnp.where(trigger, 1.0 - 1e-10, 1.0)
    return jnp.concatenate([known, alpha[-n_u:]], axis=0)


def init_partial(key, init_option: str, y, d, R_trunc, n_u: int,
                 row_weights=None):
    """Partial-reference init -> (u, alpha) with alpha: (n_ct + n_u, n_s).

    ``row_weights`` (optional, the bootstrap's row-multiplicity form):
    the 'uniform' option's WLS weights each row's coverage by its
    multiplicity — exactly the WLS on the resampled rows. The other
    options ignore it (uniform_/beta are data-independent; SVD/ICA have
    no weighted form and are rejected upstream)."""
    n_cpg, n_s = y.shape
    n_ct = R_trunc.shape[1]
    p = n_ct + n_u
    dtype = y.dtype

    if init_option != "uniform_" and n_u > n_s:
        init_option = "uniform_"

    k1, k2 = jax.random.split(key)
    if init_option == "uniform":
        u = _rand_u(k1, n_cpg, n_u, dtype)
        dw = d if row_weights is None else d * row_weights[:, None]
        alpha = wls_intercept_batch(y, dw,
                                    jnp.concatenate([R_trunc, u], 1))
    elif init_option == "uniform_":
        u = _rand_u(k1, n_cpg, n_u, dtype)
        alpha = _rand_dirichlet_alpha(k2, p, n_s, dtype)
    elif init_option == "beta":
        u = _rand_beta_u(k1, n_cpg, n_u, dtype)
        alpha = _rand_dirichlet_alpha(k2, p, n_s, dtype)
    elif init_option == "ICA":
        W, alpha = constrained_nn_ica(y, R_trunc, d, rank=n_u, t_tol=1e-1,
                                      dual=n_cpg > ICA_DUAL_THRESHOLD)
        alpha = project_columns_to_simplex(alpha)
        u = W[:, n_ct:]
    elif init_option == "SVD":
        W, alpha = constrained_nndsvd(y, R_trunc, d, rank=n_u, flag=0)
        alpha = project_columns_to_simplex(alpha)
        u = W[:, n_ct:]
    else:
        raise ValueError(f"Unknown init option: {init_option!r}")

    alpha = _zero_guard(alpha, n_u)
    return u, alpha


def init_purity(key, init_option: str, y, d, R_trunc, n_u: int, purity,
                row_weights=None):
    """Purity-constrained init (reference `deconvolution.py:228-267`).

    Known block scaled by purity, unknown by (1 - purity) — except the SVD
    branch, which (like the reference, `deconvolution.py:262`) omits the
    (1 - purity) factor on the unknown block. No zero-guard here.
    ``row_weights`` as in init_partial (weighted-bootstrap WLS).
    """
    n_cpg, n_s = y.shape
    n_ct = R_trunc.shape[1]
    p = n_ct + n_u
    dtype = y.dtype

    if init_option != "uniform_" and n_u > n_s:
        init_option = "uniform_"

    k1, k2 = jax.random.split(key)
    if init_option == "uniform":
        u = _rand_u(k1, n_cpg, n_u, dtype)
        dw = d if row_weights is None else d * row_weights[:, None]
        alpha = wls_intercept_batch(y, dw,
                                    jnp.concatenate([R_trunc, u], 1))
    elif init_option == "uniform_":
        u = _rand_u(k1, n_cpg, n_u, dtype)
        alpha = _rand_dirichlet_alpha(k2, p, n_s, dtype)
    elif init_option == "beta":
        u = _rand_beta_u(k1, n_cpg, n_u, dtype)
        alpha = _rand_dirichlet_alpha(k2, p, n_s, dtype)
    elif init_option == "ICA":
        W, alpha = constrained_nn_ica(y, R_trunc, d, rank=n_u, t_tol=1e-1,
                                      dual=n_cpg > ICA_DUAL_THRESHOLD)
        alpha = jnp.concatenate([
            purity[None, :] * project_columns_to_simplex(alpha[:-n_u]),
            (1.0 - purity)[None, :] * project_columns_to_simplex(alpha[-n_u:]),
        ], axis=0)
        u = W[:, n_ct:]
    elif init_option == "SVD":
        W, alpha = constrained_nndsvd(y, R_trunc, d, rank=n_u, flag=0)
        alpha = jnp.concatenate([
            purity[None, :] * project_columns_to_simplex(alpha[:-n_u]),
            project_columns_to_simplex(alpha[-n_u:]),
        ], axis=0)
        u = W[:, n_ct:]
    else:
        raise ValueError(f"Unknown init option: {init_option!r}")

    return u, alpha


def init_unsupervised(key, init_option: str, y, d, n_u: int):
    """Unsupervised init -> (u, alpha) with alpha: (n_u, n_s).

    The reference's 'uniform' branch references an undefined variable
    (`deconvolution.py:117` NameError) — unusable as shipped — so here it
    falls back to 'uniform_' semantics with a clear note.
    """
    n_cpg, n_s = y.shape
    dtype = y.dtype

    if init_option != "uniform_" and n_u > n_s:
        init_option = "uniform_"

    k1, k2 = jax.random.split(key)
    if init_option in ("uniform", "uniform_"):
        u = _rand_u(k1, n_cpg, n_u, dtype)
        alpha = _rand_dirichlet_alpha(k2, n_u, n_s, dtype)
    elif init_option == "beta":
        u = _rand_beta_u(k1, n_cpg, n_u, dtype)
        alpha = _rand_dirichlet_alpha(k2, n_u, n_s, dtype)
    elif init_option == "ICA":
        ica = (run_nn_ica_dual if n_cpg > ICA_DUAL_THRESHOLD
               else run_nn_ica)
        u, alpha = ica(y, rank=n_u, t_tol=1e-1)
        u = jnp.clip(u, 0.0, 1.0)
        alpha = project_columns_to_simplex(alpha)
    elif init_option == "SVD":
        u, alpha = nndsvd_initialize(y, rank=n_u)
        u = jnp.clip(u, 0.0, 1.0)
        alpha = project_columns_to_simplex(alpha)
    else:
        raise ValueError(f"Unknown init option: {init_option!r}")

    return u, alpha
