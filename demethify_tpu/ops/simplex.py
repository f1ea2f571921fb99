"""Column-wise Euclidean projection onto the probability simplex.

Reference semantics: `projection_simplex_sort_2d` (Michelot/Condat sort-based
projection), `demethify/deconvolution.py:20-37`. The reference loops over
columns and scans for the *last* index j where ``u_j - (cumsum_j - z)/(j+1) > 0``;
here the whole thing is a single vectorized sort + cumsum + masked-argmax over
all columns at once, which XLA maps onto the VPU with no per-column control
flow. p (= n_celltypes + n_unknown) is tiny, so the sort is cheap and the op
is safe to replicate across shards.
"""

import jax.numpy as jnp


def project_columns_to_simplex(v: jnp.ndarray, z: float = 1.0) -> jnp.ndarray:
    """Project each column of ``v`` (shape (p, n)) onto {x >= 0, sum(x) = z}.

    Matches the reference's tie/threshold behavior: rho is the largest sorted
    index with ``u_j - (cumsum_j - z)/(j+1) > 0`` (guaranteed to exist for
    z > 0 since j=0 always satisfies it).
    """
    p = v.shape[0]
    u = jnp.flip(jnp.sort(v, axis=0), axis=0)  # descending per column
    pi = jnp.cumsum(u, axis=0) - z
    j1 = jnp.arange(1, p + 1, dtype=v.dtype)[:, None]
    cond = (u - pi / j1) > 0
    idx = jnp.where(cond, jnp.arange(p)[:, None], -1)
    rho = jnp.max(idx, axis=0)  # (n,)
    theta = jnp.take_along_axis(pi, rho[None, :], axis=0)[0] / (rho + 1).astype(v.dtype)
    return jnp.maximum(v - theta[None, :], jnp.zeros((), v.dtype))
