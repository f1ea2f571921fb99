"""NNDSVD initialization (Boutsidis-Gallopoulos) and its constrained variant.

Reference: `nndsvd_initialize` / `constrained_nndsvd`
(`demethify/init_func.py:17-88`). The per-component pos/neg selection loop is
vmapped over components instead of looped; the SVD runs on device
(jnp.linalg.svd). The constrained variant first fits the known block per
sample with the weighted NNLS (`wls_intercept`), then NNDSVDs the clipped
residual ``max(Y - W1 H1, 1e-8)``.
"""

import jax
import jax.numpy as jnp

from demethify_tpu.ops.nnls import wls_intercept_batch


# Above this aspect ratio the thin SVD goes through the shardable
# Gram-eigh path (ops/tall_svd.py) instead of dense LAPACK-style SVD —
# required for megabase-scale CpG panels where V never fits one device.
_TALL_RATIO = 16


def nndsvd_initialize(V, rank: int, flag: int = 0, key=None):
    """Nonneg double-SVD init. V: (m, n) nonnegative. Returns (W, H)."""
    if V.shape[0] >= _TALL_RATIO * V.shape[1]:
        from demethify_tpu.ops.tall_svd import tall_svd
        U, S, Vt = tall_svd(V)
    else:
        U, S, Vt = jnp.linalg.svd(V, full_matrices=False)
    E = Vt.T

    w0 = jnp.sqrt(S[0]) * jnp.abs(U[:, 0])
    h0 = jnp.sqrt(S[0]) * jnp.abs(E[:, 0])

    def component(u, v, s):
        up, un = jnp.maximum(u, 0.0), jnp.maximum(-u, 0.0)
        vp, vn = jnp.maximum(v, 0.0), jnp.maximum(-v, 0.0)
        n_up, n_vp = jnp.linalg.norm(up), jnp.linalg.norm(vp)
        n_un, n_vn = jnp.linalg.norm(un), jnp.linalg.norm(vn)
        termp = n_up * n_vp
        termn = n_un * n_vn
        use_pos = termp >= termn
        scale_p = jnp.sqrt(s * termp)
        scale_n = jnp.sqrt(s * termn)
        w = jnp.where(use_pos, scale_p / jnp.maximum(n_up, 1e-30) * up,
                      scale_n / jnp.maximum(n_un, 1e-30) * un)
        h = jnp.where(use_pos, scale_p / jnp.maximum(n_vp, 1e-30) * vp,
                      scale_n / jnp.maximum(n_vn, 1e-30) * vn)
        return w, h

    if rank > 1:
        ws, hs = jax.vmap(component, in_axes=(1, 1, 0), out_axes=(1, 0))(
            U[:, 1:rank], E[:, 1:rank], S[1:rank])
        W = jnp.concatenate([w0[:, None], ws], axis=1)
        H = jnp.concatenate([h0[None, :], hs], axis=0)
    else:
        W = w0[:, None]
        H = h0[None, :]

    W = jnp.where(W < 1e-11, 0.0, W)
    H = jnp.where(H < 1e-11, 0.0, H)

    if flag == 1:
        avg = jnp.mean(V)
        W = jnp.where(W == 0.0, avg, W)
        H = jnp.where(H == 0.0, avg, H)
    elif flag == 2:
        if key is None:
            raise ValueError("flag=2 NNDSVD requires a PRNG key")
        kw, kh = jax.random.split(key)
        avg = jnp.mean(V)
        W = jnp.where(W == 0.0,
                      avg * jax.random.uniform(kw, W.shape, W.dtype) / 100.0,
                      W)
        H = jnp.where(H == 0.0,
                      avg * jax.random.uniform(kh, H.shape, H.dtype) / 100.0,
                      H)
    return W, H


def constrained_nndsvd(Y, W1, counts, rank: int, flag: int = 0, key=None):
    """Known block fitted by WLS, NNDSVD on the clipped residual.

    Returns stacked (W, H) with W = [W1 | clip(W2, 0, 1)], H = [H1; H2].
    """
    H1 = wls_intercept_batch(Y, counts, W1)
    Y_residual = jnp.maximum(Y - W1 @ H1, 1e-8)
    W2, H2 = nndsvd_initialize(Y_residual, rank=rank, flag=flag, key=key)
    W2 = jnp.clip(W2, 0.0, 1.0)
    W = jnp.concatenate([W1, W2], axis=1)
    H = jnp.concatenate([H1, H2], axis=0)
    return W, H
