"""Nonnegative ICA initialization (torque-driven Givens rotation search).

Reference: `run_nn_ica` / `constrained_nn_ica` (`demethify/init_func.py:91-168`):
whiten the data via the symmetric inverse square root of the row covariance,
then repeatedly pick the feature pair with the largest "torque"
``G_ij = y+_i . y-_j - y-_i . y+_j`` and rotate it by the angle minimizing the
negativity loss ``1/(2 n_s) ||min(Y, 0)||_F^2``.

TPU-native formulation: the torque matrix is two matmuls
(``triu(Y+ Y-' - Y- Y+', 1)``) instead of an O(n^2) Python loop; the
1-D angle search replaces scipy's bounded Brent with a dense angle grid +
golden-section refinement (finds an at-least-as-good minimum of the same
objective); the outer search is a `lax.while_loop`. The rotation updates only
the two affected rows of W and Y (no n x n Givens matmul).

Note: like the reference, `run_nn_ica` whitens the (n_cpg x n_cpg) row
covariance, so it is only practical for feature-selected panels (thousands
of CpGs). `run_nn_ica_dual` is the genome-scale variant: since
rank(X) <= n_samples, it first projects the rows onto the exact
column-space basis from the sharded tall-skinny SVD (ops/tall_svd.py — one
psum-reducible Gram pass over the CpG shards), runs the identical
whiten + Givens-torque search in the (n_samples x n_samples) coefficient
space, and maps the found components back through the basis. Solver init
auto-switches to the dual form above `ICA_DUAL_THRESHOLD` rows
(solvers/init.py).
"""

from functools import partial

import jax
import jax.numpy as jnp


def _negativity_loss(Y):
    n_samples = Y.shape[1]
    Yn = jnp.minimum(Y, 0.0)
    return jnp.sum(Yn * Yn) / (2.0 * n_samples)


def _rotate_rows(phi, yi, yj):
    c, s = jnp.cos(phi), jnp.sin(phi)
    return c * yi + s * yj, -s * yi + c * yj


def _pair_loss(phi, yi, yj):
    ri, rj = _rotate_rows(phi, yi, yj)
    n_samples = yi.shape[0]
    ni = jnp.minimum(ri, 0.0)
    nj = jnp.minimum(rj, 0.0)
    return (jnp.sum(ni * ni) + jnp.sum(nj * nj)) / (2.0 * n_samples)


def _best_angle(yi, yj, n_grid: int = 256, n_refine: int = 40):
    """Grid + golden-section minimization of the pair negativity loss."""
    grid = jnp.linspace(0.0, 2.0 * jnp.pi, n_grid, endpoint=False,
                        dtype=yi.dtype)
    losses = jax.vmap(_pair_loss, in_axes=(0, None, None))(grid, yi, yj)
    k = jnp.argmin(losses)
    width = 2.0 * jnp.pi / n_grid
    lo = grid[k] - width
    hi = grid[k] + width

    invphi = (jnp.sqrt(5.0) - 1.0) / 2.0

    def body(_, carry):
        lo, hi = carry
        m1 = hi - invphi * (hi - lo)
        m2 = lo + invphi * (hi - lo)
        f1 = _pair_loss(m1, yi, yj)
        f2 = _pair_loss(m2, yi, yj)
        lo2 = jnp.where(f1 < f2, lo, m1)
        hi2 = jnp.where(f1 < f2, m2, hi)
        return (lo2, hi2)

    lo, hi = jax.lax.fori_loop(0, n_refine, body, (lo, hi))
    return (lo + hi) / 2.0


def whiten(X, epsilon: float = 1e-8):
    """Symmetric inverse-sqrt whitening of the row covariance."""
    Xc = X - jnp.mean(X, axis=1, keepdims=True)
    C = Xc @ Xc.T / (X.shape[1] - 1)
    D, E = jnp.linalg.eigh(C)
    D = jnp.maximum(D, epsilon)
    V = (E * (1.0 / jnp.sqrt(D))[None, :]) @ E.T
    return V @ X


def _rotation_search(Z, t_tol: float, i_max: int):
    """Torque-driven Givens rotation search on whitened rows Z.

    Returns the accumulated rotation W (n_features x n_features) such that
    W @ Z minimizes the negativity loss (greedy pairwise descent,
    reference `init_func.py:128-162`).
    """
    n_features = Z.shape[0]
    W0 = jnp.eye(n_features, dtype=Z.dtype)
    Y0 = Z

    def torque(Y):
        Yp = jnp.maximum(Y, 0.0)
        Yn = jnp.maximum(-Y, 0.0)
        G = Yp @ Yn.T - Yn @ Yp.T
        G = jnp.triu(G, k=1)
        absG = jnp.abs(G)
        t_max = jnp.max(absG)
        flat = jnp.argmax(absG)  # first occurrence, row-major (np.where parity)
        i = flat // n_features
        j = flat % n_features
        return t_max, i, j

    def cond(carry):
        _, Y, it, t_max = carry
        return (it < i_max) & (t_max >= t_tol)

    def body(carry):
        W, Y, it, _ = carry
        t_max, i, j = torque(Y)

        def rotate(args):
            W, Y = args
            yi = Y[i]
            yj = Y[j]
            phi = _best_angle(yi, yj)
            ri, rj = _rotate_rows(phi, yi, yj)
            Y = Y.at[i].set(ri).at[j].set(rj)
            wi, wj = _rotate_rows(phi, W[i], W[j])
            W = W.at[i].set(wi).at[j].set(wj)
            return W, Y

        W, Y = jax.lax.cond(t_max >= t_tol, rotate, lambda a: a, (W, Y))
        return (W, Y, it + 1, t_max)

    t0, _, _ = torque(Y0)
    W, Y, _, _ = jax.lax.while_loop(cond, body, (W0, Y0, 0, t0))
    return W


@partial(jax.jit, static_argnames=("rank", "i_max"))
def run_nn_ica(X, rank: int, t_tol: float = 1e-1, i_max: int = 1000):
    """Returns (clip(W[:, :rank], 0, 1), H[:rank, :]) like the reference."""
    Z = whiten(X)
    W = _rotation_search(Z, t_tol, i_max)
    H = jnp.maximum(W @ Z, 0.0)
    return jnp.clip(W[:, :rank], 0.0, 1.0), H[:rank, :]


@partial(jax.jit, static_argnames=("rank", "i_max"))
def run_nn_ica_dual(X, rank: int, t_tol: float = 1e-1, i_max: int = 1000):
    """Genome-scale NN-ICA: rotation search in the column-space dual.

    X (n_cpg x n_s) has rank <= n_s, so its rows live in the span of the
    top-n_s left singular vectors B (n_cpg x k, k = min(n_cpg, n_s)) from
    the sharded tall-skinny SVD. The reference algorithm's whitening and
    torque search act only on data directions; running them on the exact
    coefficient matrix S = B' X (k x n_s) is the same computation
    restricted to the span (the full-space form additionally amplifies
    numerical null-space noise through the epsilon-clamped inverse sqrt —
    a reference quirk that cannot survive at genome scale anyway).
    Components map back through B; same return convention as run_nn_ica,
    with profiles clipped to [0, 1].

    Cost: two sharded passes over X (Gram + projection) + O(n_s^3) host-
    scale math — usable at tens of millions of CpG rows.
    """
    from demethify_tpu.ops.tall_svd import tall_svd

    B, _, _ = tall_svd(X)                     # (n_cpg, k) orthonormal
    S = B.T @ X                               # (k, n_s) exact coefficients
    Z = whiten(S)
    W = _rotation_search(Z, t_tol, i_max)
    H = jnp.maximum(W @ Z, 0.0)
    profiles = B @ W[:, :rank]                # back to CpG space
    return jnp.clip(profiles, 0.0, 1.0), H[:rank, :]


def constrained_nn_ica(Y, W1, counts, rank: int, t_tol: float = 1e-1,
                       i_max: int = 1000, dual: bool = False):
    """Known block fitted by WLS, NN-ICA on the clipped residual.

    Reference `constrained_nn_ica` (`init_func.py:99-115`). With
    ``dual=True`` the residual ICA runs in the sharded column-space dual
    (`run_nn_ica_dual`) — the genome-scale path.
    """
    from demethify_tpu.ops.nnls import wls_intercept_batch

    H1 = wls_intercept_batch(Y, counts, W1)
    Y_residual = jnp.maximum(Y - W1 @ H1, 1e-8)
    ica = run_nn_ica_dual if dual else run_nn_ica
    W2, H2 = ica(Y_residual, rank=rank, t_tol=t_tol, i_max=i_max)
    W = jnp.concatenate([W1, W2], axis=1)
    H = jnp.concatenate([H1, H2], axis=0)
    return W, H
