"""Owen-Perry bi-cross-validation for rank selection.

Reference: `bicross_validation` (`demethify/ic.py:58-89`): n_folds random
element masks (Bernoulli keep-probability `fraction`), refit on the masked
data, score PRESS on the held-out mask. Like the reference, returns the
TOTAL PRESS across folds (not the mean — `ic.py:89`) plus the best fold's
factors.

Folds are drawn with `jax.random` keys and could be vmapped; they run as a
short host loop here because each fold's solve already saturates the chip.
"""

from typing import Optional

import jax
import jax.numpy as jnp


def bicross_validation(y, counts, n_u: int, *, ref=None,
                       init_option: str = "uniform_",
                       iter1: int, iter2: int, tol: float,
                       n_folds: int = 10, fraction: float = 0.3,
                       key=None, seed: Optional[int] = None):
    from demethify_tpu.solvers.api import (
        partial_reference_deconv,
        unsupervised_deconv,
    )

    if key is None:
        key = jax.random.PRNGKey(0 if seed is None else seed)

    y = jnp.asarray(y)
    counts = jnp.asarray(counts)
    total_press = 0.0
    best_u = None
    best_alpha = None
    min_error = float("inf")

    for fold in range(n_folds):
        kf = jax.random.fold_in(key, fold)
        k_mask, k_init = jax.random.split(kf)
        train_mask = jax.random.uniform(k_mask, y.shape) < fraction
        test_mask = ~train_mask
        n_test = int(jnp.sum(test_mask))
        if n_test == 0 or int(jnp.sum(train_mask)) == 0:
            continue

        y_tr = y * train_mask
        d_tr = counts * train_mask
        if ref is not None:
            res = partial_reference_deconv(
                y_tr, d_tr, jnp.asarray(ref), n_u, init=init_option,
                key=k_init, n_iter1=iter1, n_iter2=iter2, tol=tol)
            R = jnp.concatenate([jnp.asarray(ref), res.u], axis=1)
        else:
            res = unsupervised_deconv(
                y_tr, d_tr, n_u, init=init_option, key=k_init,
                n_iter1=iter1, n_iter2=iter2, tol=tol)
            R = res.u

        y_pred = R @ res.proportions
        test_error = float(jnp.sum(((y - y_pred) * test_mask) ** 2)) / n_test
        total_press += test_error

        if test_error < min_error:
            min_error = test_error
            best_u = res.u
            best_alpha = res.proportions

    return total_press, best_u, best_alpha
