"""Corrected AIC/BIC information criteria.

Reference formulas: `compute_bic` / `compute_aic` (`demethify/ic.py:11-22`),
with parameter count k = n_u*n_cpg + (n_ct + n_u - 1)*n_samples and
l = n_samples*n_cpg.
"""

import numpy as np


def _kl(n_u: int, n_cpg: int, n_ct: int, n_samples: int):
    l = n_samples * n_cpg
    k = n_u * n_cpg + (n_ct + n_u - 1) * n_samples
    return k, l


# The true weighted cost is >= 0; float32 Gram-identity evaluation can
# dip microscopically negative at near-perfect (over-parameterized) fits.
# Clamp so log() stays defined — the clamped rank scores as an extreme
# over-fit, same as the reference's tiny-positive-cost behavior.
_COST_FLOOR = 1e-30


def compute_bic(cost: float, n_u: int, n_cpg: int, n_ct: int,
                n_samples: int) -> float:
    cost = max(float(cost), _COST_FLOOR)
    k, l = _kl(n_u, n_cpg, n_ct, n_samples)
    return (2 * np.log(cost) * k * np.log(l)
            + (k * np.log(l) * (k + 1)) / (l - k - 1))


def compute_aic(cost: float, n_u: int, n_cpg: int, n_ct: int,
                n_samples: int) -> float:
    cost = max(float(cost), _COST_FLOOR)
    k, l = _kl(n_u, n_cpg, n_ct, n_samples)
    return l * np.log(cost / l) + 2 * k + (2 * k * (k + 1)) / (l - k - 1)
