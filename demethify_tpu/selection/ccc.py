"""Brunet cophenetic correlation coefficient over restart runs.

Reference: `compute_consensus_matrix` / `compute_ccc`
(`demethify/ic.py:24-45`). The consensus accumulation is vectorized
(equality outer-product per run) instead of the reference's O(runs * n_s^2)
Python loops; the hierarchy/cophenet step stays on host via scipy (tiny
n_samples x n_samples problem).
"""

import logging
from typing import Sequence

import numpy as np
from scipy.cluster.hierarchy import cophenet, linkage
from scipy.spatial.distance import pdist

# Host-side cost guard: the consensus matrix is (n_samples, n_samples)
# float64 on HOST and the scipy hierarchy step is O(n_s^2 log n_s) —
# fine at the tens-of-samples scale this criterion targets
# (`demethify/ic.py:24-45`), quadratic-cliff territory beyond it.
_SIZE_WARN_SAMPLES = 4096


def compute_consensus_matrix(alpha_runs: Sequence[np.ndarray]) -> np.ndarray:
    n_runs = len(alpha_runs)
    n_s = np.asarray(alpha_runs[0]).shape[1]
    if n_s > _SIZE_WARN_SAMPLES:
        logging.getLogger("demethify").warning(
            "CCC consensus over %d samples builds O(n_samples^2) host "
            "matrices (%.1f GB per n_s x n_s float64 matrix; peak ~2-3x "
            "that with the accumulator, per-run coassignment, and scipy "
            "pdist/linkage temporaries) — consider AIC/BIC for sample "
            "counts this large.", n_s, n_s * n_s * 8 / 1e9)
    acc = None
    for alpha in alpha_runs:
        assign = np.argmax(np.asarray(alpha), axis=0)
        co = (assign[:, None] == assign[None, :]).astype(np.float64)
        acc = co if acc is None else acc + co
    return acc / n_runs


def compute_ccc(alpha_runs: Sequence[np.ndarray]) -> float:
    consensus = compute_consensus_matrix(alpha_runs)
    dist = pdist(consensus, metric="euclidean")
    link = linkage(dist, method="average")
    ccc, _ = cophenet(link, dist)
    return float(ccc)
