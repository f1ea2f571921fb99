"""Brunet cophenetic correlation coefficient over restart runs.

Reference: `compute_consensus_matrix` / `compute_ccc`
(`demethify/ic.py:24-45`). The consensus accumulation is vectorized
(equality outer-product per run) instead of the reference's O(runs * n_s^2)
Python loops; the hierarchy/cophenet step stays on host via scipy (tiny
n_samples x n_samples problem).
"""

from typing import Sequence

import numpy as np
from scipy.cluster.hierarchy import cophenet, linkage
from scipy.spatial.distance import pdist


def compute_consensus_matrix(alpha_runs: Sequence[np.ndarray]) -> np.ndarray:
    n_runs = len(alpha_runs)
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
