"""Output writers matching the reference's CSV/log formats byte-for-byte in
structure (`demethify/demethify.py:204-233`, `bootstrap.py:49-90`)."""

import os
from typing import List, Optional, Sequence

import numpy as np
import pandas as pd


def write_proportions(outdir: str, proportions: np.ndarray,
                      header: List[str], sample_names: List[str]) -> str:
    """`celltypes_proportions.csv`: index name "Cell types", one column per
    sample file basename."""
    df = pd.DataFrame(np.asarray(proportions))
    df.index = header
    df.columns = sample_names
    df.index.name = "Cell types"
    path = os.path.join(outdir, "celltypes_proportions.csv")
    df.to_csv(path, index=True)
    return df


def write_profile_estimate(outdir: str, u: np.ndarray,
                           unknown_header: List[str],
                           suffix: str = "",
                           row_offset: int = 0) -> str:
    """``suffix``/``row_offset`` support the multi-host path: each host
    writes only its own CpG row block as
    ``methylation_profile_estimate<suffix>.csv`` with a global row index,
    so no host ever gathers the genome-scale factor."""
    path = os.path.join(outdir,
                        f"methylation_profile_estimate{suffix}.csv")
    df = pd.DataFrame(np.asarray(u))
    if suffix:
        df.index = np.arange(row_offset, row_offset + df.shape[0])
        df.to_csv(path, index=True, index_label="row",
                  header=unknown_header)
    else:
        df.to_csv(path, index=False, header=unknown_header)
    return path


def write_log(outdir: str, total_time: float,
              ic_name: Optional[str] = None,
              ic_n_u: Optional[int] = None) -> str:
    path = os.path.join(outdir, "log.log")
    with open(path, "w+") as f:
        f.write("Total execution time = " + str(total_time) + " s" + "\n")
        if ic_name:
            f.write("Number of unknowns that minimises " + ic_name + " : "
                    + str(ic_n_u))
    return path


def write_ci_proportions(outdir: str, lower: np.ndarray, upper: np.ndarray,
                         cell_types: Sequence[str],
                         sample_names: Sequence[str]) -> pd.DataFrame:
    """`confidence_interval_celltypes_proportions.csv`: cells are
    "(lo, hi)" tuples, index name "Cell Type" (reference `bootstrap.py:60-70`).

    lower/upper: (p, n_s)."""
    data = {}
    for j, name in enumerate(sample_names):
        data[name] = [(float(lower[k, j]), float(upper[k, j]))
                      for k in range(lower.shape[0])]
    df = pd.DataFrame(data, index=list(cell_types))
    df.index.name = "Cell Type"
    df.to_csv(os.path.join(
        outdir, "confidence_interval_celltypes_proportions.csv"), index=True)
    return df


def write_ci_profile(outdir: str, lower: np.ndarray, upper: np.ndarray,
                     unknown_header: Sequence[str]) -> pd.DataFrame:
    """`confidence_interval_methylation_estimate.csv` (reference
    `bootstrap.py:80-89`). lower/upper: (n_cpg, n_u)."""
    data = {}
    for k, name in enumerate(unknown_header):
        data[name] = [(float(lower[j, k]), float(upper[j, k]))
                      for j in range(lower.shape[0])]
    df = pd.DataFrame(data)
    df.to_csv(os.path.join(
        outdir, "confidence_interval_methylation_estimate.csv"), index=False)
    return df
