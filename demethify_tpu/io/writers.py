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
                     unknown_header: Sequence[str]) -> str:
    """`confidence_interval_methylation_estimate.csv` (reference
    `bootstrap.py:80-89`). lower/upper: (n_cpg, n_u). Returns the path.

    This is the genome-scale CI output (n_cpg rows), so the cells are
    assembled as strings directly instead of routing n_cpg x n_u Python
    tuple objects through a DataFrame (pandas re-reprs every tuple cell
    and re-applies csv quoting — minutes at 1M rows). Cell text is
    byte-identical to pandas' rendering of ``(float(lo), float(hi))``:
    ``"(repr(lo), repr(hi))"`` with the csv QUOTE_MINIMAL double quotes
    that the embedded comma forces."""
    # .tolist() yields builtin floats, whose repr is the shortest
    # round-trip form str(tuple) would have printed (np.float64's repr
    # differs under numpy>=2)
    lo_cols = np.asarray(lower, np.float64).T.tolist()
    hi_cols = np.asarray(upper, np.float64).T.tolist()
    col_cells = [
        [f'"({a!r}, {b!r})"' for a, b in zip(cl, ch)]
        for cl, ch in zip(lo_cols, hi_cols)]
    path = os.path.join(outdir,
                        "confidence_interval_methylation_estimate.csv")
    with open(path, "w") as f:
        f.write(",".join(unknown_header))
        f.write("\n")
        f.write("\n".join(",".join(row) for row in zip(*col_cells)))
        f.write("\n")
    return path
