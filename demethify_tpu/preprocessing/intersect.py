"""Multi-BED intersection: align CpG rows across reference and sample BEDs.

Reference: `preprocessing/intersect_bed.py:18-83` — chains pairwise
`bedtools intersect -wa -wb` subprocess calls, then splits the combined
table back into per-file `*_intersect.bed` with original headers.

This port replaces the external-binary dependency with a built-in sorted
interval join (numpy searchsorted per chromosome) with the same -wa -wb
semantics: every overlapping (rowA, rowB) pair is emitted, in A-major
order. No subprocess, no temp files, no bedtools install required.
"""

import argparse
import os
from typing import List, Tuple

import numpy as np
import pandas as pd



def _read_bed(path: str) -> pd.DataFrame:
    return pd.read_csv(path, sep="\t")


def _interval_join(a: pd.DataFrame, b: pd.DataFrame) -> pd.DataFrame:
    """All (rowA, rowB) pairs whose [start, end) intervals overlap on the
    same chromosome, A-major order (bedtools -wa -wb semantics).

    Works positionally on (chrom, start, end) = columns 0..2 so chained
    joins with duplicated column names are fine.
    """
    a_chrom = a.iloc[:, 0].to_numpy()
    a_start = a.iloc[:, 1].to_numpy()
    a_end = a.iloc[:, 2].to_numpy()
    b_chrom = b.iloc[:, 0].to_numpy()
    b_start = b.iloc[:, 1].to_numpy()
    b_end = b.iloc[:, 2].to_numpy()

    out_pairs: List[Tuple[np.ndarray, np.ndarray]] = []
    b_by_chrom = {}
    for c in pd.unique(b_chrom):
        sel = np.flatnonzero(b_chrom == c)
        order = sel[np.argsort(b_start[sel], kind="stable")]
        b_by_chrom[c] = (b_start[order], b_end[order], order)

    for c in pd.unique(a_chrom):
        if c not in b_by_chrom:
            continue
        bs, be, b_pos = b_by_chrom[c]
        max_b_end = np.maximum.accumulate(be)
        for ai in np.flatnonzero(a_chrom == c):
            s, e = a_start[ai], a_end[ai]
            lo = np.searchsorted(max_b_end, s, side="right")
            hi = np.searchsorted(bs, e, side="left")
            if hi > lo:
                cand = np.arange(lo, hi)
                mask = (bs[cand] < e) & (be[cand] > s)
                hits = b_pos[cand[mask]]
                if hits.size:
                    out_pairs.append((np.full(hits.size, ai), hits))

    ncols = len(a.columns) + len(b.columns)
    if not out_pairs:
        return pd.DataFrame(np.empty((0, ncols)),
                            columns=range(ncols))
    ai = np.concatenate([p[0] for p in out_pairs])
    bi = np.concatenate([p[1] for p in out_pairs])
    order = np.argsort(ai, kind="stable")  # exact A-file row order
    ai, bi = ai[order], bi[order]
    left = a.iloc[ai].reset_index(drop=True)
    right = b.iloc[bi].reset_index(drop=True)
    out = pd.concat([left, right], axis=1, ignore_index=True)
    return out


def intersect_bed_files(bed_files: List[str],
                        output_folder: str) -> List[str]:
    if len(bed_files) < 2:
        raise ValueError(
            "At least two BED files are required for intersection.")
    for bed_file in bed_files:
        if not os.path.isfile(bed_file):
            raise FileNotFoundError(f"{bed_file} does not exist.")

    frames = [_read_bed(p) for p in bed_files]
    cols_per_file = [len(f.columns) for f in frames]
    total_header: List[str] = sum((list(f.columns) for f in frames), [])

    current = frames[0]
    for nxt in frames[1:]:
        current = _interval_join(current, nxt)

    os.makedirs(output_folder, exist_ok=True)
    outputs = []
    start_idx = 0
    for i, bed_file in enumerate(bed_files):
        end_idx = start_idx + cols_per_file[i]
        part = current.iloc[:, start_idx:end_idx].copy()
        part.columns = total_header[start_idx:end_idx]
        out_name = os.path.basename(bed_file)[:-4] + "_intersect.bed"
        out_path = os.path.join(output_folder, out_name)
        part.to_csv(out_path, sep="\t", header=True, index=False)
        outputs.append(out_path)
        start_idx = end_idx

    print("Intersected files created: ", outputs)
    return outputs


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Intersect multiple BED files.")
    parser.add_argument('--bed', nargs='+',
                        help="List of BED files to intersect (at least two "
                             "files required).")
    parser.add_argument('--out', nargs='?', type=str, default='.',
                        help='Path to output folder')
    args = parser.parse_args(argv)

    output_folder = os.path.join(os.getcwd(), args.out)
    if not os.path.exists(output_folder):
        print(f'Creating directory {output_folder} to store results')
        os.makedirs(output_folder, exist_ok=True)
    intersect_bed_files(args.bed, output_folder)
    return 0


if __name__ == "__main__":
    main()
