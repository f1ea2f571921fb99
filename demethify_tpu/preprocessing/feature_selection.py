"""CpG panel feature selection: keep the top-n most informative rows.

Reference: `preprocessing/feature_selection.py:7-36` — select rows of a
reference BED either by row variance or by summed |U| leverage scores from
the SVD. Here both scores are computed on device (jnp.var / on-device SVD),
which is what makes genome-scale panels tractable; the BED frame handling
stays host-side pandas.
"""

import argparse
import os

import numpy as np
import pandas as pd


# Panels below this row count are scored host-side: NumPy finishes in
# milliseconds, while initializing an accelerator + compiling var/SVD can
# take minutes on a remote-compile TPU runtime for zero gain.
_DEVICE_THRESHOLD_ROWS = 200_000


def _scores(values: np.ndarray, n: int, method: str,
            force_device: bool = False) -> np.ndarray:
    if method not in ("var", "svd"):
        raise ValueError("Invalid method! Choose 'var' or 'svd'.")
    if values.shape[0] < _DEVICE_THRESHOLD_ROWS and not force_device:
        if method == "var":
            return values.var(axis=1, ddof=1)
        U, _, _ = np.linalg.svd(values, full_matrices=False)
        return np.abs(U[:, :n]).sum(axis=1)

    import jax.numpy as jnp

    from demethify_tpu.ops.tall_svd import tall_svd

    x = jnp.asarray(values)
    if method == "var":
        return np.asarray(jnp.var(x, axis=1, ddof=1))
    # tall-skinny SVD via the shardable Gram path (ops/tall_svd.py)
    U, _, _ = tall_svd(x)
    return np.asarray(jnp.sum(jnp.abs(U[:, :n]), axis=1))


def feature_select(bedfile: str, n: int, output_folder: str,
                   method: str = "svd") -> str:
    df = pd.read_csv(bedfile, sep="\t")
    df_cleaned = df.dropna()
    values = df_cleaned.iloc[:, 3:].values.astype(np.float64)

    scores = _scores(values, n, method)
    if method == "var":
        # reference uses pandas nlargest (rows ordered by score)
        selected = df_cleaned.loc[
            pd.Series(scores, index=df_cleaned.index).nlargest(n).index]
    else:
        selected = df_cleaned.iloc[np.argsort(-scores)[:n]]

    os.makedirs(output_folder, exist_ok=True)
    output_file = os.path.join(
        output_folder,
        os.path.basename(bedfile).replace(".bed", "_select_ref.bed"))
    selected.to_csv(output_file, sep="\t", header=True, index=False)
    return output_file


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Select top N rows using variance or SVD from a BED "
                    "file.")
    parser.add_argument('--bed', type=str, required=True,
                        help='Path to the input BED file')
    parser.add_argument('--n', type=int, required=True,
                        help='Number of top rows to select')
    parser.add_argument('--out', nargs='?', type=str, default='.',
                        help='Path to output folder')
    parser.add_argument('--method', type=str, choices=["var", "svd"],
                        default="svd")
    args = parser.parse_args(argv)
    feature_select(args.bed, args.n, args.out, args.method)
    return 0


if __name__ == "__main__":
    main()
