"""Plots matching the reference's outputs (`demethify/plotting.py:9-93`):
stacked proportions bar, per-sample bars with optional bootstrap error
bars, and the IC-vs-rank curve — written to `<outdir>/plots/*.png` at
dpi=300. Uses a glasbey-style palette when colorcet is available, otherwise
seaborn's husl wheel (colorcet is not a hard dependency here)."""

import os
from typing import Optional

import numpy as np

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import seaborn as sns  # noqa: E402

try:  # optional, matches reference palette when present
    import colorcet as cc
    _PALETTE = cc.glasbey
except ImportError:
    _PALETTE = "husl"


def plot_proportions(df, ci_df, outdir: str, list_ic: Optional[list] = None):
    """df: proportions DataFrame (index = cell types, columns = samples);
    ci_df: DataFrame of (lo, hi) tuples or empty; list_ic: IC curve values."""
    unique_ct = list(df.index)
    colors = sns.color_palette(_PALETTE, len(unique_ct))
    clrs = list(colors)

    outdir_plots = os.path.join(outdir, "plots")
    os.makedirs(outdir_plots, exist_ok=True)

    plt.figure(figsize=(12, 8))
    df.T.plot(kind="bar", stacked=True, figsize=(10, 6), color=clrs)
    plt.title("Proportion of Cell Types in Each Sample")
    plt.ylabel("Proportion")
    plt.xlabel("Samples")
    plt.legend(title="Cell Types", bbox_to_anchor=(1.05, 1),
               loc="upper left")
    plt.savefig(os.path.join(outdir_plots, "proportions_stackedbar.png"),
                dpi=300, bbox_inches="tight")
    plt.close("all")

    sns.set(style="whitegrid")
    for sample in df.columns:
        plt.figure(figsize=(12, 8))
        ax = sns.barplot(x=df.index, y=df[sample], palette=clrs)
        if ci_df is not None and not ci_df.empty:
            ci_values = list(ci_df[sample])
            lower = np.array([c[0] for c in ci_values])
            upper = np.array([c[1] for c in ci_values])
            ax.errorbar(x=np.arange(len(df.index)), y=df[sample],
                        yerr=[np.abs(df[sample].values - lower),
                              np.abs(upper - df[sample].values)],
                        fmt="none", ecolor="black", capsize=5, capthick=2)
        plt.xlabel("Cell Types")
        plt.ylabel("Proportion")
        plt.title(f"Proportion of Cell Types in {sample}")
        plt.xticks(rotation=90)
        plt.savefig(os.path.join(
            outdir_plots, "proportions_bar_" + sample[:-4] + ".png"),
            dpi=300, bbox_inches="tight")
        plt.close("all")

    if list_ic:
        plt.figure(figsize=(8, 6))
        x_values = [i + 1 for i in range(len(list_ic))]
        plt.plot(x_values, list_ic, marker="x", linestyle="-",
                 linewidth=1.5, markersize=8, markeredgecolor="red",
                 label="IC Curve")
        plt.xlabel("Number of Unknown Components", fontsize=12)
        plt.ylabel("IC Values", fontsize=12)
        plt.title("IC vs. Number of Components", fontsize=14)
        plt.grid(alpha=0.3)
        plt.legend()
        min_idx = int(np.argmin(list_ic))
        plt.text(0.05, 0.95, f"Min IC at {x_values[min_idx]}",
                 color="red", fontsize=10, transform=plt.gca().transAxes,
                 verticalalignment="top", horizontalalignment="left")
        plt.savefig(os.path.join(outdir_plots, "ic_plot.png"),
                    dpi=300, bbox_inches="tight")
        plt.close("all")

    print("Plots generated in " + outdir_plots)
