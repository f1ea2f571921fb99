"""Figure output for deconvolution results.

Output contract (shared with the reference CLI so downstream tooling keeps
working — see `demethify/plotting.py:9-93` for the original surface):

* ``<outdir>/plots/proportions_stackedbar.png`` — one stacked bar per
  sample showing the estimated cell-type composition.
* ``<outdir>/plots/proportions_bar_<sample>.png`` — per-sample bar chart
  of proportions, with bootstrap confidence whiskers when CI data exists.
* ``<outdir>/plots/ic_plot.png`` — information-criterion value against the
  candidate number of unknown components (only for ``--ic`` runs).

Everything else here (palette, figure construction, styling, annotation) is
an independent design. The categorical palette is a deterministic
maximally-spaced hue walk in the same spirit as Glasbey colour tables; when
the optional ``colorcet`` package is installed its ``glasbey`` table is used
instead so plots match reference installs colour-for-colour.
"""

from __future__ import annotations

import colorsys
import os
from typing import Optional, Sequence

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

_DPI = 300
# Golden-angle fraction: successive hues land maximally far apart, so any
# prefix of the palette is well separated (the property glasbey tables are
# built for).
_GOLDEN = 0.6180339887498949


def categorical_palette(n: int) -> list:
    """Return ``n`` visually distinct RGB triples.

    Prefers colorcet's glasbey table (exact parity with reference installs);
    otherwise walks hue by the golden angle while cycling through a small
    grid of (saturation, value) pairs so neighbours differ in more than hue.
    """
    try:
        import colorcet as cc

        table = list(cc.glasbey)
        if n <= len(table):
            return [matplotlib.colors.to_rgb(c) for c in table[:n]]
    except ImportError:
        pass

    sat_val = [(0.85, 0.85), (0.55, 0.95), (0.95, 0.60), (0.40, 0.75)]
    colors = []
    h = 0.12  # start away from pure red so error whiskers stay readable
    for i in range(n):
        s, v = sat_val[i % len(sat_val)]
        colors.append(colorsys.hsv_to_rgb(h % 1.0, s, v))
        h += _GOLDEN
    return colors


def _sample_stem(sample: str) -> str:
    """Filename stem for a sample column.

    The reference names per-sample figures by chopping the last four
    characters of the column label (its columns always end in ``.bed``); we
    reproduce that so existing pipelines find the same filenames.
    """
    return sample[:-4]


def _ci_whiskers(point: np.ndarray, ci_column: Sequence) -> np.ndarray:
    """(2, n) array of asymmetric whisker lengths from (lo, hi) tuples."""
    lo = np.asarray([pair[0] for pair in ci_column], dtype=float)
    hi = np.asarray([pair[1] for pair in ci_column], dtype=float)
    return np.vstack([np.abs(point - lo), np.abs(hi - point)])


def save_stacked_bar(df, path: str, colors) -> None:
    """All samples side by side, each a stacked bar of proportions."""
    n_ct, n_samples = df.shape
    fig, ax = plt.subplots(figsize=(max(8.0, 0.9 * n_samples + 4.0), 6.0))
    x = np.arange(n_samples)
    bottom = np.zeros(n_samples)
    values = df.to_numpy(dtype=float)
    for row, (ct, color) in enumerate(zip(df.index, colors)):
        ax.bar(x, values[row], bottom=bottom, width=0.72, label=str(ct),
               color=color, edgecolor="white", linewidth=0.4)
        bottom += values[row]
    ax.set_xticks(x)
    ax.set_xticklabels([str(c) for c in df.columns], rotation=45,
                       ha="right")
    ax.set_ylim(0.0, max(1.0, float(bottom.max())) * 1.02)
    ax.set_ylabel("Estimated proportion")
    ax.set_title("Cell-type composition per sample")
    ax.spines[["top", "right"]].set_visible(False)
    ax.legend(title="Cell type", frameon=False, bbox_to_anchor=(1.02, 1.0),
              loc="upper left", fontsize=8)
    fig.savefig(path, dpi=_DPI, bbox_inches="tight")
    plt.close(fig)


def save_sample_bars(df, ci_df, outdir_plots: str, colors) -> None:
    """One figure per sample; whiskers from bootstrap CIs when available."""
    labels = [str(ct) for ct in df.index]
    x = np.arange(len(labels))
    for sample in df.columns:
        point = df[sample].to_numpy(dtype=float)
        fig, ax = plt.subplots(figsize=(max(6.0, 0.45 * len(labels) + 3.0),
                                        5.0))
        ax.bar(x, point, width=0.7, color=colors, edgecolor="white",
               linewidth=0.4)
        if ci_df is not None and not ci_df.empty and sample in ci_df:
            ax.errorbar(x, point, yerr=_ci_whiskers(point, ci_df[sample]),
                        fmt="none", ecolor="0.15", elinewidth=1.2,
                        capsize=4)
        ax.set_xticks(x)
        ax.set_xticklabels(labels, rotation=90, fontsize=8)
        ax.set_ylabel("Estimated proportion")
        ax.set_title(f"Composition of {sample}")
        ax.spines[["top", "right"]].set_visible(False)
        ax.margins(x=0.01)
        fig.savefig(os.path.join(
            outdir_plots, f"proportions_bar_{_sample_stem(sample)}.png"),
            dpi=_DPI, bbox_inches="tight")
        plt.close(fig)


def save_ic_curve(list_ic: Sequence[float], path: str) -> None:
    """Criterion value vs candidate rank, with the argmin called out."""
    values = np.asarray(list_ic, dtype=float)
    ranks = np.arange(1, values.size + 1)
    best = int(np.argmin(values))
    fig, ax = plt.subplots(figsize=(7.0, 4.5))
    ax.plot(ranks, values, color="#2a6f97", linewidth=1.8, zorder=2)
    ax.scatter(ranks, values, s=24, color="#2a6f97", zorder=3)
    ax.scatter([ranks[best]], [values[best]], s=90, facecolor="none",
               edgecolor="#c1121f", linewidth=2.0, zorder=4)
    ax.annotate(f"best: {ranks[best]} unknown(s)",
                xy=(ranks[best], values[best]),
                xytext=(8, 12), textcoords="offset points",
                color="#c1121f", fontsize=10)
    ax.set_xlabel("Number of unknown components")
    ax.set_ylabel("Criterion value")
    ax.set_title("Model selection")
    if values.size <= 30:
        ax.set_xticks(ranks)
    ax.grid(True, axis="y", alpha=0.25)
    ax.spines[["top", "right"]].set_visible(False)
    fig.savefig(path, dpi=_DPI, bbox_inches="tight")
    plt.close(fig)


def plot_proportions(df, ci_df, outdir: str,
                     list_ic: Optional[Sequence[float]] = None) -> None:
    """Write every figure family for a finished run.

    ``df``: proportions (index = cell types, columns = samples).
    ``ci_df``: per-sample columns of ``(lo, hi)`` tuples, or None/empty.
    ``list_ic``: criterion values for ranks 1..len, or None.
    """
    outdir_plots = os.path.join(outdir, "plots")
    os.makedirs(outdir_plots, exist_ok=True)
    colors = categorical_palette(len(df.index))

    save_stacked_bar(
        df, os.path.join(outdir_plots, "proportions_stackedbar.png"), colors)
    save_sample_bars(df, ci_df, outdir_plots, colors)
    if list_ic is not None and len(list_ic):
        save_ic_curve(list_ic, os.path.join(outdir_plots, "ic_plot.png"))

    print("Plots generated in " + outdir_plots)
