"""Output-contract tests for plotting.py: filenames, figure families,
error-bar handling, and palette distinctness."""

import os

import numpy as np
import pandas as pd
import pytest

from demethify_tpu.plotting import categorical_palette, plot_proportions


@pytest.fixture
def props_df():
    rng = np.random.default_rng(0)
    p = rng.dirichlet(np.ones(4), size=3).T  # 4 cell types x 3 samples
    return pd.DataFrame(
        p, index=["ctA", "ctB", "ctC", "unknown_1"],
        columns=["s1.bed", "s2.bed", "s3.bed"])


def test_all_figure_families_written(tmp_path, props_df):
    ci = pd.DataFrame(
        {c: [(v - 0.05, v + 0.05) for v in props_df[c]]
         for c in props_df.columns})
    plot_proportions(props_df, ci, str(tmp_path), list_ic=[5.0, 3.0, 4.0])
    plots = tmp_path / "plots"
    assert (plots / "proportions_stackedbar.png").exists()
    for stem in ["s1", "s2", "s3"]:
        assert (plots / f"proportions_bar_{stem}.png").exists()
    assert (plots / "ic_plot.png").exists()
    # real PNGs, not zero-byte placeholders
    for f in plots.iterdir():
        assert f.stat().st_size > 1000


def test_no_ci_no_ic(tmp_path, props_df):
    plot_proportions(props_df, None, str(tmp_path))
    plots = tmp_path / "plots"
    assert (plots / "proportions_stackedbar.png").exists()
    assert not (plots / "ic_plot.png").exists()
    # empty CI frame is also fine
    plot_proportions(props_df, pd.DataFrame(), str(tmp_path))


def test_palette_distinct_and_deterministic():
    a = categorical_palette(30)
    b = categorical_palette(30)
    assert a == b
    assert len(a) == 30
    # all pairs separated in RGB space
    arr = np.asarray(a)
    d = np.linalg.norm(arr[:, None, :] - arr[None, :, :], axis=-1)
    d += np.eye(30)
    assert d.min() > 0.05
