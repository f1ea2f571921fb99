"""Readers/writers: column conventions, fillna, output formats, utils."""

import os

import numpy as np
import pandas as pd
import pytest

from demethify_tpu.io.readers import (
    load_dataset,
    read_csv_samples,
)
from demethify_tpu.io.writers import (
    write_ci_proportions,
    write_log,
    write_proportions,
)
from demethify_tpu.utils import SolveStats, write_cost_trace


class TestCSVReaders:
    def test_single_column_gets_unit_coverage(self, tmp_path):
        p = tmp_path / "s.csv"
        p.write_text("percent_modified\n0.5\n0.25\n0.75\n")
        meth, counts = read_csv_samples([str(p)])
        np.testing.assert_allclose(meth[:, 0], [0.5, 0.25, 0.75])
        np.testing.assert_allclose(counts[:, 0], 1.0)

    def test_csv_values_not_rescaled(self, tmp_path):
        # CSV convention: raw values (no /100), reference demethify.py:140
        p = tmp_path / "s.csv"
        p.write_text("percent_modified,valid_coverage\n0.9,30\n0.1,50\n")
        meth, counts = read_csv_samples([str(p)])
        np.testing.assert_allclose(meth[:, 0], [0.9, 0.1])
        np.testing.assert_allclose(counts[:, 0], [30, 50])

    def test_fillna(self, tmp_path):
        p = tmp_path / "s.csv"
        p.write_text("percent_modified,valid_coverage\n0.5,\nNA,20\n")
        meth, counts = read_csv_samples([str(p)], fillna=True)
        np.testing.assert_allclose(meth[:, 0], [0.5, 0.0])
        np.testing.assert_allclose(counts[:, 0], [0.0, 20.0])

    def test_bedmethyl_rescales_percent(self, tmp_path):
        p = tmp_path / "s.bed"
        p.write_text("chrom\tstart\tend\tvalid_coverage\tcount_modified\t"
                     "percent_modified\nchr1\t0\t1\t40\t20\t50.0\n")
        ds = load_dataset([str(p)], bedmethyl=True)
        np.testing.assert_allclose(ds.meth_f[:, 0], [0.5])
        np.testing.assert_allclose(ds.counts[:, 0], [40])
        assert ds.sample_names == ["s.bed"]


class TestWriters:
    def test_proportions_format(self, tmp_path):
        props = np.array([[0.6, 0.3], [0.4, 0.7]])
        returned = write_proportions(str(tmp_path), props, ["A", "B"],
                                     ["s1.bed", "s2.bed"])
        assert returned.index.name == "Cell types"
        df = pd.read_csv(os.path.join(tmp_path,
                                      "celltypes_proportions.csv"),
                         index_col=0)
        assert df.index.name == "Cell types"
        assert list(df.columns) == ["s1.bed", "s2.bed"]
        np.testing.assert_allclose(df.values, props)

    def test_ci_tuple_cells(self, tmp_path):
        lo = np.array([[0.1, 0.2]])
        hi = np.array([[0.3, 0.4]])
        df = write_ci_proportions(str(tmp_path), lo, hi, ["A"],
                                  ["s1", "s2"])
        back = pd.read_csv(os.path.join(
            tmp_path, "confidence_interval_celltypes_proportions.csv"),
            index_col=0)
        assert back.index.name == "Cell Type"
        lo0, hi0 = eval(back.iloc[0, 0])
        assert (lo0, hi0) == (0.1, 0.3)

    def test_log_format(self, tmp_path):
        path = write_log(str(tmp_path), 1.234, "AIC", 7)
        text = open(path).read()
        assert text.startswith("Total execution time = 1.234 s")
        assert "Number of unknowns that minimises AIC : 7" in text


class TestUtils:
    def test_cost_trace_drops_nan_padding(self, tmp_path):
        trace = np.array([5.0, 4.0, 3.5, np.nan, np.nan])
        path = write_cost_trace(str(tmp_path), trace)
        df = pd.read_csv(path)
        assert len(df) == 3
        np.testing.assert_allclose(df["cost"], [5.0, 4.0, 3.5])

    def test_solve_stats(self):
        st = SolveStats(1000, 4)
        st.finish(10)
        assert st.outer_iters == 10
        assert st.site_iters_per_s > 0
        assert "site-iters/s" in st.summary()
