"""Native fastbed parser vs pandas on real fixtures and edge cases."""

import os

import numpy as np
import pandas as pd
import pytest

from demethify_tpu.io import fastbed
from demethify_tpu.io.readers import load_dataset

FIXDIR = "/root/reference/test/output_gen"

pytestmark = pytest.mark.skipif(not fastbed.available(),
                                reason="no native toolchain")


class TestFastbed:
    def test_matches_pandas_on_fixture(self):
        path = os.path.join(FIXDIR, "sample1.bed")
        if not os.path.exists(path):
            pytest.skip("fixtures not mounted")
        got = fastbed.parse_columns(
            path, ["percent_modified", "valid_coverage"], "\t")
        df = pd.read_csv(path, sep="\t")
        np.testing.assert_allclose(
            got, df[["percent_modified", "valid_coverage"]].values,
            rtol=1e-12)

    def test_na_handling(self, tmp_path):
        p = tmp_path / "x.tsv"
        p.write_text("a\tb\tc\n1\tNA\t3\n4\t\t6\nnan\t8\t.\n")
        got = fastbed.parse_columns(str(p), ["a", "b", "c"], "\t")
        assert got.shape == (3, 3)
        assert np.isnan(got[0, 1]) and np.isnan(got[1, 1])
        assert np.isnan(got[2, 0]) and np.isnan(got[2, 2])
        assert got[0, 0] == 1 and got[2, 1] == 8

    def test_csv_delim(self, tmp_path):
        p = tmp_path / "x.csv"
        p.write_text("percent_modified,valid_coverage\n0.5,10\n0.25,20\n")
        got = fastbed.parse_columns(
            str(p), ["valid_coverage", "percent_modified"], ",")
        np.testing.assert_allclose(got, [[10, 0.5], [20, 0.25]])

    def test_no_trailing_newline(self, tmp_path):
        p = tmp_path / "x.tsv"
        p.write_text("a\tb\n1\t2\n3\t4")
        got = fastbed.parse_columns(str(p), ["b"], "\t")
        np.testing.assert_allclose(got, [[2], [4]])

    def test_missing_column_raises(self, tmp_path):
        p = tmp_path / "x.tsv"
        p.write_text("a\tb\n1\t2\n")
        with pytest.raises(KeyError):
            fastbed.parse_columns(str(p), ["zzz"], "\t")

    def test_dataset_identical_with_and_without_native(self, monkeypatch):
        if not os.path.exists(FIXDIR):
            pytest.skip("fixtures not mounted")
        samples = [os.path.join(FIXDIR, f"sample{i}.bed")
                   for i in (1, 2)]
        ref = os.path.join(FIXDIR, "ref_matrix.bed")
        ds_native = load_dataset(samples, ref=ref, bedmethyl=True)
        monkeypatch.setattr(fastbed, "available", lambda: False)
        ds_pandas = load_dataset(samples, ref=ref, bedmethyl=True)
        np.testing.assert_allclose(ds_native.meth_f, ds_pandas.meth_f,
                                   rtol=1e-12)
        np.testing.assert_allclose(ds_native.counts, ds_pandas.counts)
        np.testing.assert_allclose(ds_native.ref, ds_pandas.ref)
        assert ds_native.header == ds_pandas.header
