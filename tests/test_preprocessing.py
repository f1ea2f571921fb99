"""Tests for feature selection, BED intersection, and the simulator."""

import numpy as np
import pandas as pd
import pytest

from demethify_tpu.preprocessing.feature_selection import feature_select
from demethify_tpu.preprocessing.intersect import (
    _interval_join,
    intersect_bed_files,
)
from demethify_tpu.simulate import gen_param, gen_param_u, generate_dataset


def _write_bed(path, rows, extra_cols):
    df = pd.DataFrame(rows, columns=["chrom", "start", "end"])
    for name, vals in extra_cols.items():
        df[name] = vals
    df.to_csv(path, sep="\t", index=False)
    return df


class TestFeatureSelection:
    def test_var_selects_highest_variance(self, tmp_path):
        rng = np.random.default_rng(0)
        rows = [("chr1", i, i + 1) for i in range(50)]
        vals = rng.uniform(size=(50, 4)) * 0.01
        vals[7] = [0.0, 1.0, 0.0, 1.0]   # max variance row
        bed = tmp_path / "ref.bed"
        _write_bed(bed, rows, {f"ct{j}": vals[:, j] for j in range(4)})
        out = feature_select(str(bed), 5, str(tmp_path), method="var")
        sel = pd.read_csv(out, sep="\t")
        assert sel.shape[0] == 5
        assert 7 in sel["start"].values

    def test_svd_leverage(self, tmp_path):
        rng = np.random.default_rng(1)
        rows = [("chr1", i, i + 1) for i in range(30)]
        vals = rng.uniform(size=(30, 3))
        bed = tmp_path / "ref.bed"
        _write_bed(bed, rows, {f"ct{j}": vals[:, j] for j in range(3)})
        out = feature_select(str(bed), 10, str(tmp_path), method="svd")
        assert pd.read_csv(out, sep="\t").shape[0] == 10

    def test_bad_method(self, tmp_path):
        rows = [("chr1", 0, 1)]
        bed = tmp_path / "r.bed"
        _write_bed(bed, rows, {"ct": [0.5]})
        with pytest.raises(ValueError):
            feature_select(str(bed), 1, str(tmp_path), method="nope")


class TestIntersect:
    def test_pairwise_exact_positions(self, tmp_path):
        a = _write_bed(tmp_path / "a.bed",
                       [("chr1", 0, 1), ("chr1", 5, 6), ("chr2", 0, 1)],
                       {"va": [1, 2, 3]})
        b = _write_bed(tmp_path / "b.bed",
                       [("chr1", 5, 6), ("chr2", 0, 1), ("chr3", 9, 10)],
                       {"vb": [10, 20, 30]})
        outs = intersect_bed_files([str(tmp_path / "a.bed"),
                                    str(tmp_path / "b.bed")],
                                   str(tmp_path / "out"))
        ia = pd.read_csv(outs[0], sep="\t")
        ib = pd.read_csv(outs[1], sep="\t")
        assert list(ia["va"]) == [2, 3]
        assert list(ib["vb"]) == [10, 20]

    def test_overlap_semantics(self):
        a = pd.DataFrame({"chrom": ["chr1"], "start": [10], "end": [20],
                          "x": [1]})
        b = pd.DataFrame({"chrom": ["chr1"] * 3,
                          "start": [0, 15, 20], "end": [10, 25, 30],
                          "y": [1, 2, 3]})
        j = _interval_join(a, b)
        # [10,20) overlaps [15,25) only ([0,10) and [20,30) touch but
        # don't overlap half-open intervals)
        assert j.shape[0] == 1
        assert j.iloc[0, 5] == 15

    def test_three_way_chain(self, tmp_path):
        for name, vals in [("a", [1, 2]), ("b", [3, 4]), ("c", [5, 6])]:
            _write_bed(tmp_path / f"{name}.bed",
                       [("chr1", 0, 1), ("chr1", 9, 10)],
                       {f"v{name}": vals})
        outs = intersect_bed_files(
            [str(tmp_path / f"{n}.bed") for n in "abc"],
            str(tmp_path / "out"))
        for out in outs:
            assert pd.read_csv(out, sep="\t").shape[0] == 2

    def test_requires_two_files(self, tmp_path):
        _write_bed(tmp_path / "a.bed", [("chr1", 0, 1)], {"v": [1]})
        with pytest.raises(ValueError):
            intersect_bed_files([str(tmp_path / "a.bed")], str(tmp_path))


class TestSimulator:
    def test_gen_param_shapes(self):
        rng = np.random.default_rng(0)
        R = rng.uniform(size=(100, 6))
        x, d, alpha = gen_param(R, 50, 4, rng)
        assert x.shape == (100, 4) and d.shape == (100, 4)
        np.testing.assert_allclose(alpha.sum(axis=0), 1.0, atol=1e-12)
        assert (x <= d).all()

    def test_gen_param_u_truth(self):
        rng = np.random.default_rng(1)
        R = rng.uniform(size=(200, 8))
        unknown = np.array([0.3, 0.5, 0.1])
        x, d, truth, m_u = gen_param_u(R, 40, 5, unknown, 3, rng)
        assert truth.shape == (6, 3)
        np.testing.assert_allclose(truth[-1], unknown)
        np.testing.assert_allclose(truth.sum(axis=0), 1.0, atol=1e-12)
        assert m_u.shape == (200, 1)
        assert (m_u >= 0).all() and (m_u <= 1).all()

    def test_generate_dataset_roundtrip(self, tmp_path):
        rng = np.random.default_rng(2)
        rows = [("chr1", i, i + 1) for i in range(120)]
        vals = rng.uniform(size=(120, 7))
        bed = tmp_path / "ref.bed"
        _write_bed(bed, rows, {f"ct{j}": vals[:, j] for j in range(7)})
        out = generate_dataset(str(bed), str(tmp_path / "gen"),
                               nb_samples=3, nb_known=5,
                               unknown_portion=[0.2, 0.4, 0.6], seed=3)
        # generated fixtures are directly consumable by the CLI readers
        from demethify_tpu.io.readers import load_dataset
        ds = load_dataset(out["samples"], ref=out["ref"], bedmethyl=True,
                          fillna=True)
        assert ds.meth_f.shape == (120, 3)
        assert ds.ref.shape == (120, 5)
        truth = pd.read_csv(out["proportions"], sep="\t", index_col=0)
        assert truth.shape == (6, 3)


def test_generate_dataset_random_known(tmp_path):
    # reference gen_u == "random" mode (gen_bedmethyl.py:58): the known
    # cell types are a seeded draw without replacement
    rng = np.random.default_rng(5)
    rows = [("chr1", i, i + 1) for i in range(60)]
    vals = rng.uniform(size=(60, 7))
    bed = tmp_path / "ref.bed"
    _write_bed(bed, rows, {f"ct{j}": vals[:, j] for j in range(7)})
    out1 = generate_dataset(str(bed), str(tmp_path / "a"), nb_samples=2,
                            nb_known=4, unknown_portion=[0.2, 0.4],
                            seed=9, random_known=True)
    out2 = generate_dataset(str(bed), str(tmp_path / "b"), nb_samples=2,
                            nb_known=4, unknown_portion=[0.2, 0.4],
                            seed=9, random_known=True)
    ref1 = pd.read_csv(out1["ref"], sep="\t")
    ref2 = pd.read_csv(out2["ref"], sep="\t")
    known1 = list(ref1.columns[3:])
    assert len(known1) == 4 and len(set(known1)) == 4
    assert known1 == list(ref2.columns[3:])          # seeded: reproducible
    assert known1 != [f"ct{j}" for j in range(4)]    # not just first-n
