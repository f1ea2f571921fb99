"""CLI argument-handling quirks (reference demethify.py:51-100 semantics)."""

import pytest

from demethify_tpu.cli import build_parser


def test_defaults():
    args = build_parser().parse_args(
        ["--methfreq", "a.bed", "--outdir", "o"])
    assert args.termination == 1e-2          # scalar default
    assert args.seed == 1                    # int default (not list)
    assert args.restart is None
    assert args.iterations is None
    assert args.init == "uniform_"


def test_nargs_one_flags_arrive_as_lists():
    args = build_parser().parse_args(
        ["--methfreq", "a.bed", "--outdir", "o", "--nbunknown", "2",
         "--seed", "7", "--restart", "3", "--termination", "1e-4"])
    assert args.nbunknown == [2]
    assert args.seed == [7]
    assert args.restart == [3]
    assert args.termination == [1e-4]        # list when given


def test_ic_takes_name_and_optional_restarts():
    args = build_parser().parse_args(
        ["--methfreq", "a.bed", "--outdir", "o", "--ic", "CCC", "7"])
    assert args.ic == ["CCC", "7"]


def test_confidence_two_ints():
    args = build_parser().parse_args(
        ["--methfreq", "a.bed", "--outdir", "o", "--confidence", "95",
         "2500"])
    assert args.confidence == [95, 2500]


def test_multiple_methfreq():
    args = build_parser().parse_args(
        ["--methfreq", "a.bed", "b.bed", "c.bed", "--outdir", "o"])
    assert len(args.methfreq) == 3


def test_requires_methfreq_and_outdir():
    with pytest.raises(SystemExit):
        build_parser().parse_args(["--outdir", "o"])
    with pytest.raises(SystemExit):
        build_parser().parse_args(["--methfreq", "a.bed"])


def test_multihost_accepts_confidence_and_ic(tmp_path):
    # round 1 rejected these; they now scale out (replicates / sweep
    # ranks partition across processes — tests/test_distributed.py has
    # the real 2-process e2e). Argument validation must NOT exit; the
    # parse-level check here stops before any network rendezvous by
    # using a missing input file.
    from demethify_tpu.cli import build_parser
    for extra in (["--confidence", "95", "8"], ["--ic", "AIC"]):
        args = build_parser().parse_args(
            ["--methfreq", "x.csv", "--ref", "r.csv", "--outdir",
             str(tmp_path), "--noprint", "--platform", "cpu",
             "--multihost", "localhost:1", "2", "0"] + extra)
        assert args.multihost is not None
