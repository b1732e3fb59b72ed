"""Golden-transcript diff tool (scripts/cmp_res.py; reference tests/cmp_res.py)."""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from cmp_res import diff_hypotheses, load_hypotheses, main as cmp_main


def _write_log(path, entries):
    with open(path, "w") as f:
        for i, h in entries:
            f.write(f"{i}::{h}\n")


def test_identical_logs_exit_zero(tmp_path, capsys):
    a = tmp_path / "a.log"
    b = tmp_path / "b.log"
    _write_log(a, [(0, "hello world"), (1, "the cat"), (2, "")])
    _write_log(b, [(2, ""), (0, "hello world"), (1, "the cat")])  # any order
    rc = cmp_main([str(a), str(b)])
    assert rc == 0
    out = capsys.readouterr().out
    assert "diff samples num: 0" in out


def test_mismatch_and_missing_reported(tmp_path, capsys):
    a = tmp_path / "a.log"
    b = tmp_path / "b.log"
    _write_log(a, [(0, "hello world"), (1, "the cat"), (3, "only a")])
    _write_log(b, [(0, "hello world"), (1, "the dog")])
    rc = cmp_main([str(a), str(b)])
    assert rc == 1
    out = capsys.readouterr().out
    assert "diff samples num: 1" in out
    assert "error index list: [1]" in out
    assert "only one file: [3]" in out
    da, db = load_hypotheses(str(a)), load_hypotheses(str(b))
    mism, only = diff_hypotheses(da, db)
    assert mism == [1] and only == [3]


def test_transcript_with_separator_in_text(tmp_path):
    # partition on the FIRST '::' — transcripts containing '::' survive
    a = tmp_path / "a.log"
    _write_log(a, [(5, "a::b")])
    assert load_hypotheses(str(a)) == {5: "a::b"}
