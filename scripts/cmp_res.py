"""Transcript-diff tool over hypotheses.log dumps.

Golden-output diffing analog of the reference's tests/cmp_res.py (:16-28):
two runs (e.g. a quant run vs a fake_quant run, or today's run vs a golden
log) each produce a hypotheses.log via eval_accuracy.py — one `idx::text`
line per sample — and this tool reports every index where the transcripts
differ.  Exit code 1 if any differences (usable as a CI gate).

Usage:
  python scripts/cmp_res.py golden/hypotheses.log run/hypotheses.log
  python scripts/cmp_res.py a.log b.log --limit 5
"""

from __future__ import annotations

import argparse
import sys
from typing import Dict, List, Tuple


def load_hypotheses(path: str) -> Dict[int, str]:
    """Parse an `idx::text` hypotheses.log into {index: transcript}."""
    out: Dict[int, str] = {}
    with open(path) as f:
        for line in f:
            if "::" not in line:
                continue
            idx_s, _, text = line.partition("::")
            out[int(idx_s)] = text.rstrip("\n")
    return out


def diff_hypotheses(
    a: Dict[int, str], b: Dict[int, str]
) -> Tuple[List[int], List[int]]:
    """Return (mismatched indices, indices present in only one file)."""
    keys_a, keys_b = set(a), set(b)
    only = sorted(keys_a ^ keys_b)
    mismatched = sorted(k for k in keys_a & keys_b if a[k] != b[k])
    return mismatched, only


def main(argv=None) -> int:
    p = argparse.ArgumentParser("cmp_res")
    p.add_argument("file_a")
    p.add_argument("file_b")
    p.add_argument("--limit", type=int, default=20,
                   help="max mismatches to print in full (all are counted)")
    args = p.parse_args(argv)

    a = load_hypotheses(args.file_a)
    b = load_hypotheses(args.file_b)
    mismatched, only = diff_hypotheses(a, b)

    for k in mismatched[: args.limit]:
        print(k)
        print(f"a: {a[k]}")
        print(f"b: {b[k]}")
        print("-" * 30)
    if len(mismatched) > args.limit:
        print(f"... {len(mismatched) - args.limit} more mismatches not shown")
    if only:
        print(f"indices present in only one file: {only}")
    print(f"diff samples num: {len(mismatched)}")
    print(f"error index list: {mismatched}")
    return 1 if (mismatched or only) else 0


if __name__ == "__main__":
    sys.exit(main())
