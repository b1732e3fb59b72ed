"""Code formatting driver (reference: format.py) — black for Python,
clang-format for csrc/."""

import argparse
import os
import subprocess
import sys

TARGETS_PY = ["rnnt_inference_tpu", "tests", "bench.py", "eval_accuracy.py",
              "__graft_entry__.py", "format.py"]
TARGETS_CPP = ["csrc"]


def run(cmd):
    print("+", " ".join(cmd))
    return subprocess.call(cmd)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--check", action="store_true")
    args = p.parse_args()

    rc = 0
    black = ["black"] + (["--check"] if args.check else []) + TARGETS_PY
    try:
        rc |= run(black)
    except FileNotFoundError:
        print("black not installed; skipping python formatting")

    cpp_files = []
    for root in TARGETS_CPP:
        for dirpath, _, names in os.walk(root):
            cpp_files += [
                os.path.join(dirpath, n)
                for n in names
                if n.endswith((".cpp", ".hpp", ".h", ".cc"))
            ]
    if cpp_files:
        fmt = ["clang-format", "--dry-run" if args.check else "-i"] + cpp_files
        try:
            rc |= run(fmt)
        except FileNotFoundError:
            print("clang-format not installed; skipping C++ formatting")
    sys.exit(rc)


if __name__ == "__main__":
    main()
