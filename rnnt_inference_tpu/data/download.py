"""LibriSpeech download + extraction (reference: datasets/download_librispeech.py).

Offline one-shot tooling — requires network egress; in air-gapped images use
pre-staged tarballs via `extract()` only.
"""

from __future__ import annotations

import csv
import hashlib
import os
import tarfile
from typing import List, Optional

# subset, url, md5  (reference: configs/librispeech-inference.csv)
LIBRISPEECH_SETS = [
    (
        "dev-clean",
        "http://www.openslr.org/resources/12/dev-clean.tar.gz",
        "42e2234ba48799c1f50f24a7926300a1",
    ),
    (
        "train-clean-100",
        "http://www.openslr.org/resources/12/train-clean-100.tar.gz",
        "2a93770f6d5c6c964bc36631d331a522",
    ),
]


def md5_checksum(path: str) -> str:
    h = hashlib.md5()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def download_file(url: str, dest: str, expected_md5: Optional[str] = None) -> str:
    import requests

    if os.path.exists(dest) and (
        expected_md5 is None or md5_checksum(dest) == expected_md5
    ):
        return dest
    os.makedirs(os.path.dirname(dest) or ".", exist_ok=True)
    with requests.get(url, stream=True, timeout=60) as r:
        r.raise_for_status()
        with open(dest, "wb") as f:
            for chunk in r.iter_content(1 << 20):
                f.write(chunk)
    if expected_md5 is not None:
        got = md5_checksum(dest)
        if got != expected_md5:
            raise IOError(f"md5 mismatch for {dest}: {got} != {expected_md5}")
    return dest


def extract(tar_path: str, dest_dir: str) -> None:
    os.makedirs(dest_dir, exist_ok=True)
    with tarfile.open(tar_path) as t:
        t.extractall(dest_dir, filter="data")


def download_librispeech(
    dest_dir: str, subsets: Optional[List[str]] = None, csv_path: Optional[str] = None
) -> None:
    """Fetch + verify + extract the inference subsets
    (reference: download_librispeech.py:56-120)."""
    sets = LIBRISPEECH_SETS
    if csv_path:
        with open(csv_path) as f:
            sets = [(r[0], r[1], r[2]) for r in csv.reader(f) if r]
    for name, url, md5 in sets:
        if subsets and name not in subsets:
            continue
        tar = download_file(url, os.path.join(dest_dir, f"{name}.tar.gz"), md5)
        extract(tar, dest_dir)


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser("download_librispeech")
    p.add_argument("--download_dir", required=True,
                   help="where tarballs land and subsets are extracted")
    p.add_argument("--subsets", nargs="*", default=None,
                   help="subset names (default: all in the CSV/built-ins)")
    p.add_argument("--input_csv", default=None,
                   help="subset,url,md5 CSV (reference "
                        "configs/librispeech-inference.csv)")
    args = p.parse_args(argv)
    os.makedirs(args.download_dir, exist_ok=True)
    download_librispeech(args.download_dir, args.subsets, args.input_csv)


if __name__ == "__main__":
    main()
