"""Score an accuracy log against a manifest: corpus WER.

Drop-in analog of the reference's top-level eval_accuracy.py (:85-106):
reads [{qsl_idx, data: <hex int32 tokens>}] (our harness emits the same
format as mlperf_log_accuracy.json), decodes to text, scores corpus WER
against manifest transcripts filtered to <= max_duration seconds.
"""

from __future__ import annotations

import argparse
import json
import sys


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--log_path", type=str, required=True)
    p.add_argument("--manifest_path", type=str, required=True)
    p.add_argument("--max_duration", type=float, default=15.0)
    p.add_argument("--hypotheses_out", type=str, default="hypotheses.log")
    args = p.parse_args()

    from rnnt_inference_tpu.data.manifest import Manifest
    from rnnt_inference_tpu.runtime.harness import hex_to_tokens
    from rnnt_inference_tpu.utils.labels import seq_to_sen
    from rnnt_inference_tpu.utils.wer import word_error_rate

    manifest = Manifest([args.manifest_path], max_duration=args.max_duration)
    references = manifest.transcripts

    with open(args.log_path) as f:
        results = json.load(f)
    hypotheses = [""] * len(results)
    for r in results:
        seq = hex_to_tokens(r["data"])
        hypotheses[r["qsl_idx"]] = seq_to_sen(seq, len(seq))

    wer, _, _ = word_error_rate(hypotheses, references)
    print(f"Word Error Rate: {wer * 100}%, accuracy={(1 - wer) * 100}%")

    with open(args.hypotheses_out, "w") as f:
        for i, h in enumerate(hypotheses):
            f.write(f"{i}::{h}\n")


if __name__ == "__main__":
    sys.path.insert(0, ".")
    main()
