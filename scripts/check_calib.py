"""Cross-check a calibration artifact against a TensorRT calibration cache.

The reference ships NVIDIA's TRT per-tensor amax table as an independent
cross-reference for calibration sanity (reference:
tests/calibration_result_nv.cache, format `tensor_name: <big-endian hex of
the f32 scale>`, amax = scale * 127 for MinMax calibration).  This tool
reconstructs the shared cat(x, h) amax our quantizer uses (max of the
previous layer's output amax and this layer's hidden amax — the reference
LSTM quantizer shares one scale across the concatenated input,
models/quant_lstm.py:167-171) and compares it with a calibration .npz
produced by `main.py --calibration`.

Different calibration corpora give different amaxes, so this is a
sanity/order-of-magnitude gate (default rtol 0.5), not a bit check.

Usage:
  python scripts/check_calib.py --cache calibration_result_nv.cache \
      --calib rnnt_calib.npz [--rtol 0.5]
"""

from __future__ import annotations

import argparse
import struct
import sys


def parse_trt_cache(path: str) -> dict:
    """Parse `name: hex` lines -> {name: f32 value} (header line skipped)."""
    out = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or ":" not in line:
                continue
            name, _, hexval = line.rpartition(":")
            name, hexval = name.strip(), hexval.strip()
            if not name or len(hexval) != 8:
                continue  # header like TRT-8001-MinMaxCalibration
            try:
                (val,) = struct.unpack(">f", bytes.fromhex(hexval))
            except ValueError:
                continue
            out[name] = val
    return out


def expected_shared_amax(cache: dict) -> dict:
    """Reconstruct per-LSTM-layer shared cat(x, h) amaxes from the TRT
    per-tensor table: in_amax[l] = max(output_amax[l-1], hidden_amax[l]);
    layer 0's input is the feature stream ("input")."""
    scale = lambda k: cache[k] * 127.0
    out = {}
    prev = scale("input")
    for l in range(2):
        key = f"encoder.pre_rnn.lstm{l}"
        out[f"pre_{l}"] = max(prev, scale(f"{key}_hidden"))
        prev = scale(f"{key}_output")
    # StackTime reshape carries the amax across (encoder_reshape == pre_rnn
    # lstm1_output in the NV table)
    for l in range(3):
        key = f"encoder.post_rnn.lstm{l}"
        out[f"post_{l}"] = max(prev, scale(f"{key}_hidden"))
        prev = scale(f"{key}_output")
    return out


def main(argv=None) -> int:
    p = argparse.ArgumentParser("check_calib")
    p.add_argument("--cache", required=True, help="TRT calibration cache file")
    p.add_argument("--calib", required=True, help="rnnt_calib.npz from main.py")
    p.add_argument("--rtol", type=float, default=0.5,
                   help="relative tolerance (corpora differ; sanity gate)")
    args = p.parse_args(argv)

    import os

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    import jax

    jax.config.update("jax_platforms", "cpu")  # amax readout needs no TPU
    from rnnt_inference_tpu.models.checkpoint import load_calib

    nv = expected_shared_amax(parse_trt_cache(args.cache))
    calib = load_calib(args.calib)  # the flattened-pytree .npz main.py saves
    ours = {
        **{f"pre_{i}": float(a) for i, a in enumerate(calib.pre_amax)},
        **{f"post_{i}": float(a) for i, a in enumerate(calib.post_amax)},
    }

    bad = 0
    for k in sorted(nv):
        ref, got = nv[k], ours.get(k)
        if got is None:
            print(f"{k}: missing in {args.calib}")
            bad += 1
            continue
        rel = abs(got - ref) / max(abs(ref), 1e-12)
        flag = "" if rel <= args.rtol else "  <-- OUT OF RANGE"
        if rel > args.rtol:
            bad += 1
        print(f"{k}: ours={got:.4f} nv={ref:.4f} rel={rel:.2f}{flag}")
    print("calibration cross-check:", "OK" if bad == 0 else f"{bad} mismatches")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
