"""Dataset conversion CLI (reference: datasets/convert_librispeech.py).

Builds SampleStore .npz artifacts from a LibriSpeech-style manifest + wav
files — the analogs of the reference's `{name}-npy.pt` (waveforms) and
`{name}-input.pt` (precomputed features, convert_librispeech.py:150-163):

  python scripts/convert_librispeech.py --data_dir LibriSpeech/dev-clean-wav \
      --manifest dev-clean-wav.json --output dev-clean.npz --features

  # calibration subset (reference: configs/calibration_files.txt)
  python scripts/convert_librispeech.py --data_dir ... --manifest ... \
      --output train-calib.npz --calib_list configs/calibration_files.txt
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data_dir", type=str, default="")
    p.add_argument("--manifest", type=str, required=True)
    p.add_argument("--output", type=str, required=True)
    p.add_argument("--max_duration", type=float, default=15.0)
    p.add_argument("--calib_list", type=str, default=None,
                   help="only convert utterances listed in this file "
                        "(one wav path per line; matched by basename)")
    p.add_argument("--features", action="store_true",
                   help="also write a precomputed-features store "
                        "(<output stem>-input.npz, the dev-clean-input.pt analog)")
    p.add_argument("-s", "--speed", type=float, nargs="*", default=None,
                   help="speed perturbation ratios for calibration "
                        "augmentation (reference --speed; each ratio s adds "
                        "a {stem}-{s}.wav copy of every utterance)")
    p.add_argument("--workers", type=int, default=0,
                   help="decode/perturb worker processes (FLAC decode is "
                        "pure Python, ~1 s per audio-minute per core)")
    args = p.parse_args()

    from rnnt_inference_tpu.data.dataset import (
        compute_features_store,
        convert_librispeech,
    )

    store = convert_librispeech(
        args.data_dir, args.manifest, args.output, args.max_duration,
        file_list=args.calib_list, speeds=args.speed, workers=args.workers,
    )
    print(
        f"wrote {args.output}: {len(store)} utterances, "
        f"{store.audio_seconds:.0f} audio-seconds"
    )
    if args.features:
        stem = args.output[:-4] if args.output.endswith(".npz") else args.output
        fpath = stem + "-input.npz"
        fstore = compute_features_store(store)
        fstore.save(fpath)
        print(f"wrote {fpath}: precomputed features "
              f"({sum(s.shape[0] for s in fstore.samples)} frames)")


if __name__ == "__main__":
    main()
