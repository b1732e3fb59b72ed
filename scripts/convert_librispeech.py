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


def build_manifest_from_dir(input_dir: str, out_path: str) -> int:
    """Scan a raw LibriSpeech subset directory into a manifest JSON.

    LibriSpeech layout: `<spk>/<chap>/<spk>-<chap>.trans.txt` lines of
    `<utt-id> TRANSCRIPT`, one `<utt-id>.flac` per line (reference scans the
    same tree: datasets/convert_librispeech.py:87-108).  Durations come from
    each file's STREAMINFO header — no frame decode."""
    import glob
    import json

    from rnnt_inference_tpu.data.flac import flac_stream_info

    entries = []
    for txt in sorted(
        glob.glob(os.path.join(input_dir, "**", "*.trans.txt"), recursive=True)
    ):
        chap_dir = os.path.dirname(txt)
        with open(txt) as f:
            for line in f:
                utt_id, _, transcript = line.strip().partition(" ")
                if not utt_id:
                    continue
                flac_path = os.path.join(chap_dir, utt_id + ".flac")
                total, sr = flac_stream_info(flac_path)
                entries.append(
                    {
                        "audio_filepath": os.path.relpath(flac_path, input_dir),
                        "duration": total / sr,
                        "transcript": transcript,
                    }
                )
    with open(out_path, "w") as f:
        json.dump(entries, f)
    return len(entries)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data_dir", type=str, default="")
    p.add_argument("--input_dir", type=str, default=None,
                   help="raw LibriSpeech subset dir (e.g. .../dev-clean): "
                        "scans */*/*.trans.txt into a manifest first, then "
                        "converts (reference --input_dir mode)")
    p.add_argument("--manifest", type=str, default=None)
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

    if args.input_dir:
        stem = args.output[:-4] if args.output.endswith(".npz") else args.output
        manifest_path = stem + ".manifest.json"
        n = build_manifest_from_dir(args.input_dir, manifest_path)
        print(f"scanned {args.input_dir}: {n} utterances -> {manifest_path}")
        args.manifest = manifest_path
        args.data_dir = args.data_dir or args.input_dir
    if not args.manifest:
        p.error("need --manifest or --input_dir")

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
