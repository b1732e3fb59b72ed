"""Dataset conversion CLI (reference: datasets/convert_librispeech.py).

Builds a SampleStore .npz from a LibriSpeech-style manifest + wav files:

  python scripts/convert_librispeech.py --data_dir LibriSpeech/dev-clean-wav \
      --manifest dev-clean-wav.json --output dev-clean.npz
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
    args = p.parse_args()

    from rnnt_inference_tpu.data.dataset import convert_librispeech

    store = convert_librispeech(
        args.data_dir, args.manifest, args.output, args.max_duration
    )
    print(
        f"wrote {args.output}: {len(store)} utterances, "
        f"{store.audio_seconds:.0f} audio-seconds"
    )


if __name__ == "__main__":
    main()
