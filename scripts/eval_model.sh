#!/bin/bash
# Accuracy evaluation (reference: eval_model.sh): run the Offline scenario in
# accuracy mode, then score the accuracy log against the manifest with
# eval_accuracy.py (WER).  DEBUG=pdb|faulthandler|gdb supported like the
# reference's pdb/gdb wrappers.
set -e
cd "$(dirname "$0")/.."

MODEL=${MODEL:-}
QUANT=${QUANT:-}
SAMPLE_FILE=${SAMPLE_FILE:-}
SYNTHETIC=${SYNTHETIC:-256}
MANIFEST=${MANIFEST:-}
BATCH_SIZE=${BATCH_SIZE:-128}
OUTPUT_DIR=${OUTPUT_DIR:-output/eval}

ARGS=(--scenario Offline --accuracy --batch_size "$BATCH_SIZE" \
      --output_dir "$OUTPUT_DIR")
[ -n "$MODEL" ] && ARGS+=(--model "$MODEL")
[ -n "$QUANT" ] && ARGS+=(--quant_in "$QUANT")
if [ -n "$SAMPLE_FILE" ]; then ARGS+=(--sample_file "$SAMPLE_FILE"); else ARGS+=(--synthetic "$SYNTHETIC"); fi
[ -n "$MANIFEST" ] && ARGS+=(--manifest "$MANIFEST")

case "${DEBUG:-}" in
  pdb)          python -m pdb -m rnnt_inference_tpu.main "${ARGS[@]}" ;;
  faulthandler) python -X faulthandler -m rnnt_inference_tpu.main "${ARGS[@]}" ;;
  gdb)          gdb --args python -m rnnt_inference_tpu.main "${ARGS[@]}" ;;
  "")           python -m rnnt_inference_tpu.main "${ARGS[@]}" ;;
  *)            echo "unknown DEBUG=$DEBUG (pdb|faulthandler|gdb)" >&2; exit 2 ;;
esac

# corpus WER against the manifest (the in-run summary already includes WER
# when the store carries transcripts; this reproduces the reference's
# separate eval_accuracy.py scoring pass)
if [ -n "$MANIFEST" ]; then
  exec python eval_accuracy.py --log_path "$OUTPUT_DIR/accuracy_log.json" \
      --manifest_path "$MANIFEST"
fi
