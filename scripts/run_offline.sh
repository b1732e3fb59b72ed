#!/bin/bash
# Offline scenario end-to-end (reference: run.sh stage 5 Offline, run.sh:66-71).
# Env-parameterized like the reference's launch_sut.sh.
set -e
cd "$(dirname "$0")/.."

MODEL=${MODEL:-}                 # rnnt.pt / weights .npz; empty = random
QUANT=${QUANT:-}                 # quantized .npz (overrides MODEL)
SAMPLE_FILE=${SAMPLE_FILE:-}     # SampleStore .npz; empty = synthetic
SYNTHETIC=${SYNTHETIC:-1024}
BATCH_SIZE=${BATCH_SIZE:-256}
SPLIT_LEN=${SPLIT_LEN:--1}
ACCURACY=${ACCURACY:-false}
OUTPUT_DIR=${OUTPUT_DIR:-output/offline}
NATIVE=${NATIVE:-false}          # route timing through the native issuer
PACKED=${PACKED:-}               # ""=auto (packed for waveform stores),
                                 # true=force packed, false=force bucketed

ARGS=(--scenario Offline --benchmark --batch_size "$BATCH_SIZE" \
      --split_len "$SPLIT_LEN" --output_dir "$OUTPUT_DIR")
[ "$NATIVE" = "true" ] && ARGS+=(--native_loadgen)
[ "$PACKED" = "true" ] && ARGS+=(--packed)
[ "$PACKED" = "false" ] && ARGS+=(--no_packed)
[ -n "$MLPERF_CONF" ] && ARGS+=(--mlperf_conf "$MLPERF_CONF")
[ -n "$USER_CONF" ] && ARGS+=(--user_conf "$USER_CONF")
[ -n "$PLATFORM" ] && ARGS+=(--platform "$PLATFORM")
[ -n "$MODEL" ] && ARGS+=(--model "$MODEL")
[ -n "$QUANT" ] && ARGS+=(--quant_in "$QUANT")
if [ -n "$SAMPLE_FILE" ]; then ARGS+=(--sample_file "$SAMPLE_FILE"); else ARGS+=(--synthetic "$SYNTHETIC"); fi
[ "$ACCURACY" = "true" ] && ARGS+=(--accuracy)
[ -n "$MANIFEST" ] && ARGS+=(--manifest "$MANIFEST")

# DEBUG=pdb|faulthandler|gdb wraps the run in a debugger, like the
# reference's launch_sut.sh:69-72 (gdb/lldb/memcheck) and eval_model.sh pdb.
case "${DEBUG:-}" in
  pdb)          exec python -m pdb -m rnnt_inference_tpu.main "${ARGS[@]}" ;;
  faulthandler) exec python -X faulthandler -m rnnt_inference_tpu.main "${ARGS[@]}" ;;
  gdb)          exec gdb --args python -m rnnt_inference_tpu.main "${ARGS[@]}" ;;
  "")           exec python -m rnnt_inference_tpu.main "${ARGS[@]}" ;;
  *)            echo "unknown DEBUG=$DEBUG (pdb|faulthandler|gdb)" >&2; exit 2 ;;
esac
