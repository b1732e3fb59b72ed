#!/bin/bash
# Server scenario (reference: run.sh stage 5 Server, run.sh:72-77).
set -e
cd "$(dirname "$0")/.."

QUANT=${QUANT:-}
MODEL=${MODEL:-}
SAMPLE_FILE=${SAMPLE_FILE:-}
SYNTHETIC=${SYNTHETIC:-512}
SLOTS=${SLOTS:-128}
SPLIT_LEN=${SPLIT_LEN:-24}
RESPONSE_SIZE=${RESPONSE_SIZE:-9}
OUTPUT_DIR=${OUTPUT_DIR:-output/server}
ACCURACY=${ACCURACY:-false}
MLPERF_CONF=${MLPERF_CONF:-configs/mlperf.conf}
USER_CONF=${USER_CONF:-configs/user.conf}
NATIVE=${NATIVE:-false}          # route timing through the native issuer

ARGS=(--scenario Server --benchmark --server_slots "$SLOTS" \
      --split_len "$SPLIT_LEN" --response_size "$RESPONSE_SIZE" --output_dir "$OUTPUT_DIR" \
      --mlperf_conf "$MLPERF_CONF" --user_conf "$USER_CONF")
[ "$NATIVE" = "true" ] && ARGS+=(--native_loadgen)
[ -n "$PLATFORM" ] && ARGS+=(--platform "$PLATFORM")
[ -n "$MODEL" ] && ARGS+=(--model "$MODEL")
[ -n "$QUANT" ] && ARGS+=(--quant_in "$QUANT")
[ "$ACCURACY" = "true" ] && ARGS+=(--accuracy)
if [ -n "$SAMPLE_FILE" ]; then ARGS+=(--sample_file "$SAMPLE_FILE"); else ARGS+=(--synthetic "$SYNTHETIC"); fi

# DEBUG=pdb|faulthandler|gdb — see run_offline.sh / reference launch_sut.sh:69-72
case "${DEBUG:-}" in
  pdb)          exec python -m pdb -m rnnt_inference_tpu.main "${ARGS[@]}" ;;
  faulthandler) exec python -X faulthandler -m rnnt_inference_tpu.main "${ARGS[@]}" ;;
  gdb)          exec gdb --args python -m rnnt_inference_tpu.main "${ARGS[@]}" ;;
  "")           exec python -m rnnt_inference_tpu.main "${ARGS[@]}" ;;
  *)            echo "unknown DEBUG=$DEBUG (pdb|faulthandler|gdb)" >&2; exit 2 ;;
esac
