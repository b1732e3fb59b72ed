#!/bin/bash
# Calibration + quantization stages (reference: calib_model.sh + save_model.sh).
set -e
cd "$(dirname "$0")/.."

MODEL=${MODEL:-}
CALIB_FILE=${CALIB_FILE:-}
SYNTHETIC=${SYNTHETIC:-500}
CALIB_OUT=${CALIB_OUT:-rnnt_calib.npz}
QUANT_OUT=${QUANT_OUT:-rnnt_quant.npz}

ARGS=(--run_mode f32 --calibration --calib_out "$CALIB_OUT")
[ -n "$PLATFORM" ] && ARGS+=(--platform "$PLATFORM")
[ -n "$MODEL" ] && ARGS+=(--model "$MODEL")
if [ -n "$CALIB_FILE" ]; then ARGS+=(--calib_file "$CALIB_FILE"); else ARGS+=(--synthetic "$SYNTHETIC"); fi
[ -n "$CALIB_LIST" ] && ARGS+=(--calib_list "$CALIB_LIST")
python -m rnnt_inference_tpu.main "${ARGS[@]}"

ARGS2=(--run_mode f32 --save_quant --calib_in "$CALIB_OUT" --quant_out "$QUANT_OUT")
[ -n "$PLATFORM" ] && ARGS2+=(--platform "$PLATFORM")
[ -n "$MODEL" ] && ARGS2+=(--model "$MODEL")
ARGS2+=(--synthetic 1)
exec python -m rnnt_inference_tpu.main "${ARGS2[@]}"
