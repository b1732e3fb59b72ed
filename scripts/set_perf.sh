#!/bin/bash
# Performance environment for serving runs (reference set_perf.sh analog).
#
# The reference pins CPU hardware knobs (no_turbo off, numa_balancing off,
# cpupower performance governor).  On TPU the chip needs no OS tuning — the
# equivalents are process-environment knobs that keep XLA compilation and
# the hot kernels at their measured-best configuration.  Source this (don't
# execute) before a serving run:
#
#   source scripts/set_perf.sh && ./scripts/run_offline.sh
#
# Every value here is the measured-best default from docs/PERFORMANCE.md;
# the script exists so one-off shells and cron jobs get the same env the
# benchmarks used.

# Persistent compilation cache: uncached TPU compiles cost minutes per
# shape; the cache makes them one-time per machine.
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)/.jax_cache}"
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS="${JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS:-1.0}"

# Hot-kernel selection (both bit-exact vs their XLA twins):
#   pallas LSTM  = int8 fused-cat / bf16 VMEM-resident recurrence kernels
#   pallas decode = fused prediction+joint+argmax+update step kernel
export RNNT_LSTM_IMPL="${RNNT_LSTM_IMPL:-pallas}"
export RNNT_DECODE_IMPL="${RNNT_DECODE_IMPL:-auto}"

# int8 fused-cat kernel batch tile: 256 beats 128 by ~6% at batch 1024
# (needs the 64 MB scoped-vmem compiler param the kernel already sets).
export RNNT_INT8_BN="${RNNT_INT8_BN:-256}"

# Gate activations: exact transcendentals, always (polynomial
# approximations are an AMX-era compromise — measured SLOWER on the TPU
# VPU; the env knob was demoted to the set_gate_act() test/bench API).

# Feature frontend: f32 DFT/mel matmuls (HIGHEST precision) are the
# contract.  bf16 operands were measured token-breaking and are now
# test-fixture-only (no env knob); RNNT_FEATURE_PRECISION != highest is a
# diagnostic mode that warns loudly.  See docs/PERFORMANCE.md.
export RNNT_FEATURE_PRECISION="${RNNT_FEATURE_PRECISION:-highest}"

echo "rnnt perf env set: cache=$JAX_COMPILATION_CACHE_DIR lstm=$RNNT_LSTM_IMPL" \
     "decode=$RNNT_DECODE_IMPL int8_bn=$RNNT_INT8_BN" >&2
