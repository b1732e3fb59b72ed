"""Headline benchmark: Offline-scenario throughput on the local chip(s).

Prints ONE JSON line:
  {"metric": "offline_audio_seconds_per_second", "value": N,
   "unit": "audio-s/s", "vs_baseline": N / 46500}

Baseline: the reference (Intel MLPerf RNN-T, 2-socket SPR, 112 cores) targets
6000 utt/s Offline over dev-clean (~7.75 s/utt) ~= 46,500 audio-seconds/s for
the whole machine (BASELINE.md).  vs_baseline compares ONE TPU chip against
that full 2-socket system.

Env knobs: BENCH_N (samples, default 256), BENCH_BATCH (default 128),
BENCH_SECONDS ("4,8,15" wav bucket ladder), BENCH_DTYPE (bf16|f32).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from rnnt_inference_tpu.config import FeaturizerConfig, RNNTParams
from rnnt_inference_tpu.ops.lstm import set_lstm_impl
from rnnt_inference_tpu.data.dataset import SampleStore
from rnnt_inference_tpu.models.weights import init_weights
from rnnt_inference_tpu.runtime.harness import run_offline
from rnnt_inference_tpu.runtime.offline import OfflineRunner  # noqa: F401
from rnnt_inference_tpu.runtime.qsl import QuerySampleLibrary

BASELINE_AUDIO_S_PER_S = 46500.0


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    n = int(os.environ.get("BENCH_N", "8192"))
    batch = int(os.environ.get("BENCH_BATCH", "1024"))
    buckets = tuple(
        float(s) for s in os.environ.get("BENCH_SECONDS", "4,8,15").split(",")
    )
    dtype = jnp.bfloat16 if os.environ.get("BENCH_DTYPE", "bf16") == "bf16" else jnp.float32
    set_lstm_impl(os.environ.get("RNNT_LSTM_IMPL", "pallas"))

    log(f"backend={jax.default_backend()} devices={jax.devices()}")
    import dataclasses as _dc

    # 512 tokens comfortably covers <=15 s transcripts (~450 chars max);
    # halves the per-batch result transfer vs the 1024 default
    params = _dc.replace(
        RNNTParams(), max_res_len=int(os.environ.get("BENCH_RES_LEN", "512"))
    )
    cfg = FeaturizerConfig()
    if os.environ.get("BENCH_DTYPE") == "quant":
        # int8 encoder path: synthetic calibration then quantize
        from rnnt_inference_tpu.models.quant import calibrate, quantize_weights
        from rnnt_inference_tpu.ops.features import log_mel_features

        w32 = init_weights(jax.random.PRNGKey(0), params, dtype=jnp.float32)
        import numpy as _np

        wav = jnp.asarray((_np.random.RandomState(1).randn(8, 64000) * 0.1).astype(_np.float32))
        feats, flens = jax.jit(lambda a, b: log_mel_features(a, b, cfg))(
            wav, jnp.full((8,), 64000, jnp.int32)
        )
        calib = calibrate(w32, [(feats, flens)], params)
        weights = quantize_weights(w32, calib, params)
        log("int8-quantized encoder (synthetic calibration)")
    else:
        weights = init_weights(jax.random.PRNGKey(0), params, dtype=dtype)

    store = SampleStore.synthetic(n=n, seed=0)
    qsl = QuerySampleLibrary(store, cfg, wav_buckets_s=buckets)
    log(f"store: {n} utts, {store.audio_seconds:.0f} audio-s; "
        f"buckets={qsl.wav_buckets}")

    t0 = time.time()
    report = run_offline(
        weights,
        store,
        params,
        cfg,
        batch_size=batch,
        warmup=True,  # untimed: stage to HBM + compile bucket shapes
        device_resident=True,
        wav_buckets_s=buckets,
        min_duration_s=float(os.environ.get("BENCH_MIN_S", "3")),
    )
    log(f"total incl. staging+compile (untimed portion): {time.time()-t0:.1f}s")
    log(f"run: {report.wall_seconds:.2f}s wall, "
        f"{report.samples_per_second:.1f} utt/s, "
        f"{report.audio_seconds_per_second:.0f} audio-s/s")

    value = report.audio_seconds_per_second
    print(
        json.dumps(
            {
                "metric": "offline_audio_seconds_per_second",
                "value": round(value, 1),
                "unit": "audio-s/s",
                "vs_baseline": round(value / BASELINE_AUDIO_S_PER_S, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
