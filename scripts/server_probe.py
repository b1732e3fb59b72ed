"""Sustained Server-scenario measurement on the local chip.

Two separately-reported quantities (they differ by orders of magnitude on
relayed backends, CLAUDE.md):

  1. DEVICE STEP CADENCE — wall time per streaming multi-step dispatch with
     the readback amortized over a long chained window.  This is the number
     that transfers to a real (non-relayed) TPU host, where readbacks cost
     ~1 ms instead of ~0.5 s.
  2. E2E p99 LATENCY under a Poisson arrival trace at a ladder of QPS
     levels, with the mlperf.conf VALID/INVALID verdict per level.  On the
     relay the tail is RPC-flush-bound; report the highest VALID QPS anyway.

Usage: python scripts/server_probe.py [qps1,qps2,...] [duration_s]
Env: PROBE_SLOTS (128), PROBE_SPLIT (24), PROBE_N (512 synthetic utts),
     PROBE_DTYPE (bf16|f32).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from rnnt_inference_tpu.config import FeaturizerConfig, RNNTParams
from rnnt_inference_tpu.data.dataset import SampleStore
from rnnt_inference_tpu.models.weights import init_weights
from rnnt_inference_tpu.runtime.config import TestSettings, validate_report
from rnnt_inference_tpu.runtime.scheduler import run_server
from rnnt_inference_tpu.runtime.server import ServerRunner


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    qps_ladder = [float(q) for q in (sys.argv[1] if len(sys.argv) > 1 else "10,20,40,80").split(",")]
    duration = float(sys.argv[2]) if len(sys.argv) > 2 else 60.0
    slots = int(os.environ.get("PROBE_SLOTS", "128"))
    split = int(os.environ.get("PROBE_SPLIT", "24"))
    n = int(os.environ.get("PROBE_N", "512"))
    dtype = jnp.bfloat16 if os.environ.get("PROBE_DTYPE", "bf16") == "bf16" else jnp.float32

    log(f"backend={jax.default_backend()} slots={slots} split={split}")
    params = RNNTParams(max_res_len=512)
    cfg = FeaturizerConfig()
    weights = init_weights(jax.random.PRNGKey(0), params, dtype=dtype)
    if os.environ.get("PROBE_DTYPE") == "quant":
        # the reference serves the QUANT model in Server; measure that path
        from rnnt_inference_tpu.models.quant import calibrate, quantize_weights

        w32 = init_weights(jax.random.PRNGKey(0), params, dtype=jnp.float32)
        xc = jax.random.normal(jax.random.PRNGKey(1), (64, 8, params.trans_input_size))
        lc = jnp.full((8,), 64, jnp.int32)
        weights = quantize_weights(w32, calibrate(w32, [(xc, lc)], params), params)
    store = SampleStore.synthetic(n=n, seed=0)
    runner = ServerRunner(weights, params, cfg, slots=slots, split_len=split)

    log("warmup (compiles one insert shape per bucket + the step fn)...")
    t0 = time.time()
    runner.warmup()
    log(f"warmup: {time.time()-t0:.1f}s")

    # -- 1. device step cadence: chain K step dispatches, one readback -----
    # fill half the slots with 8 s samples so steps do real work
    wavs = [store.samples[i] for i in range(min(slots // 2, n))]
    ids = list(range(len(wavs)))
    for start in range(0, len(wavs), runner.insert_batch):
        chunk = wavs[start : start + runner.insert_batch]
        runner.insert_samples(chunk, ids[start : start + len(chunk)])
    K = 50
    masks = [runner.step_async() for _ in range(2)]  # warm dispatch path
    np.asarray(masks[-1])
    t0 = time.time()
    masks = [runner.step_async() for _ in range(K)]
    np.asarray(masks[-1])  # ONE sync for the whole chain
    cadence_ms = (time.time() - t0) / K * 1e3
    # drain
    for _ in range(200):
        if not runner.n_active:
            break
        fin = runner.step()
        if len(fin):
            runner.extract(fin)
    log(f"device step cadence: {cadence_ms:.2f} ms per {split}-frame multi-step "
        f"dispatch ({slots} slots)")

    # -- 2. QPS ladder with conf verdict -----------------------------------
    settings = TestSettings.from_conf(
        "configs/mlperf.conf", "configs/user.conf", "rnnt", "Server"
    )
    # inflight_window amortizes the relay's ~0.5 s per-readback flush over
    # N streaming steps (finish detection lags by window*split frames; on
    # real hosts readbacks are ~1 ms and window=1 is fine)
    window = int(os.environ.get("PROBE_WINDOW", "8"))
    results = []
    for qps in qps_ladder:
        metrics, _ = run_server(
            runner, store, target_qps=qps, realtime=True,
            response_size=9, min_query_count=int(qps * duration),
            min_duration_s=duration, max_wall_s=duration * 4,
            inflight_window=window,
        )
        summary = validate_report(settings, metrics.summary())
        summary["target_qps"] = qps
        results.append(summary)
        log(json.dumps(summary))
    print(json.dumps(dict(device_step_cadence_ms=round(cadence_ms, 2),
                          split_len=split, slots=slots, ladder=results)))


if __name__ == "__main__":
    main()
