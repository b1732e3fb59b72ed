"""A/B the feature-frontend matmul precision on the TPU.

Usage: [RNNT_FEATURE_PRECISION=high] python scripts/bench_features.py [N] [SECS]

Prints ms/batch for the full log-mel frontend, plus (when run with
RNNT_FEATURE_PRECISION=high) the normalized-feature drift vs the highest-
precision features and the greedy-decode token agreement on a small
quantized model — the same gate that rejected the bf16-operand experiment
(tests/test_features.py; docs/PERFORMANCE.md "bf16 featurizer").
"""

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
from rnnt_inference_tpu.ops import features as F


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    secs = float(sys.argv[2]) if len(sys.argv) > 2 else 15.0
    cfg = FeaturizerConfig()
    S = int(secs * cfg.sample_rate)
    rng = np.random.RandomState(0)
    wav = jnp.asarray((rng.randn(N, S) * 0.1).astype(np.float32))
    lens = jnp.full((N,), S, jnp.int32)

    run = jax.jit(F.log_mel_features, static_argnames="cfg")
    feats, flens = run(wav, lens, cfg)
    np.asarray(flens)  # sync (block_until_ready is a no-op on this relay)

    iters = 10
    t0 = time.time()
    for _ in range(iters):
        feats, flens = run(wav, lens, cfg)
    np.asarray(flens)
    dt = (time.time() - t0) / iters
    prec = os.environ.get("RNNT_FEATURE_PRECISION", "highest")
    print(
        f"frontend N={N} secs={secs} precision={prec}: {dt*1e3:.1f} ms/batch",
        file=sys.stderr,
    )

    record = {
        "metric": "frontend_ms_per_batch",
        "value": round(dt * 1e3, 1),
        "unit": "ms",
        "N": N, "secs": secs, "precision": prec, "iters": iters,
    }

    if prec == "high":
        # drift + token gate vs the highest-precision features
        f_hi = np.asarray(feats)
        os.environ["RNNT_FEATURE_PRECISION"] = "highest"
        run2 = jax.jit(F.log_mel_features, static_argnames="cfg")
        feats2, _ = run2(wav[:64], lens[:64], cfg)
        f_ref = np.asarray(feats2)
        drift = np.abs(f_hi[:, :64] - f_ref)
        print(
            f"feature drift vs highest: p50={np.percentile(drift,50):.2e} "
            f"p99={np.percentile(drift,99):.2e} max={drift.max():.2e}",
            file=sys.stderr,
        )
        record["drift_p99"] = float(np.percentile(drift, 99))
        record["drift_max"] = float(drift.max())

        from rnnt_inference_tpu.models.decoder import greedy_decode
        from rnnt_inference_tpu.models.quant import calibrate, quantize_weights
        from rnnt_inference_tpu.models.weights import init_weights

        params = RNNTParams(max_res_len=256)
        w = init_weights(jax.random.PRNGKey(0), params, dtype=jnp.float32)
        xc = jax.random.normal(jax.random.PRNGKey(1), (64, 8, params.trans_input_size))
        lc = jnp.full((8,), 64, jnp.int32)
        wq = quantize_weights(w, calibrate(w, [(xc, lc)], params), params)
        dec = jax.jit(lambda f, l: greedy_decode(wq, f, l, params=params))
        r_hi = np.asarray(dec(jnp.asarray(f_hi[:, :64]), flens[:64])[0])
        r_ref = np.asarray(dec(jnp.asarray(f_ref), flens[:64])[0])
        same = np.array_equal(r_hi, r_ref)
        print(
            f"greedy tokens identical across precision: {same}",
            file=sys.stderr,
        )
        record["tokens_identical"] = bool(same)

    import json

    print(json.dumps(record))


if __name__ == "__main__":
    main()
