"""A/B the int8 fused-cat kernel tile size (RNNT_INT8_BN) on the encoder.

Usage: RNNT_INT8_BN=256 python scripts/bench_int8_bn.py [N] [T]
Prints ms/batch for the full 5-layer quant encoder.
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

from rnnt_inference_tpu.config import RNNTParams
from rnnt_inference_tpu.models import rnnt as model
from rnnt_inference_tpu.models.quant import calibrate, quantize_weights
from rnnt_inference_tpu.models.rnnt import init_encoder_state
from rnnt_inference_tpu.models.weights import init_weights
from rnnt_inference_tpu.ops.lstm import set_lstm_impl


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    set_lstm_impl("pallas")
    params = RNNTParams()
    w32 = init_weights(jax.random.PRNGKey(0), params, dtype=jnp.float32)
    xc = jax.random.normal(jax.random.PRNGKey(1), (64, 8, params.trans_input_size))
    lc = jnp.full((8,), 64, jnp.int32)
    wq = quantize_weights(w32, calibrate(w32, [(xc, lc)], params), params)

    x = jax.random.normal(jax.random.PRNGKey(2), (T, N, params.trans_input_size))
    lens = jnp.full((N,), T, jnp.int32)
    state = init_encoder_state(N, params, jnp.int8)

    run = jax.jit(lambda x: model.transcription(wq, x, lens, state, params)[0])
    out = run(x)
    np.asarray(out[0, 0, 0])
    iters = 10
    t0 = time.time()
    for _ in range(iters):
        out = run(x + out[0, 0, 0].astype(x.dtype) * 0)
    np.asarray(out[0, 0, 0])
    dt = (time.time() - t0) / iters

    # device-side loop: the same `iters` encoder applications chained inside
    # ONE jitted fori_loop (data dependence via out[0,0,0] blocks hoisting),
    # so per-dispatch relay RPC overhead — which varies across relay
    # instances and contaminated the round-4 host-loop numbers — is excluded.
    def chained(x):
        def body(_, xc):
            f = model.transcription(wq, xc, lens, state, params)[0]
            return xc + f[0, 0, 0].astype(xc.dtype) * 0

        return jax.lax.fori_loop(0, iters, body, x)

    run_dev = jax.jit(chained)
    np.asarray(run_dev(x)[0, 0, 0])  # compile + warm
    t0 = time.time()
    np.asarray(run_dev(x)[0, 0, 0])
    dt_dev = (time.time() - t0) / iters
    print(
        f"int8 encoder N={N} T={T} BN={os.environ.get('RNNT_INT8_BN', '256')}: "
        f"{dt*1e3:.1f} ms/batch (host loop), {dt_dev*1e3:.1f} ms/batch "
        f"(device loop)",
        file=sys.stderr,
    )
    # one parseable JSON line on stdout (measure_queue.py parses the last
    # JSON line of a job's stdout; the human line above goes to stderr)
    import json

    print(json.dumps({
        "metric": "int8_encoder_ms_per_batch",
        "value": round(dt_dev * 1e3, 1),
        "unit": "ms",
        "host_loop_ms": round(dt * 1e3, 1),
        "N": N, "T": T,
        "bn": os.environ.get("RNNT_INT8_BN", "256"),
        "iters": iters,
    }))


if __name__ == "__main__":
    main()
