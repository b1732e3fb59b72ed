"""Pin the packed-decode slowdown with chained-rep timings + ablations.

Three inconsistent per-iteration decode costs were observed on this chip:
  ~31 us/iter   headline bench marginal (N=1024, bucket T2<=250, pipeline)
  ~850 us/iter  direct chunk-decode call (first version of this script,
                single rep — relay-flush contaminated)
  ~4.4 ms/iter  packed phase-D (T2~1056, starts enabled, res_len 1066)

This version chains reps with a data dependency (sync once), so per-call
relay flushes amortize, and ablates one variable per leg:

  base256 / base1024 : plain chunk decode, default params, quant weights
  starts1024         : + starts matrix (all False) — the packed gather path
  reslen1024         : + max_res_len=1066 (the packed result buffer)
  bf16_1024          : bf16 weights instead of quant (prediction dtype)
  biased1024         : blank-biased joint (~0.5 emit/frame) — iteration mix

Usage: python scripts/diag_decode_scaling.py
"""

import dataclasses
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

from rnnt_inference_tpu.config import RNNTParams
from rnnt_inference_tpu.models.decoder import (
    _greedy_decode_chunk_xla,
    init_decode_state,
)
from rnnt_inference_tpu.models.quant import calibrate, quantize_weights
from rnnt_inference_tpu.models.weights import init_weights


def sync1(leaf):
    np.asarray(leaf[tuple(0 for _ in leaf.shape)])


REPS = 5


def timed_chained(build_run, f, f_lens):
    """build_run() -> jitted fn(f, f_lens) -> res_idx (N,).  Chains REPS
    calls via a scalar data dependency; one sync at the end."""
    run = build_run()
    r = run(f, f_lens)
    sync1(r)  # compile + warm, drained
    t0 = time.time()
    r = run(f, f_lens)
    for _ in range(REPS - 1):
        r = run(f + r[0].astype(f.dtype) * 0, f_lens)
    sync1(r)
    return (time.time() - t0) / REPS * 1e3


def main():
    N = int(os.environ.get("DIAG_N", "1024"))
    params = RNNTParams()
    w32 = init_weights(jax.random.PRNGKey(0), params, dtype=jnp.float32)
    xc = jax.random.normal(jax.random.PRNGKey(1), (64, 8, params.trans_input_size))
    wq = quantize_weights(
        w32, calibrate(w32, [(xc, jnp.full((8,), 64, jnp.int32))], params), params
    )
    wbf = init_weights(jax.random.PRNGKey(0), params, dtype=jnp.bfloat16)

    def mkf(T2, dtype):
        return jax.random.normal(
            jax.random.PRNGKey(2), (T2, N, params.trans_hidden_size), jnp.float32
        ).astype(dtype)

    out = {}

    def leg(name, weights, T2, pp, starts, f_dtype):
        f = mkf(T2, f_dtype)
        f_lens = jnp.full((N,), T2, jnp.int32)
        st = jnp.zeros((T2, N), bool) if starts else None

        def build():
            return jax.jit(
                lambda f, l: _greedy_decode_chunk_xla(
                    weights, init_decode_state(N, pp), f, l, pp, starts=st
                ).res_idx
            )

        ms = timed_chained(build, f, f_lens)
        iters = 2 * T2 + 1  # dense emissions at cap=1 (unbiased weights)
        out[f"{name}_ms"] = round(ms, 1)
        out[f"{name}_us_per_iter"] = round(ms * 1e3 / iters, 1)
        print(f"{name}: {ms:.1f} ms (~{ms*1e3/iters:.0f} us/iter x {iters})",
              file=sys.stderr)

    jdtype = wq.joint.w1_trans.dtype
    leg("base256", wq, 256, params, False, jdtype)
    leg("base1024", wq, 1024, params, False, jdtype)
    pp_big = dataclasses.replace(params, max_res_len=1066)
    leg("starts1024", wq, 1024, params, True, jdtype)
    leg("reslen1024", wq, 1024, pp_big, False, jdtype)
    leg("bf16_1024", wbf, 1024, params, False, wbf.joint.w1_trans.dtype)

    # blank-biased joint: ~sparser emissions change the iteration mix
    b2 = wq.joint.b2
    blank_bias = jnp.zeros_like(b2).at[params.BLANK].set(
        (jnp.abs(b2).mean() + 5.0).astype(b2.dtype)
    )
    wq_biased = dataclasses.replace(
        wq, joint=dataclasses.replace(wq.joint, b2=b2 + blank_bias)
    )
    f = mkf(1024, jdtype)
    f_lens = jnp.full((N,), 1024, jnp.int32)
    run = jax.jit(
        lambda f, l: _greedy_decode_chunk_xla(
            wq_biased, init_decode_state(N, params), f, l, params
        ).res_idx
    )
    r = run(f, f_lens)
    sync1(r)
    emitted = int(np.asarray(run(f, f_lens)).max()) + 1
    t0 = time.time()
    rr = run(f, f_lens)
    for _ in range(REPS - 1):
        rr = run(f + rr[0].astype(f.dtype) * 0, f_lens)
    sync1(rr)
    ms = (time.time() - t0) / REPS * 1e3
    iters = 1024 + emitted + 1
    out["biased1024_ms"] = round(ms, 1)
    out["biased1024_us_per_iter"] = round(ms * 1e3 / iters, 1)
    print(f"biased1024: {ms:.1f} ms (~{ms*1e3/iters:.0f} us/iter, "
          f"max-lane emitted {emitted})", file=sys.stderr)

    out.update({"metric": "decode_scaling", "value": out["base1024_ms"],
                "unit": "ms", "N": N, "reps": REPS})
    print(json.dumps(out))


if __name__ == "__main__":
    main()
