"""Why does decode cost scale with EMISSION DENSITY?

diag_decode_scaling measured the same XLA decode program at ~830 us/iter
with dense emissions and ~75 us/iter with zero emissions (blank-biased) —
XLA ops are data-independent, so something value-dependent is leaking.

Legs (all N=1024, T2=512, same unbiased quant weights + same f):
  cap0      max_symbols_per_step=0 — update_g forced False by the CAP, so
            zero emissions with the dense-leg's exact weights/data values.
            Fast -> cost tied to the emission MASK, not numerics.
  cap1      the dense control (~1 emission/frame).
  bias ladder  delta swept to hit ~0.25/0.5 emit rates — cost vs density.

Usage: python scripts/diag_decode_emit.py
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
N = 1024
T2 = 512


def main():
    params = RNNTParams()
    w32 = init_weights(jax.random.PRNGKey(0), params, dtype=jnp.float32)
    xc = jax.random.normal(jax.random.PRNGKey(1), (64, 8, params.trans_input_size))
    wq = quantize_weights(
        w32, calibrate(w32, [(xc, jnp.full((8,), 64, jnp.int32))], params), params
    )
    f = jax.random.normal(
        jax.random.PRNGKey(2), (T2, N, params.trans_hidden_size), jnp.float32
    ).astype(wq.joint.w1_trans.dtype)
    f_lens = jnp.full((N,), T2, jnp.int32)

    out = {}

    def leg(name, weights, cap):
        pp = dataclasses.replace(params, max_symbols_per_step=cap)
        run = jax.jit(
            lambda f, l: _greedy_decode_chunk_xla(
                weights, init_decode_state(N, pp), f, l, pp
            ).res_idx
        )
        r = run(f, f_lens)
        sync1(r)
        emitted = int(np.asarray(r).mean()) + 1  # mean emissions per lane
        t0 = time.time()
        rr = run(f, f_lens)
        for _ in range(REPS - 1):
            rr = run(f + rr[0].astype(f.dtype) * 0, f_lens)
        sync1(rr)
        ms = (time.time() - t0) / REPS * 1e3
        out[f"{name}_ms"] = round(ms, 1)
        out[f"{name}_mean_emit_per_lane"] = emitted
        print(f"{name}: {ms:.1f} ms, mean emissions/lane {emitted}",
              file=sys.stderr)

    leg("cap0", wq, 0)
    leg("cap1", wq, 1)

    for delta in (1.0, 2.0, 3.0):
        b2 = wq.joint.b2
        biased = dataclasses.replace(
            wq,
            joint=dataclasses.replace(
                wq.joint,
                b2=b2.at[params.BLANK].add(jnp.asarray(delta, b2.dtype)),
            ),
        )
        leg(f"bias{delta:g}", biased, 1)

    out.update({"metric": "decode_emit_scaling", "value": out["cap1_ms"],
                "unit": "ms", "N": N, "T2": T2, "reps": REPS})
    print(json.dumps(out))


if __name__ == "__main__":
    main()
