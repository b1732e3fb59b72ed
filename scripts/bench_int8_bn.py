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

    if os.environ.get("RNNT_INT8_PIPE", "0") == "1":
        # on-device equality gate: the pipelined kernel must match the plain
        # kernel bit-for-bit on real hardware, not just in interpret mode
        # (output-window rotation across non-contiguous revisits is the risk).
        # The two recurrence entry points are called DIRECTLY — threading the
        # choice as code, not by mutating the env between traces, so the gate
        # cannot degenerate into comparing one kernel against itself
        # (ADVICE r3).
        from rnnt_inference_tpu.ops.lstm_pallas import (
            _quant_lstm_recurrence,
            _quant_lstm_recurrence_pipelined,
        )

        Tc, Nc = 16, 512
        layer = wq.pre_rnn[0]
        rngk = jax.random.PRNGKey(3)
        x_i8 = jax.random.randint(
            rngk, (Tc, Nc, layer.w_ih.shape[0]), -128, 128, dtype=jnp.int32
        ).astype(jnp.int8)
        h_i8 = jnp.zeros((Nc, layer.w_hh.shape[0]), jnp.int8)
        c0 = jnp.zeros((Nc, layer.w_hh.shape[0]), jnp.float32)
        scalars = jnp.zeros((layer.w_hh.shape[1],), jnp.float32)
        scalars = scalars.at[0].set(layer.rb_scale)
        scalars = scalars.at[1].set(layer.in_scale)
        scalars = scalars.at[2].set(layer.out_scale)
        scales = jnp.stack([scalars, layer.b.astype(jnp.float32)])
        args = (x_i8, layer.w_ih, layer.w_hh, h_i8, c0, scales)
        y_pipe = np.asarray(jax.jit(
            lambda *a: _quant_lstm_recurrence_pipelined(*a, emit_f32=False)[0]
        )(*args))
        y_plain = np.asarray(jax.jit(
            lambda *a: _quant_lstm_recurrence(*a, emit_f32=False)[0]
        )(*args))
        if np.array_equal(y_pipe, y_plain):
            print("pipe-vs-plain on-device equality: OK")
        else:
            n_bad = int((y_pipe != y_plain).sum())
            print(f"pipe-vs-plain on-device equality: FAIL ({n_bad} mismatches)")
            return

    run = jax.jit(lambda x: model.transcription(wq, x, lens, state, params)[0])
    out = run(x)
    np.asarray(out[0, 0, 0])
    iters = 10
    t0 = time.time()
    for _ in range(iters):
        out = run(x + out[0, 0, 0].astype(x.dtype) * 0)
    np.asarray(out[0, 0, 0])
    dt = (time.time() - t0) / iters
    print(
        f"int8 encoder N={N} T={T} BN={os.environ.get('RNNT_INT8_BN', '256')} "
        f"halves={os.environ.get('RNNT_INT8_HALVES', '1')}: "
        f"{dt*1e3:.1f} ms/batch"
    )


if __name__ == "__main__":
    main()
