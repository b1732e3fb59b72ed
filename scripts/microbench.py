"""Microbenchmarks for the hot kernels on the local chip.

Usage: python scripts/microbench.py lstm|decode|act [...]

Timing protocol for the relayed backend: dispatch K iterations chained
through a data dependency, then ONE small host readback to sync (CLAUDE.md:
block_until_ready does not block here; every readback is an RPC flush).
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


def sync(x):
    # read back ONE element (device-side slice first): np.asarray of a big
    # array would drag the whole buffer through the ~43 MB/s relay
    leaf = jax.tree.leaves(x)[0]
    np.asarray(leaf[(0,) * leaf.ndim])


def timeit(fn, arg, iters=20, warmup=2):
    """fn must be arg -> arg-like (chainable)."""
    out = arg
    for _ in range(warmup):
        out = fn(out)
    sync(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(out)
    sync(out)
    return (time.time() - t0) / iters


def bench_lstm(T=500, N=128, H=1024, impl="pallas", act="exact", dtype=jnp.bfloat16):
    from rnnt_inference_tpu.models.weights import _init_lstm_layer
    from rnnt_inference_tpu.ops.activations import set_gate_act
    from rnnt_inference_tpu.ops.lstm import lstm_layer, set_lstm_impl, lstm_stack

    set_gate_act(act)
    set_lstm_impl(impl)
    jax.clear_caches()
    layer = _init_lstm_layer(jax.random.PRNGKey(0), H, H, dtype)
    x = jax.random.normal(jax.random.PRNGKey(1), (T, N, H), dtype)
    h0 = jnp.zeros((1, N, H), dtype)
    c0 = jnp.zeros((1, N, H), jnp.float32)

    run = jax.jit(lambda x: lstm_stack([layer], x, h0, c0)[0])
    dt = timeit(run, x, iters=10)
    print(f"lstm T={T} N={N} H={H} impl={impl} act={act} dtype={x.dtype}: "
          f"{dt*1e3:.2f} ms ({dt/T*1e6:.2f} us/step)")
    return dt


def bench_act(N=128, H=4096, act="exact", iters=200):
    from rnnt_inference_tpu.ops import activations as A

    jax.clear_caches()
    x = jax.random.normal(jax.random.PRNGKey(0), (N, H), jnp.float32)
    if act == "exact":
        f = jax.jit(lambda v: jnp.tanh(jax.nn.sigmoid(v) + jnp.tanh(v)) * 0.999)
    else:
        f = jax.jit(lambda v: A.tanh_approx(A.sigmoid_approx(v) + A.tanh_approx(v)) * 0.999)
    dt = timeit(f, x, iters=iters)
    print(f"act chain {act} (N={N}, H={H}): {dt*1e6:.1f} us/iter")
    return dt


def bench_decode(T2=250, N=512, act="exact", dtype=jnp.bfloat16, impl="xla"):
    import dataclasses
    from rnnt_inference_tpu.config import RNNTParams
    from rnnt_inference_tpu.models.decoder import greedy_decode, set_decode_impl
    from rnnt_inference_tpu.models.weights import init_weights
    from rnnt_inference_tpu.ops.activations import set_gate_act

    set_gate_act(act)
    set_decode_impl(impl)
    jax.clear_caches()
    params = dataclasses.replace(RNNTParams(), max_res_len=512)
    w = init_weights(jax.random.PRNGKey(0), params, dtype=dtype)
    x = jax.random.normal(jax.random.PRNGKey(1), (T2 * 2, N, 240), jnp.float32)
    lens = jnp.full((N,), T2 * 2, jnp.int32)

    run = jax.jit(lambda x: greedy_decode(w, x, lens, params=params)[0])
    out = run(x); sync(out)
    t0 = time.time()
    iters = 3
    for _ in range(iters):
        out = run(x + out[0, 0].astype(jnp.float32) * 0)
    sync(out)
    dt = (time.time() - t0) / iters
    print(f"decode T={T2*2} N={N} act={act} impl={impl}: {dt*1e3:.1f} ms/batch")
    return dt


if __name__ == "__main__":
    what = sys.argv[1] if len(sys.argv) > 1 else "lstm"
    kw = dict(kv.split("=") for kv in sys.argv[2:])
    kw = {k: (v if k in ("impl", "act") else int(v)) for k, v in kw.items()}
    if what == "decode" and "impl" not in kw:
        kw["impl"] = os.environ.get("RNNT_DECODE_IMPL", "xla")
    print(f"backend={jax.default_backend()}", file=sys.stderr)
    if what == "lstm":
        bench_lstm(**kw)
    elif what == "act":
        bench_act(**kw)
    elif what == "decode":
        bench_decode(**kw)
    elif what == "sweep":
        for impl in ("pallas", "xla"):
            for act in ("exact", "approx"):
                bench_lstm(impl=impl, act=act)
