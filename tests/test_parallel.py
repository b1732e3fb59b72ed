"""Multi-device sharding on the virtual 8-CPU mesh: data-parallel decode
equals single-device decode; tensor-parallel runs and produces valid output."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from rnnt_inference_tpu.config import RNNTParams
from rnnt_inference_tpu.models.decoder import greedy_decode
from rnnt_inference_tpu.models.weights import init_weights
from rnnt_inference_tpu.parallel.mesh import (
    batch_sharding,
    lens_sharding,
    make_mesh,
    weight_shardings,
)

SMALL = RNNTParams(
    trans_input_size=24,
    trans_hidden_size=128,
    pred_hidden_size=64,
    joint_hidden_size=64,
    max_res_len=64,
)

needs_8 = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")


@needs_8
def test_dp_decode_matches_single_device():
    w = init_weights(jax.random.PRNGKey(0), SMALL)
    T, N = 12, 16
    x = jax.random.normal(jax.random.PRNGKey(1), (T, N, SMALL.trans_input_size))
    lens = jnp.asarray(np.random.RandomState(0).randint(1, T + 1, N), jnp.int32)

    res_ref, lens_ref = greedy_decode(w, x, lens, params=SMALL)

    mesh = make_mesh(8, model_parallel=1)
    w_sh = jax.device_put(w, weight_shardings(mesh, w, tensor_parallel=False))
    x_sh = jax.device_put(x, batch_sharding(mesh))
    l_sh = jax.device_put(lens, lens_sharding(mesh))
    step = jax.jit(
        lambda w, x, l: greedy_decode(w, x, l, params=SMALL),
        out_shardings=(
            NamedSharding(mesh, P("data", None)),
            NamedSharding(mesh, P("data")),
        ),
    )
    with mesh:
        res_dp, lens_dp = step(w_sh, x_sh, l_sh)
    np.testing.assert_array_equal(np.asarray(lens_dp), np.asarray(lens_ref))
    np.testing.assert_array_equal(np.asarray(res_dp), np.asarray(res_ref))


@needs_8
def test_dp_decode_quant_weights_matches_single_device():
    """Quantized weights through the dp mesh: weight_shardings must handle
    the QuantRNNTWeights pytree (replicated leaves) and the int8 decode must
    be bit-identical to its single-device run."""
    from rnnt_inference_tpu.models.quant import calibrate, quantize_weights

    w32 = init_weights(jax.random.PRNGKey(4), SMALL, dtype=jnp.float32)
    T, N = 12, 16
    x = jax.random.normal(
        jax.random.PRNGKey(5), (T, N, SMALL.trans_input_size), jnp.float32
    )
    lens = jnp.asarray(np.random.RandomState(1).randint(1, T + 1, N), jnp.int32)
    calib = calibrate(w32, [(x, lens)], SMALL)
    wq = quantize_weights(w32, calib, SMALL)

    res_ref, lens_ref = greedy_decode(wq, x, lens, params=SMALL)

    mesh = make_mesh(8, model_parallel=1)
    w_sh = jax.device_put(wq, weight_shardings(mesh, wq, tensor_parallel=False))
    x_sh = jax.device_put(x, batch_sharding(mesh))
    l_sh = jax.device_put(lens, lens_sharding(mesh))
    step = jax.jit(
        lambda w, x, l: greedy_decode(w, x, l, params=SMALL),
        out_shardings=(
            NamedSharding(mesh, P("data", None)),
            NamedSharding(mesh, P("data")),
        ),
    )
    with mesh:
        res_dp, lens_dp = step(w_sh, x_sh, l_sh)
    np.testing.assert_array_equal(np.asarray(lens_dp), np.asarray(lens_ref))
    np.testing.assert_array_equal(np.asarray(res_dp), np.asarray(res_ref))


@needs_8
def test_tp_decode_runs_and_is_close():
    """dp=4 x tp=2: Megatron-sharded gates; argmax stream may differ at f32
    reduction-order ties, so compare emitted lengths loosely and shapes
    strictly."""
    w = init_weights(jax.random.PRNGKey(2), SMALL)
    T, N = 10, 8
    x = jax.random.normal(jax.random.PRNGKey(3), (T, N, SMALL.trans_input_size))
    lens = jnp.full((N,), T, jnp.int32)

    res_ref, lens_ref = greedy_decode(w, x, lens, params=SMALL)

    mesh = make_mesh(8, model_parallel=2)
    w_sh = jax.device_put(w, weight_shardings(mesh, w, tensor_parallel=True))
    x_sh = jax.device_put(x, batch_sharding(mesh))
    l_sh = jax.device_put(lens, lens_sharding(mesh))
    step = jax.jit(
        lambda w, x, l: greedy_decode(w, x, l, params=SMALL),
        out_shardings=(
            NamedSharding(mesh, P("data", None)),
            NamedSharding(mesh, P("data")),
        ),
    )
    with mesh:
        res_tp, lens_tp = step(w_sh, x_sh, l_sh)
    assert res_tp.shape == res_ref.shape
    # token streams should be identical or near-identical
    same = np.mean(np.asarray(res_tp) == np.asarray(res_ref))
    assert same > 0.9, f"tp decode diverged: {same:.2%} positions equal"


@needs_8
def test_tp_decode_quant_weights_runs_and_is_close():
    """dp=4 x tp=2 with the int8 encoder: QuantRNNTWeights gate dims shard
    column-parallel (scales replicated, GSPMD inserts the per-step h
    all-gather).  int8 gate GEMM reductions are exact integers, so encoder
    divergence can only enter through the bf16 pred/joint — same loose
    token-agreement bound as the bf16 TP test."""
    from rnnt_inference_tpu.models.quant import calibrate, quantize_weights

    w32 = init_weights(jax.random.PRNGKey(6), SMALL, dtype=jnp.float32)
    T, N = 12, 8
    x = jax.random.normal(
        jax.random.PRNGKey(7), (T, N, SMALL.trans_input_size), jnp.float32
    )
    lens = jnp.full((N,), T, jnp.int32)
    wq = quantize_weights(w32, calibrate(w32, [(x, lens)], SMALL), SMALL)

    res_ref, lens_ref = greedy_decode(wq, x, lens, params=SMALL)

    mesh = make_mesh(8, model_parallel=2)
    w_sh = jax.device_put(wq, weight_shardings(mesh, wq, tensor_parallel=True))
    x_sh = jax.device_put(x, batch_sharding(mesh))
    l_sh = jax.device_put(lens, lens_sharding(mesh))
    step = jax.jit(
        lambda w, x, l: greedy_decode(w, x, l, params=SMALL),
        out_shardings=(
            NamedSharding(mesh, P("data", None)),
            NamedSharding(mesh, P("data")),
        ),
    )
    with mesh:
        res_tp, lens_tp = step(w_sh, x_sh, l_sh)
    assert res_tp.shape == res_ref.shape
    same = np.mean(np.asarray(res_tp) == np.asarray(res_ref))
    assert same > 0.9, f"quant tp decode diverged: {same:.2%} positions equal"
