"""Pallas LSTM recurrence kernel vs the XLA scan path (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from rnnt_inference_tpu.models.weights import _init_lstm_layer
from rnnt_inference_tpu.ops import lstm as lstm_mod
from rnnt_inference_tpu.ops.lstm import lstm_layer, lstm_stack
from rnnt_inference_tpu.ops.lstm_pallas import lstm_layer_pallas


def test_pallas_matches_scan_f32():
    T, N, IC, H = 6, 8, 128, 128
    layer = _init_lstm_layer(jax.random.PRNGKey(0), IC, H, jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (T, N, IC))
    h0 = jax.random.normal(jax.random.PRNGKey(2), (N, H))
    c0 = jax.random.normal(jax.random.PRNGKey(3), (N, H))

    y_ref, h_ref, c_ref = jax.jit(lstm_layer)(layer, x, h0, c0)
    y_pl, h_pl, c_pl = lstm_layer_pallas(layer, x, h0, c0, interpret=True)

    np.testing.assert_allclose(np.asarray(y_pl), np.asarray(y_ref), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(h_pl), np.asarray(h_ref), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(c_pl), np.asarray(c_ref), rtol=2e-5, atol=2e-5)


def test_pallas_matches_scan_bf16():
    T, N, IC, H = 4, 8, 128, 128
    layer = _init_lstm_layer(jax.random.PRNGKey(4), IC, H, jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(5), (T, N, IC), jnp.bfloat16)
    h0 = jnp.zeros((N, H), jnp.bfloat16)
    c0 = jnp.zeros((N, H), jnp.float32)

    y_ref, _, _ = jax.jit(lstm_layer)(layer, x, h0, c0)
    y_pl, _, _ = lstm_layer_pallas(layer, x, h0, c0, interpret=True)
    np.testing.assert_allclose(
        np.asarray(y_pl).astype(np.float32),
        np.asarray(y_ref).astype(np.float32),
        rtol=0.05,
        atol=0.05,
    )


def test_stack_impl_switch():
    """set_lstm_impl('pallas') routes eligible layers through the kernel and
    produces the same outputs (interpret mode on CPU)."""
    T, N, H = 5, 8, 128
    layer = _init_lstm_layer(jax.random.PRNGKey(6), H, H, jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(7), (T, N, H))
    hs = jnp.zeros((1, N, H))
    cs = jnp.zeros((1, N, H))

    y_ref, _, _ = lstm_stack([layer], x, hs, cs)
    lstm_mod.set_lstm_impl("pallas")
    try:
        y_pl, _, _ = lstm_stack([layer], x, hs, cs)
    finally:
        lstm_mod.set_lstm_impl("xla")
    np.testing.assert_allclose(np.asarray(y_pl), np.asarray(y_ref), rtol=2e-5, atol=2e-5)


def test_interleaved_matches_scan():
    from rnnt_inference_tpu.ops.lstm_pallas import lstm_layer_pallas_interleaved

    T, N, IC, H = 7, 8, 128, 128
    layer = _init_lstm_layer(jax.random.PRNGKey(8), IC, H, jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(9), (T, N, IC))
    h0 = jax.random.normal(jax.random.PRNGKey(10), (N, H))
    c0 = jax.random.normal(jax.random.PRNGKey(11), (N, H))

    y_ref, h_ref, c_ref = jax.jit(lstm_layer)(layer, x, h0, c0)
    y_il, h_il, c_il = lstm_layer_pallas_interleaved(layer, x, h0, c0, interpret=True)
    np.testing.assert_allclose(np.asarray(y_il), np.asarray(y_ref), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(h_il), np.asarray(h_ref), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(c_il), np.asarray(c_ref), rtol=2e-5, atol=2e-5)


def test_pallas_batch_tiled():
    """N > 128 path: grid tiles the batch; results must match the scan."""
    T, N, H = 5, 384, 128
    layer = _init_lstm_layer(jax.random.PRNGKey(12), H, H, jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(13), (T, N, H))
    h0 = jax.random.normal(jax.random.PRNGKey(14), (N, H))
    c0 = jax.random.normal(jax.random.PRNGKey(15), (N, H))
    y_ref, h_ref, c_ref = jax.jit(lstm_layer)(layer, x, h0, c0)
    y_pl, h_pl, c_pl = lstm_layer_pallas(layer, x, h0, c0, interpret=True)
    np.testing.assert_allclose(np.asarray(y_pl), np.asarray(y_ref), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(h_pl), np.asarray(h_ref), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(c_pl), np.asarray(c_ref), rtol=2e-5, atol=2e-5)
