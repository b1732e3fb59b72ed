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


def test_quant_pallas_matches_xla_int8():
    """int8 Pallas recurrence kernel == XLA int8 scan, bit-exact (same
    rounding semantics; interpret mode on CPU)."""
    import jax.numpy as jnp
    from rnnt_inference_tpu.config import RNNTParams
    from rnnt_inference_tpu.models.quant import calibrate, quantize_weights
    from rnnt_inference_tpu.models.weights import init_weights
    from rnnt_inference_tpu.ops.lstm_int8 import quant_lstm_layer, quantize
    from rnnt_inference_tpu.ops.lstm_pallas import quant_lstm_layer_pallas

    params = RNNTParams(
        trans_input_size=240,
        trans_hidden_size=128,
        pred_hidden_size=32,
        joint_hidden_size=32,
        max_res_len=64,
    )
    w = init_weights(jax.random.PRNGKey(0), params)
    T, N = 6, 8
    x = jax.random.normal(jax.random.PRNGKey(1), (T, N, params.trans_input_size))
    lens = jnp.full((N,), T, jnp.int32)
    calib = calibrate(w, [(x, lens)], params)
    qw = quantize_weights(w, calib, params, compute_dtype=jnp.float32)

    for li, emit_f32 in ((0, False), (1, True)):
        layer = qw.pre_rnn[li]
        x_i8 = quantize(x[:, :, : layer.w_ih.shape[0]], layer.in_scale)
        h0 = jnp.zeros((N, 128), jnp.int8)
        c0 = jnp.zeros((N, 128), jnp.float32)
        y_ref, h_ref, c_ref = jax.jit(
            quant_lstm_layer, static_argnames="emit_f32"
        )(layer, x_i8, h0, c0, emit_f32)
        y_pal, h_pal, c_pal = quant_lstm_layer_pallas(
            layer, x_i8, h0, c0, emit_f32, interpret=True
        )
        np.testing.assert_array_equal(np.asarray(h_pal), np.asarray(h_ref))
        if emit_f32:
            np.testing.assert_allclose(
                np.asarray(y_pal), np.asarray(y_ref), rtol=1e-6, atol=1e-6
            )
        else:
            np.testing.assert_array_equal(np.asarray(y_pal), np.asarray(y_ref))
        np.testing.assert_allclose(
            np.asarray(c_pal), np.asarray(c_ref), rtol=1e-6, atol=1e-6
        )


def test_quant_pallas_non_divisible_batch_tile():
    """N=384 passes eligibility (N % 128 == 0) but is not a multiple of the
    default 256 tile — the kernel must fall back to a smaller divisor tile
    instead of asserting (regression for the BN=256 default)."""
    import jax.numpy as jnp
    from rnnt_inference_tpu.config import RNNTParams
    from rnnt_inference_tpu.models.quant import calibrate, quantize_weights
    from rnnt_inference_tpu.models.weights import init_weights
    from rnnt_inference_tpu.ops.lstm_int8 import quant_lstm_layer, quantize
    from rnnt_inference_tpu.ops.lstm_pallas import quant_lstm_layer_pallas

    params = RNNTParams(
        trans_input_size=240,
        trans_hidden_size=128,
        pred_hidden_size=32,
        joint_hidden_size=32,
        max_res_len=64,
    )
    w = init_weights(jax.random.PRNGKey(2), params)
    T, N = 3, 384
    x = jax.random.normal(jax.random.PRNGKey(3), (T, N, params.trans_input_size))
    lens = jnp.full((N,), T, jnp.int32)
    calib = calibrate(w, [(x, lens)], params)
    qw = quantize_weights(w, calib, params, compute_dtype=jnp.float32)
    layer = qw.pre_rnn[0]
    x_i8 = quantize(x, layer.in_scale)
    h0 = jnp.zeros((N, 128), jnp.int8)
    c0 = jnp.zeros((N, 128), jnp.float32)
    y_ref, h_ref, _ = jax.jit(quant_lstm_layer, static_argnames="emit_f32")(
        layer, x_i8, h0, c0, False
    )
    y_pal, h_pal, _ = quant_lstm_layer_pallas(
        layer, x_i8, h0, c0, False, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(y_pal), np.asarray(y_ref))
    np.testing.assert_array_equal(np.asarray(h_pal), np.asarray(h_ref))


def test_quant_stack_pallas_dispatch_matches():
    """quant_lstm_stack with pallas enabled == with xla, end to end."""
    import jax.numpy as jnp
    from rnnt_inference_tpu.config import RNNTParams
    from rnnt_inference_tpu.models.quant import calibrate, quantize_weights
    from rnnt_inference_tpu.models.weights import init_weights
    from rnnt_inference_tpu.ops.lstm import set_lstm_impl
    from rnnt_inference_tpu.ops.lstm_int8 import quant_lstm_stack

    params = RNNTParams(
        trans_input_size=240,
        trans_hidden_size=128,
        pred_hidden_size=32,
        joint_hidden_size=32,
        max_res_len=64,
    )
    w = init_weights(jax.random.PRNGKey(3), params)
    T, N = 5, 8
    x = jax.random.normal(jax.random.PRNGKey(4), (T, N, params.trans_input_size))
    lens = jnp.full((N,), T, jnp.int32)
    calib = calibrate(w, [(x, lens)], params)
    qw = quantize_weights(w, calib, params, compute_dtype=jnp.float32)
    hs = jnp.zeros((2, N, 128), jnp.int8)
    cs = jnp.zeros((2, N, 128), jnp.float32)

    try:
        set_lstm_impl("xla")
        y_x, h_x, c_x = quant_lstm_stack(qw.pre_rnn, x, hs, cs, True)
        set_lstm_impl("pallas")
        y_p, h_p, c_p = quant_lstm_stack(qw.pre_rnn, x, hs, cs, True)
    finally:
        set_lstm_impl("xla")
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_x), rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(h_p), np.asarray(h_x))
