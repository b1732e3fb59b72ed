"""Int8 quantization stack: calibration, scale propagation, and exact
equivalence of the int8 execution path with a fake-quant numpy oracle."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rnnt_inference_tpu.config import RNNTParams
from rnnt_inference_tpu.models import rnnt as model
from rnnt_inference_tpu.models.decoder import greedy_decode
from rnnt_inference_tpu.models.quant import (
    CalibState,
    calibrate,
    init_calib_state,
    quantize,
    quantize_weights,
)
from rnnt_inference_tpu.models.weights import init_weights
from rnnt_inference_tpu.ops.lstm import lstm_layer
from rnnt_inference_tpu.ops.lstm_int8 import quant_lstm_layer, quant_lstm_stack

SMALL = RNNTParams(
    trans_input_size=24,
    trans_hidden_size=32,
    pred_hidden_size=16,
    joint_hidden_size=20,
    max_res_len=128,
)


def _np(x):
    return np.asarray(x)


def np_fake_quant(x, scale):
    """Symmetric int8 fake-quant: round, clamp, dequant."""
    return np.clip(np.round(x * scale), -128, 127) / scale


def np_quant_lstm_layer(ql, x_f32, h0_f32, c0, emit_f32):
    """Numpy oracle of one int8 layer computed in the FLOAT domain via
    fake-quant (mathematically identical to int8 GEMM + rb_scale dequant)."""
    in_s = float(ql.in_scale)
    w_s = float(ql.w_scale)
    out_s = float(ql.out_scale)
    w_ih = _np(ql.w_ih).astype(np.float32) / w_s  # dequantized weights
    w_hh = _np(ql.w_hh).astype(np.float32) / w_s
    b = _np(ql.b)
    T = x_f32.shape[0]
    h = np_fake_quant(h0_f32, in_s)
    c = c0.copy()
    ys = []
    for t in range(T):
        xt = np_fake_quant(x_f32[t], in_s)
        gates = xt @ w_ih + h @ w_hh + b
        i, f, g, o = np.split(gates, 4, axis=-1)
        sig = lambda v: 1 / (1 + np.exp(-v))
        c = sig(f) * c + sig(i) * np.tanh(g)
        h_f = sig(o) * np.tanh(c)
        h = np_fake_quant(h_f, in_s)
        ys.append(h_f if emit_f32 else np_fake_quant(h_f, out_s))
    return np.stack(ys), h, c


def test_quantize_op():
    x = jnp.asarray([0.5, -0.5, 1.0, -1.0, 2.0, -1.5])
    scale = jnp.float32(127.0)
    q = quantize(x, scale)
    assert q.dtype == jnp.int8
    # -1.0 -> -127; values below -128/127 clamp to -128 (narrow_bound=False)
    np.testing.assert_array_equal(_np(q), [64, -64, 127, -127, 127, -128])


@pytest.mark.parametrize("emit_f32", [False, True])
def test_quant_layer_matches_numpy_oracle(emit_f32):
    key = jax.random.PRNGKey(0)
    from rnnt_inference_tpu.models.weights import _init_lstm_layer
    from rnnt_inference_tpu.models.quant import quantize_lstm_layer

    T, N, IC, H = 6, 3, 8, 16
    layer = _init_lstm_layer(key, IC, H, jnp.float32)
    ql = quantize_lstm_layer(layer, jnp.float32(2.0), jnp.float32(127.0 / 1.5))

    x = jax.random.normal(jax.random.PRNGKey(1), (T, N, IC))
    x_i8 = quantize(x, ql.in_scale)
    h0 = jnp.zeros((N, H), jnp.int8)
    c0 = jnp.zeros((N, H), jnp.float32)
    y, h, c = jax.jit(quant_lstm_layer, static_argnames="emit_f32")(
        ql, x_i8, h0, c0, emit_f32
    )

    # oracle: dequantized int8 x (the layer sees the quantized x)
    x_deq = _np(x_i8).astype(np.float32) / float(ql.in_scale)
    y_ref, h_ref, c_ref = np_quant_lstm_layer(
        ql, x_deq, np.zeros((N, H), np.float32), np.zeros((N, H), np.float32), emit_f32
    )
    if emit_f32:
        np.testing.assert_allclose(_np(y), y_ref, rtol=1e-4, atol=1e-5)
    else:
        y_deq = _np(y).astype(np.float32) / float(ql.out_scale)
        np.testing.assert_allclose(y_deq, y_ref, rtol=1e-4, atol=1e-5)
    h_deq = _np(h).astype(np.float32) / float(ql.in_scale)
    np.testing.assert_allclose(h_deq, np_fake_quant(h_ref * float(ql.in_scale), 1.0) / float(ql.in_scale), atol=1e-6)
    np.testing.assert_allclose(_np(c), c_ref, rtol=1e-4, atol=1e-5)


def test_calibration_and_scale_propagation():
    params = SMALL
    w = init_weights(jax.random.PRNGKey(0), params)
    T, N = 10, 3
    x = jax.random.normal(jax.random.PRNGKey(1), (T, N, params.trans_input_size))
    x_lens = jnp.array([T, T - 2, 4], jnp.int32)

    calib = calibrate(w, [(x, x_lens)], params)
    assert calib.pre_amax.shape == (params.pre_num_layers,)
    assert np.all(_np(calib.pre_amax) > 0)
    assert np.all(_np(calib.post_amax) > 0)

    # pre layer 0 amax oracle: max(|x| over valid, |h sequence|)
    ys, _, _ = lstm_layer(w.pre_rnn[0], x, jnp.zeros((N, 32)), jnp.zeros((N, 32)))
    valid = np.arange(T)[:, None] < _np(x_lens)[None, :]
    x_amax = np.abs(_np(x) * valid[:, :, None]).max()
    h_seq = np.concatenate([np.zeros((1, N, 32)), _np(ys)[:-1]], 0)
    h_amax = np.abs(h_seq * valid[:, :, None]).max()
    np.testing.assert_allclose(_np(calib.pre_amax[0]), max(x_amax, h_amax), rtol=1e-6)

    qw = quantize_weights(w, calib, params)
    # propagation: out_scale[l] == in_scale[l+1]; across StackTime too
    np.testing.assert_allclose(
        _np(qw.pre_rnn[0].out_scale), _np(qw.pre_rnn[1].in_scale)
    )
    np.testing.assert_allclose(
        _np(qw.pre_rnn[1].out_scale), _np(qw.post_rnn[0].in_scale)
    )
    np.testing.assert_allclose(
        _np(qw.post_rnn[0].out_scale), _np(qw.post_rnn[1].in_scale)
    )
    assert float(qw.post_rnn[-1].out_scale) == 0.0  # skip_quant_y sentinel
    # int8 weights within range and scale reproduces amax
    assert qw.pre_rnn[0].w_ih.dtype == jnp.int8


def test_quant_greedy_decode_runs_and_tracks_f32():
    """Quant decode must run E2E and produce token streams close to f32
    (same inputs; calibrated scales).  With benign random weights the
    sequences should agree on most lanes."""
    params = SMALL
    w = init_weights(jax.random.PRNGKey(5), params)
    T, N = 12, 4
    x = jax.random.normal(jax.random.PRNGKey(6), (T, N, params.trans_input_size))
    x_lens = jnp.array([T, T, 8, 5], jnp.int32)

    calib = calibrate(w, [(x, x_lens)], params)
    qw = quantize_weights(w, calib, params, compute_dtype=jnp.float32)

    res_q, lens_q = greedy_decode(qw, x, x_lens, params=params)
    res_f, lens_f = greedy_decode(w, x, x_lens, params=params)
    assert res_q.shape == res_f.shape
    assert np.all(_np(lens_q) >= 0)
    # token agreement rate over emitted positions of the f32 stream
    agree = 0
    total = 0
    for b in range(N):
        L = min(int(lens_q[b]), int(lens_f[b]))
        total += max(int(lens_f[b]), 1)
        agree += int((_np(res_q)[b, :L] == _np(res_f)[b, :L]).sum())
    assert agree / total > 0.5, f"quant/f32 agreement too low: {agree}/{total}"


def test_fake_quant_stack_matches_per_step_oracle():
    """fake_quant run mode vs an eager per-step oracle of the reference's
    QuantLSTMLayer.forward (models/quant_lstm.py:162-183): each step
    fake-quants cat(x_t, h_{t-1}) with the CALIBRATED shared scale, cell
    math in f32 with fake-quantized weights, raw h carried and emitted."""
    from rnnt_inference_tpu.models.quant import fake_quantize_weights
    from rnnt_inference_tpu.ops.lstm import fake_quant_lstm_stack

    params = SMALL
    w = init_weights(jax.random.PRNGKey(9), params)
    T, N = 7, 3
    x = jax.random.normal(jax.random.PRNGKey(10), (T, N, params.trans_input_size))
    x_lens = jnp.full((N,), T, jnp.int32)
    calib = calibrate(w, [(x, x_lens)], params)
    fqw = fake_quantize_weights(w, calib, params)

    H = params.trans_hidden_size
    hs = jnp.zeros((2, N, H), jnp.float32)
    cs = jnp.zeros((2, N, H), jnp.float32)
    y, h_out, c_out = jax.jit(fake_quant_lstm_stack)(
        fqw.pre_rnn, fqw.pre_in_scale, x, hs, cs
    )

    def oracle_layer(layer, in_s, x_np):
        w_ih, w_hh, b = _np(layer.w_ih), _np(layer.w_hh), _np(layer.b)
        h = np.zeros((N, H), np.float32)
        c = np.zeros((N, H), np.float32)
        ys = []
        for t in range(x_np.shape[0]):
            cat = np.concatenate([x_np[t], h], axis=1)
            cat = np_fake_quant(cat, in_s)
            xt, hq = cat[:, : x_np.shape[2]], cat[:, x_np.shape[2] :]
            gates = xt @ w_ih + hq @ w_hh + b
            i, f, g, o = np.split(gates, 4, axis=-1)
            sig = lambda v: 1 / (1 + np.exp(-v))
            c = sig(f) * c + sig(i) * np.tanh(g)
            h = sig(o) * np.tanh(c)
            ys.append(h)
        return np.stack(ys), h, c

    y0, _, _ = oracle_layer(fqw.pre_rnn[0], float(fqw.pre_in_scale[0]), _np(x))
    y1, h1, c1 = oracle_layer(fqw.pre_rnn[1], float(fqw.pre_in_scale[1]), y0)
    np.testing.assert_allclose(_np(y), y1, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(_np(h_out[1]), h1, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(_np(c_out[1]), c1, rtol=1e-4, atol=1e-5)


def test_fake_quant_greedy_decode_runs():
    """fake_quant weights drive the full decode path (transcription dispatch)."""
    from rnnt_inference_tpu.models.quant import fake_quantize_weights

    params = SMALL
    w = init_weights(jax.random.PRNGKey(11), params)
    T, N = 10, 2
    x = jax.random.normal(jax.random.PRNGKey(12), (T, N, params.trans_input_size))
    x_lens = jnp.array([T, 6], jnp.int32)
    calib = calibrate(w, [(x, x_lens)], params)
    fqw = fake_quantize_weights(w, calib, params)
    res, lens = greedy_decode(fqw, x, x_lens, params=params)
    res_f, _ = greedy_decode(w, x, x_lens, params=params)
    assert res.shape == res_f.shape and np.all(_np(lens) >= 0)


def test_quant_encoder_stack_matches_oracle():
    """Full 2-layer int8 stack vs chained numpy oracle."""
    params = SMALL
    w = init_weights(jax.random.PRNGKey(7), params)
    T, N = 5, 2
    x = jax.random.normal(jax.random.PRNGKey(8), (T, N, params.trans_input_size))
    x_lens = jnp.full((N,), T, jnp.int32)
    calib = calibrate(w, [(x, x_lens)], params)
    qw = quantize_weights(w, calib, params, compute_dtype=jnp.float32)

    H = params.trans_hidden_size
    hs = jnp.zeros((2, N, H), jnp.int8)
    cs = jnp.zeros((2, N, H), jnp.float32)
    y, _, _ = jax.jit(quant_lstm_stack, static_argnames="skip_quant_y")(
        qw.pre_rnn, x, hs, cs, False
    )

    x_i8 = quantize(x, qw.pre_rnn[0].in_scale)
    x_deq = _np(x_i8).astype(np.float32) / float(qw.pre_rnn[0].in_scale)
    y0, _, _ = np_quant_lstm_layer(
        qw.pre_rnn[0], x_deq, np.zeros((N, H), np.float32), np.zeros((N, H), np.float32), False
    )
    y1, _, _ = np_quant_lstm_layer(
        qw.pre_rnn[1], y0, np.zeros((N, H), np.float32), np.zeros((N, H), np.float32), False
    )
    y_deq = _np(y).astype(np.float32) / float(qw.pre_rnn[1].out_scale)
    np.testing.assert_allclose(y_deq, y1, rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# quant_linear (reference models/quant_linear.py iLinear — dormant there,
# component-complete here)
# ---------------------------------------------------------------------------


def np_ilinear_oracle(w, b, act_amax, x):
    """Reference iLinear math verbatim (quant_linear.py:52-65): int8 weight
    per-tensor, int8 input with calibrated scale, int32 accumulate, bias
    pre-scaled into the product domain, o_scale dequant."""
    w_scale = 127.0 / np.max(np.abs(w))
    in_scale = 127.0 / act_amax
    w_i8 = np.clip(np.round(w * w_scale), -128, 127).astype(np.int8)
    x_i8 = np.clip(np.round(x * in_scale), -128, 127).astype(np.int8)
    b_scale = in_scale * w_scale
    acc = x_i8.astype(np.int64) @ w_i8.astype(np.int64) + b * b_scale
    return acc / b_scale


def test_quant_linear_matches_ilinear_oracle():
    from rnnt_inference_tpu.models.quant import quant_linear_apply, quantize_linear

    rng = np.random.RandomState(0)
    w = rng.randn(24, 20).astype(np.float32)
    b = rng.randn(20).astype(np.float32)
    x = rng.randn(6, 24).astype(np.float32)
    amax = np.float32(np.abs(x).max() * 1.1)

    ql = quantize_linear(jnp.asarray(w), jnp.asarray(b), jnp.asarray(amax))
    y = jax.jit(quant_linear_apply)(ql, jnp.asarray(x))
    np.testing.assert_allclose(_np(y), np_ilinear_oracle(w, b, amax, x), rtol=1e-5, atol=1e-5)


def test_fake_quant_linear_matches_oracle():
    from rnnt_inference_tpu.models.quant import fake_quant_linear_apply

    rng = np.random.RandomState(1)
    w = rng.randn(16, 8).astype(np.float32)
    b = rng.randn(8).astype(np.float32)
    x = rng.randn(4, 16).astype(np.float32)
    amax = np.float32(2.5)
    y = jax.jit(fake_quant_linear_apply)(
        jnp.asarray(w), jnp.asarray(b), jnp.asarray(amax), jnp.asarray(x)
    )
    w_scale = 127.0 / np.abs(w).max()
    ref = np_fake_quant(x, 127.0 / amax) @ np_fake_quant(w, w_scale) + b
    np.testing.assert_allclose(_np(y), ref, rtol=1e-5, atol=1e-5)


def test_joint_quant_fc1_tracks_bf16_joint():
    """The dormant quantized-joint path must track the shipping bf16 joint
    closely (it is a quantization of the same weights, not a different op)."""
    from rnnt_inference_tpu.models.quant import joint_quant_fc1, quantize_joint_fc1_trans

    params = SMALL
    w = init_weights(jax.random.PRNGKey(3), params)
    rng = np.random.RandomState(2)
    f = jnp.asarray(rng.randn(4, params.trans_hidden_size).astype(np.float32))
    g = jnp.asarray(rng.randn(4, params.pred_hidden_size).astype(np.float32))

    ql = quantize_joint_fc1_trans(w, jnp.asarray(np.abs(_np(f)).max()))
    y_q = jax.jit(joint_quant_fc1)(w, ql, f, g)
    y_f = jax.jit(model.joint)(w, f, g)
    assert y_q.shape == y_f.shape
    err = np.abs(_np(y_q) - _np(y_f)).max()
    assert err < 0.15, f"quant joint drifted {err} from f32 joint"
