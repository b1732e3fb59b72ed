"""Int8 quantization stack: calibration, weight quantization, scale
propagation.

Reproduces the reference's quantization semantics exactly (SURVEY §3.4;
reference: models/quant_modules.py, models/quant_lstm.py):

  - symmetric per-tensor int8: scale = 127 / amax, round then clamp to
    [-128, 127] (quant_modules.py:104,119-121)
  - activation amax per LSTM layer is the running max of |cat(x_t, h_{t-1})|
    over calibration utterances — x and h share ONE scale (quant_lstm.py:167-171)
  - weight amax per layer over |cat(w_ih, w_hh)| (quant_lstm.py:194-196)
  - scale propagation: out_scale[l] = in_scale[l+1], INCLUDING across
    StackTime: pre_rnn.out_scale[-1] = post_rnn.in_scale[0]
    (modeling_rnnt.py:66-77)
  - post_rnn skips output quantization (skip_quant_y, modeling_rnnt.py:94-99)
  - cell state: the reference uses f16 (decoder.py:41) as an AMX-era memory
    trick; TPU has no native f16 — we keep f32 cells (strictly more accurate)

Prediction + joint stay bf16 (the reference's joint quant path is dormant,
modeling_rnnt.py:54-65).
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rnnt_inference_tpu.config import RNNTParams
from rnnt_inference_tpu.models.weights import LSTMLayerWeights, RNNTWeights
from rnnt_inference_tpu.ops.lstm import lstm_layer


def _pytree_dataclass(cls):
    cls = dataclasses.dataclass(cls)
    fields = [f.name for f in dataclasses.fields(cls)]
    return jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=[])


MAX_BOUND = 127.0
MIN_BOUND = -128.0


def quantize(x: jax.Array, scale: jax.Array) -> jax.Array:
    """round(x*scale) clamped to [-128, 127] -> int8
    (reference: quant_modules.py:118-121 round_and_clamp)."""
    return jnp.clip(jnp.round(x * scale), MIN_BOUND, MAX_BOUND).astype(jnp.int8)


@_pytree_dataclass
class QuantLSTMLayerWeights:
    """One int8 LSTM layer.

    w_ih: int8 (IC, 4H); w_hh: int8 (H, 4H); b: f32 (4H,) = b_ih + b_hh
    (kept in the FLOAT domain and added after dequant — mathematically
    equivalent to the reference's int-domain folded bias b*(s_in*s_w)
    followed by rb_scale dequant, quant_lstm.py:205-210).
    in_scale: x/h shared quant scale; w_scale: weight scale;
    out_scale: next layer's in_scale (0 means skip_quant_y -> emit f32).
    """

    w_ih: jax.Array
    w_hh: jax.Array
    b: jax.Array
    in_scale: jax.Array
    w_scale: jax.Array
    out_scale: jax.Array

    @property
    def rb_scale(self) -> jax.Array:
        return 1.0 / (self.in_scale * self.w_scale)


@_pytree_dataclass
class QuantRNNTWeights:
    """Full quantized model: int8 encoder, bf16 prediction + joint."""

    pre_rnn: List[QuantLSTMLayerWeights]
    post_rnn: List[QuantLSTMLayerWeights]
    embed: jax.Array
    pred_rnn: List[LSTMLayerWeights]
    joint: object  # JointWeights


# ---------------------------------------------------------------------------
# Calibration (reference: main.py --calibration path, SURVEY §3.4)
# ---------------------------------------------------------------------------


@_pytree_dataclass
class CalibState:
    """Running amax per encoder LSTM layer: pre (2) + post (3)."""

    pre_amax: jax.Array  # (PRE_L,)
    post_amax: jax.Array  # (POST_L,)


def init_calib_state(params: RNNTParams = RNNTParams()) -> CalibState:
    return CalibState(
        pre_amax=jnp.zeros((params.pre_num_layers,)),
        post_amax=jnp.zeros((params.post_num_layers,)),
    )


def _layer_amax(x: jax.Array, x_lens: jax.Array, h0: jax.Array, ys: jax.Array) -> jax.Array:
    """max |cat(x_t, h_{t-1})| over valid timesteps of a chunk.

    The h sequence seen by the quantizer is h_0 (carried-in) .. h_{T-1};
    h_T is seen by the NEXT chunk (reference: quant_lstm.py:162-171 quantizes
    cat(x[i], hx) before each step).  Padded timesteps (t >= x_lens) are
    excluded — the reference calibrates on single full-length utterances.
    """
    T = x.shape[0]
    t_idx = jnp.arange(T)[:, None]
    valid = (t_idx < x_lens[None, :])[:, :, None]
    x_amax = jnp.max(jnp.abs(jnp.where(valid, x, 0.0)))
    h_seq = jnp.concatenate([h0[None], ys[:-1]], axis=0)  # h_0 .. h_{T-1}
    h_amax = jnp.max(jnp.abs(jnp.where(valid, h_seq, 0.0)))
    return jnp.maximum(x_amax, h_amax)


def calibrate_batch(
    weights: RNNTWeights,
    x: jax.Array,
    x_lens: jax.Array,
    calib: CalibState,
    params: RNNTParams = RNNTParams(),
) -> CalibState:
    """One calibration step: f32 encoder forward recording activation amax.

    Runs whole utterances with zero initial state, like the reference's
    calibration loop over 500 train-clean-100 utterances (main.py:22-36).
    """
    from rnnt_inference_tpu.ops.lstm import stack_time

    N = x.shape[1]
    H = params.trans_hidden_size
    pre_amax = list(calib.pre_amax)
    post_amax = list(calib.post_amax)

    y = x
    for l, layer in enumerate(weights.pre_rnn):
        h0 = jnp.zeros((N, H))
        c0 = jnp.zeros((N, H))
        ys, _, _ = lstm_layer(layer, y, h0, c0)
        pre_amax[l] = jnp.maximum(calib.pre_amax[l], _layer_amax(y, x_lens, h0, ys))
        y = ys

    y = stack_time(y, x_lens, params.stack_time_factor)
    y_lens = -(-x_lens // params.stack_time_factor)
    for l, layer in enumerate(weights.post_rnn):
        h0 = jnp.zeros((N, H))
        c0 = jnp.zeros((N, H))
        ys, _, _ = lstm_layer(layer, y, h0, c0)
        post_amax[l] = jnp.maximum(calib.post_amax[l], _layer_amax(y, y_lens, h0, ys))
        y = ys

    return CalibState(pre_amax=jnp.stack(pre_amax), post_amax=jnp.stack(post_amax))


# ---------------------------------------------------------------------------
# Weight quantization + scale propagation
# ---------------------------------------------------------------------------


def quantize_lstm_layer(
    layer: LSTMLayerWeights,
    act_amax: jax.Array,
    out_scale: jax.Array,
) -> QuantLSTMLayerWeights:
    w_cat = jnp.concatenate([layer.w_ih, layer.w_hh], axis=0)
    w_amax = jnp.max(jnp.abs(w_cat))
    w_scale = MAX_BOUND / w_amax
    in_scale = MAX_BOUND / act_amax
    return QuantLSTMLayerWeights(
        w_ih=quantize(layer.w_ih, w_scale),
        w_hh=quantize(layer.w_hh, w_scale),
        b=layer.b.astype(jnp.float32),
        in_scale=in_scale.astype(jnp.float32),
        w_scale=w_scale.astype(jnp.float32),
        out_scale=out_scale.astype(jnp.float32),
    )


def quantize_weights(
    weights: RNNTWeights,
    calib: CalibState,
    params: RNNTParams = RNNTParams(),
    compute_dtype=jnp.bfloat16,
) -> QuantRNNTWeights:
    """Build the quantized model with propagated scales
    (reference: modeling_rnnt.py:66-77, quant_lstm.py:66-78)."""
    pre_in = [MAX_BOUND / a for a in calib.pre_amax]
    post_in = [MAX_BOUND / a for a in calib.post_amax]
    # out_scale[l] = in_scale[l+1]; pre[-1] ties across StackTime to post[0];
    # post[-1] emits f32 (skip_quant_y) -> sentinel 0.0
    pre_out = pre_in[1:] + [post_in[0]]
    post_out = post_in[1:] + [jnp.float32(0.0)]

    pre = [
        quantize_lstm_layer(l, calib.pre_amax[i], pre_out[i])
        for i, l in enumerate(weights.pre_rnn)
    ]
    post = [
        quantize_lstm_layer(l, calib.post_amax[i], post_out[i])
        for i, l in enumerate(weights.post_rnn)
    ]
    cast = lambda t: jax.tree.map(lambda a: a.astype(compute_dtype), t)
    return QuantRNNTWeights(
        pre_rnn=pre,
        post_rnn=post,
        embed=cast(weights.embed),
        pred_rnn=cast(weights.pred_rnn),
        joint=cast(weights.joint),
    )


def calibrate(
    weights: RNNTWeights,
    batches: Sequence[Tuple[jax.Array, jax.Array]],
    params: RNNTParams = RNNTParams(),
) -> CalibState:
    """Run the whole calibration set (list of (x {T,N,C}, x_lens {N}))."""
    step = jax.jit(
        lambda w, x, l, c: calibrate_batch(w, x, l, c, params),
        static_argnames=(),
    )
    calib = init_calib_state(params)
    for x, x_lens in batches:
        calib = step(weights, jnp.asarray(x), jnp.asarray(x_lens), calib)
    return calib


# ---------------------------------------------------------------------------
# Quantized linear (reference: models/quant_linear.py iLinear)
# ---------------------------------------------------------------------------
#
# The reference defines iLinear for the joint's first linear but ships it
# DORMANT — the only call sites are commented out (modeling_rnnt.py:54-65),
# so the production joint runs bf16.  We mirror that exactly: the component
# exists with the reference's semantics (per-tensor int8 weight, calibrated
# per-tensor input scale, bias folded into the int32 product domain,
# o_scale dequant — quant_linear.py:46-65) and a joint wiring helper, but
# nothing on the serving path uses it by default.


@_pytree_dataclass
class QuantLinearWeights:
    """int8 linear: y = (q(x) @ w_i8 + b*in_scale*w_scale) / (in_scale*w_scale).

    w_i8: int8 (IN, OUT) — x@W layout (the reference's F.linear weight is
    (OUT, IN); transposition is a layout choice, the math is identical).
    b: f32 (OUT,) kept in the FLOAT domain; the reference pre-scales bias
    into the int32 domain and divides back out with o_scale
    (quant_linear.py:58-61, 63-65) — algebraically the same.
    """

    w_i8: jax.Array
    b: jax.Array
    in_scale: jax.Array
    w_scale: jax.Array

    @property
    def o_scale(self) -> jax.Array:
        return 1.0 / (self.in_scale * self.w_scale)


def quantize_linear(
    w: jax.Array, b: jax.Array, act_amax: jax.Array
) -> QuantLinearWeights:
    """run_mode="quant" parameter build (quant_linear.py:52-61):
    w_scale = 127/max|W| per tensor, in_scale = 127/act_amax from calib."""
    w_scale = MAX_BOUND / jnp.max(jnp.abs(w))
    return QuantLinearWeights(
        w_i8=quantize(w, w_scale),
        b=b.astype(jnp.float32),
        in_scale=(MAX_BOUND / act_amax).astype(jnp.float32),
        w_scale=w_scale.astype(jnp.float32),
    )


def quant_linear_apply(ql: QuantLinearWeights, x: jax.Array) -> jax.Array:
    """iLinear.forward (quant_linear.py:63-65): quantize the activation with
    the calibrated scale, int8xint8 GEMM accumulated in int32 (MXU-native),
    dequantize with o_scale, add bias.  Returns f32."""
    x_i8 = quantize(x, ql.in_scale)
    acc = jax.lax.dot_general(
        x_i8,
        ql.w_i8,
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return acc.astype(jnp.float32) * ql.o_scale + ql.b


def fake_quant_linear_apply(
    w: jax.Array, b: jax.Array, act_amax: jax.Array, x: jax.Array
) -> jax.Array:
    """QuantLinear fake_quant forward (quant_linear.py:37-44): weight and
    activation quantize-dequantized in f32, then a plain f32 GEMM."""
    w_scale = MAX_BOUND / jnp.max(jnp.abs(w))
    in_scale = MAX_BOUND / act_amax
    fq = lambda v, s: jnp.clip(jnp.round(v * s), MIN_BOUND, MAX_BOUND) / s
    return jnp.dot(fq(x, in_scale), fq(w, w_scale)) + b


def quantize_joint_fc1_trans(weights, act_amax: jax.Array) -> QuantLinearWeights:
    """Build the reference's dormant joint.linear1_trans quantization
    (modeling_rnnt.py:54-65, commented out there; available here the same
    way).  act_amax calibrates over the encoder output f — the skip_quant_y
    f32 stream the joint consumes."""
    w = weights.joint
    return quantize_linear(
        w.w1_trans.astype(jnp.float32), jnp.zeros((w.w1_trans.shape[1],)), act_amax
    )


def joint_quant_fc1(weights, ql: QuantLinearWeights, f: jax.Array, g: jax.Array):
    """Joint with the trans-side fc1 running int8 (dormant reference path).
    The pred-side fc1, bias, relu and fc2 stay bf16/f32 as in `rnnt.joint`."""
    w = weights.joint
    y = (
        quant_linear_apply(ql, f)
        + jnp.dot(g.astype(w.w1_pred.dtype), w.w1_pred, preferred_element_type=jnp.float32)
        + w.b1.astype(jnp.float32)
    )
    y = jnp.maximum(y, 0.0).astype(w.w2.dtype)
    return (
        jnp.dot(y, w.w2, preferred_element_type=jnp.float32) + w.b2.astype(jnp.float32)
    )


@_pytree_dataclass
class FakeQuantRNNTWeights:
    """fake_quant run mode (reference: arguments.py run_mode "fake_quant").

    f32 execution with int8 *rounding* simulated everywhere the int8 path
    rounds: encoder weights are quantize-dequantized at build time
    (quant_modules.py:124-135), and at every recurrence step the activation
    pair cat(x_t, h_{t-1}) is quantize-dequantized with the layer's
    CALIBRATED shared scale (quant_lstm.py:162-183 — the input_quantizer
    runs in fake_quant mode with update_amax=False, so amax is the
    calibration buffer, not the live tensor).  Prediction + joint stay f32,
    as in the reference.  This is the quantization-error triage mode.
    """

    pre_rnn: List[LSTMLayerWeights]  # weights already fake-quantized
    post_rnn: List[LSTMLayerWeights]
    pre_in_scale: jax.Array  # (PRE_L,) 127/act_amax per layer
    post_in_scale: jax.Array  # (POST_L,)
    embed: jax.Array
    pred_rnn: List[LSTMLayerWeights]
    joint: object


def fake_quantize_weights(
    weights: RNNTWeights,
    calib: CalibState,
    params: RNNTParams = RNNTParams(),
) -> FakeQuantRNNTWeights:
    """Build the fake_quant model: fq'd encoder weights (amax over
    cat(w_ih, w_hh) per layer) + calibrated activation scales for the
    per-step cat(x,h) fake-quant in ops.lstm.fake_quant_lstm_stack."""

    def fq_layer(layer: LSTMLayerWeights) -> LSTMLayerWeights:
        w_cat = jnp.concatenate([layer.w_ih, layer.w_hh], axis=0)
        scale = MAX_BOUND / jnp.max(jnp.abs(w_cat))
        fq = lambda w: jnp.clip(jnp.round(w * scale), MIN_BOUND, MAX_BOUND) / scale
        return LSTMLayerWeights(w_ih=fq(layer.w_ih), w_hh=fq(layer.w_hh), b=layer.b)

    return FakeQuantRNNTWeights(
        pre_rnn=[fq_layer(l) for l in weights.pre_rnn],
        post_rnn=[fq_layer(l) for l in weights.post_rnn],
        pre_in_scale=MAX_BOUND / calib.pre_amax,
        post_in_scale=MAX_BOUND / calib.post_amax,
        embed=weights.embed,
        pred_rnn=weights.pred_rnn,
        joint=weights.joint,
    )
