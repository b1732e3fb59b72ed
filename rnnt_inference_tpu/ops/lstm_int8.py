"""Int8 LSTM execution path: int8 x int8 -> int32 MXU matmuls with on-the-fly
dequant, replacing the reference's fused AMX kernel (mlperf_plugins
lstm_amx_int8; contract recovered in SURVEY §2.3).

Semantics per layer (reference: quant_lstm.py:92-101, 217-264):
  gates = dequant(x_i8 @ Wih_i8 + h_i8 @ Whh_i8) * rb_scale + (b_ih + b_hh)
  i,f,g,o activations in f32; cell state f32 (reference f16 — AMX-era);
  recurrent h re-quantized with the layer's OWN in_scale (x and h share it);
  output y quantized with out_scale (= next layer in_scale), except
  skip_quant_y on the last post layer which emits f32.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from rnnt_inference_tpu.models.quant import QuantLSTMLayerWeights, quantize


def quant_lstm_layer(
    layer: QuantLSTMLayerWeights,
    x_i8: jax.Array,
    h_i8: jax.Array,
    c: jax.Array,
    emit_f32: bool,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """One int8 LSTM layer over a chunk.

    x_i8: {T, N, IC} int8; h_i8: {N, H} int8; c: {N, H} f32.
    Returns (y {T,N,H} int8 or f32, h' int8, c' f32).
    """
    rb = layer.rb_scale
    b = layer.b
    # Hoisted int8 input projection for the whole chunk (one MXU int8 matmul).
    xw = jax.lax.dot_general(
        x_i8,
        layer.w_ih,
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )

    def step(carry, xw_t):
        h_i8, c = carry
        hw = jax.lax.dot_general(
            h_i8,
            layer.w_hh,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        gates = (xw_t + hw).astype(jnp.float32) * rb + b
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i = jax.nn.sigmoid(i)
        f = jax.nn.sigmoid(f)
        g = jnp.tanh(g)
        o = jax.nn.sigmoid(o)
        c_new = f * c + i * g
        h = o * jnp.tanh(c_new)
        h_rec = quantize(h, layer.in_scale)  # shared x/h scale for recurrence
        y = h if emit_f32 else quantize(h, layer.out_scale)
        return (h_rec, c_new), y

    (h, c), ys = jax.lax.scan(step, (h_i8, c), xw)
    return ys, h, c


def _pallas_eligible(layer: QuantLSTMLayerWeights, x: jax.Array) -> bool:
    from rnnt_inference_tpu.ops import lstm as _lstm

    T, N, IC = x.shape
    H, H4 = layer.w_hh.shape
    # the fused-cat kernel keeps BOTH int8 weight matrices VMEM-resident
    weight_bytes = (IC + H) * H4
    return (
        _lstm._LSTM_IMPL == "pallas"
        and ((N <= 128 and N % 8 == 0) or N % 128 == 0)
        and H % 128 == 0
        and T >= 2
        and weight_bytes <= 13 * 2**20
    )


def quant_lstm_stack(
    layers: Sequence[QuantLSTMLayerWeights],
    x: jax.Array,
    hs_i8: jax.Array,
    cs: jax.Array,
    skip_quant_y: bool,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Multi-layer int8 LSTM (the reference's fused lstm_amx_int8 contract).

    x: int8 {T,N,C}, or f32 (quantized here with layer 0's in_scale — the
    pre_quantizer role, modeling_rnnt.py:72-77).  Uses the Pallas int8
    recurrence kernel (VMEM-resident int8 W_hh, fused requant) when shapes
    allow; falls back to the XLA scan otherwise.  Both paths implement the
    same rounding semantics, so results are identical.
    """
    if x.dtype != jnp.int8:
        x = quantize(x, layers[0].in_scale)
    new_h, new_c = [], []
    y = x
    for l, layer in enumerate(layers):
        emit_f32 = skip_quant_y and l == len(layers) - 1
        if _pallas_eligible(layer, y):
            from rnnt_inference_tpu.ops.lstm_pallas import quant_lstm_layer_pallas

            y, h, c = quant_lstm_layer_pallas(
                layer, y, hs_i8[l], cs[l], emit_f32,
                interpret=jax.default_backend() == "cpu",
            )
        else:
            y, h, c = quant_lstm_layer(layer, y, hs_i8[l], cs[l], emit_f32)
        new_h.append(h)
        new_c.append(c)
    return y, jnp.stack(new_h), jnp.stack(new_c)
