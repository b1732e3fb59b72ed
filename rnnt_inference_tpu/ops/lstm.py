"""LSTM compute path as XLA-friendly functional ops.

TPU-native structure (not a port of the reference's AMX kernels,
reference: models/quant_lstm.py, mlperf_plugins lstm_amx_*):

  - The input projection ``x @ W_ih`` for a whole (T, N) chunk is hoisted out
    of the recurrence into ONE large matmul of shape (T*N, IC) @ (IC, 4H) —
    fully parallel, maps straight onto the MXU.
  - Only the sequential part ``h @ W_hh`` + gate math runs inside a
    ``lax.scan`` over time.  XLA keeps h/c in registers/VMEM between steps.
  - Matmuls run in the weights' dtype (bf16 on the hot path) with f32
    accumulation (preferred_element_type); cell state is always f32 — the
    reference's f16 cell (models/decoder.py:41) is an AMX-era compromise that
    TPU has no reason to copy.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from rnnt_inference_tpu.models.weights import LSTMLayerWeights


def lstm_cell(
    xw: jax.Array, h: jax.Array, c: jax.Array, w_hh: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """One LSTM step given the precomputed input projection ``xw = x@W_ih + b``.

    Gate order (i, f, g, o) matches torch so checkpoints import unchanged.
    Returns (h', c') with c' in f32.
    """
    from rnnt_inference_tpu.ops.activations import gate_fns

    sigmoid, tanh = gate_fns()
    gates = xw + jnp.dot(h, w_hh, preferred_element_type=jnp.float32)
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    i = sigmoid(i)
    f = sigmoid(f)
    g = tanh(g)
    o = sigmoid(o)
    c_new = f * c.astype(jnp.float32) + i * g
    h_new = o * tanh(c_new)
    return h_new, c_new


def lstm_layer(
    layer: LSTMLayerWeights,
    x: jax.Array,
    h0: jax.Array,
    c0: jax.Array,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Run one LSTM layer over a (T, N, IC) chunk.

    Returns (y {T,N,H} in x.dtype, h {N,H}, c {N,H} f32).
    """
    compute_dtype = layer.w_ih.dtype
    x = x.astype(compute_dtype)
    # Hoisted input projection: one big MXU matmul for the whole chunk,
    # staged at xw_dtype (see the module flag above).
    xw = (
        jnp.dot(x, layer.w_ih, preferred_element_type=jnp.float32)
        + layer.b.astype(jnp.float32)
    ).astype(xw_dtype(compute_dtype))

    h0 = h0.astype(compute_dtype)
    c0 = c0.astype(jnp.float32)

    def step(carry, xw_t):
        h, c = carry
        h_new, c_new = lstm_cell(xw_t, h, c, layer.w_hh)
        h_out = h_new.astype(compute_dtype)
        return (h_out, c_new), h_out

    (h, c), ys = jax.lax.scan(step, (h0, c0), xw)
    return ys, h, c


# Which recurrence implementation lstm_stack uses: "xla" (lax.scan) or
# "pallas" (VMEM-resident W_hh kernel, ops/lstm_pallas.py).  Read at trace
# time — set before building jitted functions (env: RNNT_LSTM_IMPL).
import os as _os

_LSTM_IMPL = _os.environ.get("RNNT_LSTM_IMPL", "xla")

# The hoisted input projection xw = x@W_ih + b is accumulated in f32 and
# then STORED in the compute dtype: at batch 1024 the (T, N, 4H) xw stream
# is the encoder's dominant HBM traffic (~175 GB f32 per 15 s batch across
# the 5 layers — the measured encoder is bandwidth-bound, not VPU-bound,
# at large N), so storing bf16 halves it.  The one extra rounding on the
# xw term is far inside the reference's own int8 numerics; both the scan
# and the Pallas kernel apply the same rule so the two impls stay
# numerically identical.  RNNT_XW_F32=1 restores f32 staging for triage.
_XW_F32 = _os.environ.get("RNNT_XW_F32", "0") == "1"


def set_xw_f32(enabled: bool) -> None:
    """Force f32 xw staging (numerics triage; trace-time switch)."""
    global _XW_F32
    _XW_F32 = bool(enabled)


def xw_dtype(compute_dtype):
    return jnp.float32 if _XW_F32 else compute_dtype


def set_lstm_impl(impl: str) -> None:
    global _LSTM_IMPL
    assert impl in ("xla", "pallas")
    _LSTM_IMPL = impl


def _pallas_eligible(layer: LSTMLayerWeights, x: jax.Array) -> bool:
    T, N, _ = x.shape
    H = layer.hidden_size
    return (
        _LSTM_IMPL == "pallas"
        and layer.w_ih.dtype != jnp.int8
        # kernel tiles N>128 into 128-row tiles (lstm_pallas._lstm_recurrence)
        and ((N <= 128 and N % 8 == 0) or N % 128 == 0)
        and H % 128 == 0
        and T >= 2
    )


def lstm_stack(
    layers: Sequence[LSTMLayerWeights],
    x: jax.Array,
    hs: jax.Array,
    cs: jax.Array,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Multi-layer LSTM over a chunk.  hs/cs are stacked (L, N, H).

    Mirrors the fused multi-layer op contract of the reference
    (models/quant_lstm.py:92-101) but as composable functional layers.
    """
    new_h = []
    new_c = []
    y = x
    for l, layer in enumerate(layers):
        if _pallas_eligible(layer, y):
            from rnnt_inference_tpu.ops.lstm_pallas import lstm_layer_pallas

            y, h, c = lstm_layer_pallas(
                layer, y, hs[l], cs[l], interpret=jax.default_backend() == "cpu"
            )
        else:
            y, h, c = lstm_layer(layer, y, hs[l], cs[l])
        new_h.append(h)
        new_c.append(c)
    return y, jnp.stack(new_h), jnp.stack(new_c)


def fake_quant_lstm_layer(
    layer: LSTMLayerWeights,
    in_scale: jax.Array,
    x: jax.Array,
    h0: jax.Array,
    c0: jax.Array,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """One fake_quant LSTM layer: f32 cell math with per-step int8 rounding
    of the activations (reference: models/quant_lstm.py:162-183).

    The reference quantize-dequantizes cat(x_t, h_{t-1}) with ONE calibrated
    per-tensor scale.  Because the fake-quant op is elementwise and the scale
    is shared, fq(cat(x, h)) == cat(fq(x), fq(h)) — so x is fake-quantized
    once for the whole chunk (hoisted, like the input projection) and only
    the h half runs per step inside the scan.  The carried h stays raw f32
    (the reference re-assigns hx from the raw cell output each step); the
    layer output sequence is the raw h outputs (no output quantizer runs in
    fake_quant mode).
    """

    def fq(v):
        return jnp.clip(jnp.round(v * in_scale), -128.0, 127.0) / in_scale

    x = fq(x.astype(jnp.float32))
    xw = (
        jnp.dot(x, layer.w_ih, preferred_element_type=jnp.float32)
        + layer.b.astype(jnp.float32)
    )

    def step(carry, xw_t):
        h, c = carry
        h_new, c_new = lstm_cell(xw_t, fq(h), c, layer.w_hh)
        return (h_new, c_new), h_new

    (h, c), ys = jax.lax.scan(step, (h0.astype(jnp.float32), c0.astype(jnp.float32)), xw)
    return ys, h, c


def fake_quant_lstm_stack(
    layers: Sequence[LSTMLayerWeights],
    in_scales: jax.Array,
    x: jax.Array,
    hs: jax.Array,
    cs: jax.Array,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Multi-layer fake_quant LSTM (fake-quant analog of quant_lstm_stack)."""
    new_h, new_c = [], []
    y = x
    for l, layer in enumerate(layers):
        y, h, c = fake_quant_lstm_layer(layer, in_scales[l], y, hs[l], cs[l])
        new_h.append(h)
        new_c.append(c)
    return y, jnp.stack(new_h), jnp.stack(new_c)


def lstm_single_step(
    layers: Sequence[LSTMLayerWeights],
    x: jax.Array,
    hs: jax.Array,
    cs: jax.Array,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """One timestep through a multi-layer LSTM (the prediction-net hot path,
    U=1 in the greedy decode loop; reference models/modeling_rnnt.py:183-205).

    x: (N, IC).  Returns (y {N,H}, hs', cs').
    """
    new_h = []
    new_c = []
    y = x
    for l, layer in enumerate(layers):
        compute_dtype = layer.w_ih.dtype
        xw = (
            jnp.dot(y.astype(compute_dtype), layer.w_ih, preferred_element_type=jnp.float32)
            + layer.b.astype(jnp.float32)
        )
        h_new, c_new = lstm_cell(xw, hs[l].astype(compute_dtype), cs[l], layer.w_hh)
        y = h_new.astype(compute_dtype)
        new_h.append(y)
        new_c.append(c_new)
    return y, jnp.stack(new_h), jnp.stack(new_c)


def stack_time(x: jax.Array, x_lens: jax.Array, factor: int = 2) -> jax.Array:
    """Time-downsample {T,N,C} -> {ceil(T/factor),N,C*factor}, zeroing frames
    beyond each utterance's length first (reference: models/modeling_rnnt.py:314-324).
    """
    T, N, C = x.shape
    t_idx = jnp.arange(T, dtype=x_lens.dtype)[:, None]
    x = jnp.where((t_idx < x_lens[None, :])[:, :, None], x, 0)
    pad = (-T) % factor
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, N, C), x.dtype)], axis=0)
    Tp = x.shape[0] // factor
    # {T,N,C} -> {N,T,C} -> {N,Tp,factor*C} -> {Tp,N,factor*C}
    x = x.transpose(1, 0, 2).reshape(N, Tp, factor * C).transpose(1, 0, 2)
    return x
