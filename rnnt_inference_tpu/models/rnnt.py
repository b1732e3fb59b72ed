"""Functional RNN-T model: transcription (encoder), prediction, joint.

Pure functions over weight pytrees — the TPU-native replacement for the
reference's stateful torch modules (reference: models/modeling_rnnt.py).
All of these are designed to be called from inside jit / while_loop.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from rnnt_inference_tpu.config import RNNTParams
from rnnt_inference_tpu.models.weights import RNNTWeights
from rnnt_inference_tpu.ops.lstm import lstm_single_step, lstm_stack, stack_time


def _pytree_dataclass(cls):
    cls = dataclasses.dataclass(cls)
    fields = [f.name for f in dataclasses.fields(cls)]
    return jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=[])


@_pytree_dataclass
class EncoderState:
    """Carried LSTM state of the encoder, for chunked/streaming operation
    (reference split_len machinery: models/decoder.py:80-93)."""

    pre_h: jax.Array  # (PRE_L, N, H)
    pre_c: jax.Array
    post_h: jax.Array  # (POST_L, N, H)
    post_c: jax.Array


def init_encoder_state(
    batch: int, params: RNNTParams = RNNTParams(), dtype=jnp.float32
) -> EncoderState:
    H = params.trans_hidden_size
    z = lambda L: jnp.zeros((L, batch, H), dtype)
    zc = lambda L: jnp.zeros((L, batch, H), jnp.float32)
    return EncoderState(
        pre_h=z(params.pre_num_layers),
        pre_c=zc(params.pre_num_layers),
        post_h=z(params.post_num_layers),
        post_c=zc(params.post_num_layers),
    )


def transcription(
    weights: RNNTWeights,
    x: jax.Array,
    x_lens: jax.Array,
    state: EncoderState,
    params: RNNTParams = RNNTParams(),
) -> Tuple[jax.Array, EncoderState]:
    """Encoder over one chunk: pre-rnn -> stack_time -> post-rnn
    (reference: models/modeling_rnnt.py:116-144).

    x: {T, N, 240}, x_lens: {N} valid frames within this chunk.
    Returns f: {ceil(T/2), N, 1024} and the carried state.
    Dispatches to the int8 path for QuantRNNTWeights (trace-time isinstance).
    """
    from rnnt_inference_tpu.models.quant import FakeQuantRNNTWeights, QuantRNNTWeights

    if isinstance(weights, QuantRNNTWeights):
        from rnnt_inference_tpu.ops.lstm_int8 import quant_lstm_stack

        y, pre_h, pre_c = quant_lstm_stack(
            weights.pre_rnn, x, state.pre_h, state.pre_c, skip_quant_y=False
        )
        y = stack_time(y, x_lens, params.stack_time_factor)
        f, post_h, post_c = quant_lstm_stack(
            weights.post_rnn, y, state.post_h, state.post_c, skip_quant_y=True
        )
    elif isinstance(weights, FakeQuantRNNTWeights):
        from rnnt_inference_tpu.ops.lstm import fake_quant_lstm_stack

        y, pre_h, pre_c = fake_quant_lstm_stack(
            weights.pre_rnn, weights.pre_in_scale, x, state.pre_h, state.pre_c
        )
        y = stack_time(y, x_lens, params.stack_time_factor)
        f, post_h, post_c = fake_quant_lstm_stack(
            weights.post_rnn, weights.post_in_scale, y, state.post_h, state.post_c
        )
    else:
        y, pre_h, pre_c = lstm_stack(weights.pre_rnn, x, state.pre_h, state.pre_c)
        y = stack_time(y, x_lens, params.stack_time_factor)
        f, post_h, post_c = lstm_stack(weights.post_rnn, y, state.post_h, state.post_c)
    return f, EncoderState(pre_h=pre_h, pre_c=pre_c, post_h=post_h, post_c=post_c)


def prediction_step(
    weights: RNNTWeights,
    tokens: jax.Array,
    hg: jax.Array,
    cg: jax.Array,
    params: RNNTParams = RNNTParams(),
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """One step of the prediction network on the last emitted symbols.

    tokens: (N,) int32, SOS = -1 embeds to the zero vector (the reference's
    masked-fill SOS hack, models/modeling_rnnt.py:195-200).
    Returns (g {N, 320}, hg', cg').
    """
    sos_mask = tokens == params.SOS
    idx = jnp.where(sos_mask, 0, tokens)
    emb = jnp.take(weights.embed, idx, axis=0)
    emb = jnp.where(sos_mask[:, None], 0, emb)
    return lstm_single_step(weights.pred_rnn, emb, hg, cg)


def joint(
    weights: RNNTWeights,
    f: jax.Array,
    g: jax.Array,
) -> jax.Array:
    """Joint network on one (time, symbol) position per lane:
    relu(f@W1t + g@W1p + b1) @ W2 + b2 (reference: models/modeling_rnnt.py:259-289).

    f: (N, 1024), g: (N, 320).  Returns logits (N, 29) in f32.
    """
    w = weights.joint
    y = (
        jnp.dot(f.astype(w.w1_trans.dtype), w.w1_trans, preferred_element_type=jnp.float32)
        + jnp.dot(g.astype(w.w1_pred.dtype), w.w1_pred, preferred_element_type=jnp.float32)
        + w.b1.astype(jnp.float32)
    )
    y = jnp.maximum(y, 0.0)
    y = y.astype(w.w2.dtype)
    return (
        jnp.dot(y, w.w2, preferred_element_type=jnp.float32) + w.b2.astype(jnp.float32)
    )
