"""Kernel-level parity: JAX LSTM/StackTime vs torch ground truth.

Mirrors the reference's kernel unit scripts (reference: tests/test_lstm.py,
tests/test_st.py) but as an automated pytest suite with rtol=5e-3/atol=8e-3
tolerances like the reference uses (tests/test_lstm.py:8-9).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from rnnt_inference_tpu.config import RNNTParams
from rnnt_inference_tpu.models.weights import init_weights
from rnnt_inference_tpu.ops.lstm import lstm_layer, lstm_single_step, lstm_stack, stack_time

from reference_impl import RefLSTMStack, ref_stack_time

RTOL, ATOL = 5e-3, 8e-3
SMALL = RNNTParams(
    trans_input_size=24,
    trans_hidden_size=32,
    pred_hidden_size=16,
    joint_hidden_size=20,
)


def _np(x):
    return np.asarray(x)


@pytest.mark.parametrize("T,N,IC,H", [(7, 3, 24, 32), (1, 1, 16, 16)])
def test_lstm_layer_matches_torch(T, N, IC, H):
    key = jax.random.PRNGKey(0)
    w = init_weights(key, SMALL)
    layer = w.pre_rnn[0]
    # re-shape a layer with requested dims
    from rnnt_inference_tpu.models.weights import _init_lstm_layer

    layer = _init_lstm_layer(key, IC, H, jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (T, N, IC))
    h0 = jax.random.normal(jax.random.PRNGKey(2), (N, H))
    c0 = jax.random.normal(jax.random.PRNGKey(3), (N, H))

    y, h, c = jax.jit(lstm_layer)(layer, x, h0, c0)

    ref = RefLSTMStack([_np(layer.w_ih)], [_np(layer.w_hh)], [_np(layer.b)])
    y_t, h_t, c_t = ref(_np(x), _np(h0)[None], _np(c0)[None])
    np.testing.assert_allclose(_np(y), y_t.numpy(), rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(_np(h), h_t.numpy()[0], rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(_np(c), c_t.numpy()[0], rtol=RTOL, atol=ATOL)


def test_lstm_stack_matches_torch():
    key = jax.random.PRNGKey(42)
    w = init_weights(key, SMALL)
    layers = w.pre_rnn  # 2 layers: 24 -> 32 -> 32
    T, N = 9, 4
    x = jax.random.normal(jax.random.PRNGKey(5), (T, N, SMALL.trans_input_size))
    L, H = len(layers), SMALL.trans_hidden_size
    h0 = jnp.zeros((L, N, H))
    c0 = jnp.zeros((L, N, H))

    y, h, c = jax.jit(lstm_stack)(layers, x, h0, c0)

    ref = RefLSTMStack(
        [_np(l.w_ih) for l in layers],
        [_np(l.w_hh) for l in layers],
        [_np(l.b) for l in layers],
    )
    y_t, h_t, c_t = ref(_np(x), _np(h0), _np(c0))
    np.testing.assert_allclose(_np(y), y_t.numpy(), rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(_np(h), h_t.numpy(), rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(_np(c), c_t.numpy(), rtol=RTOL, atol=ATOL)


def test_lstm_single_step_matches_sequence():
    """One step through lstm_single_step == first step of the scan path."""
    key = jax.random.PRNGKey(7)
    w = init_weights(key, SMALL)
    layers = w.pred_rnn
    N, P, L = 5, SMALL.pred_hidden_size, SMALL.pred_num_layers
    x = jax.random.normal(jax.random.PRNGKey(8), (N, P))
    h0 = jax.random.normal(jax.random.PRNGKey(9), (L, N, P))
    c0 = jax.random.normal(jax.random.PRNGKey(10), (L, N, P))

    y1, h1, c1 = jax.jit(lstm_single_step)(layers, x, h0, c0)
    y2, h2, c2 = jax.jit(lstm_stack)(layers, x[None], h0, c0)
    np.testing.assert_allclose(_np(y1), _np(y2[0]), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(_np(h1), _np(h2), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(_np(c1), _np(c2), rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("T,factor", [(8, 2), (7, 2), (9, 3), (1, 2)])
def test_stack_time(T, factor):
    N, C = 3, 6
    x = jax.random.normal(jax.random.PRNGKey(0), (T, N, C))
    x_lens = jnp.array([T, max(T - 3, 0), 1], dtype=jnp.int32)
    out = jax.jit(stack_time, static_argnames="factor")(x, x_lens, factor)
    ref = ref_stack_time(
        torch.as_tensor(_np(x)), torch.as_tensor(_np(x_lens)).long(), factor
    )
    np.testing.assert_allclose(_np(out), ref.numpy(), rtol=1e-6, atol=1e-6)


def test_bf16_lstm_close_to_f32():
    key = jax.random.PRNGKey(11)
    w = init_weights(key, SMALL)
    layers = w.pre_rnn
    T, N = 12, 4
    x = jax.random.normal(jax.random.PRNGKey(12), (T, N, SMALL.trans_input_size))
    L, H = len(layers), SMALL.trans_hidden_size
    h0 = jnp.zeros((L, N, H))
    c0 = jnp.zeros((L, N, H))
    y32, _, _ = jax.jit(lstm_stack)(layers, x, h0, c0)
    layers16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), layers)
    y16, _, _ = jax.jit(lstm_stack)(layers16, x, h0.astype(jnp.bfloat16), c0)
    np.testing.assert_allclose(
        _np(y16).astype(np.float32), _np(y32), rtol=0.1, atol=0.1
    )
