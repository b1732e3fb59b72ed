"""Fused Pallas decode step == XLA while_loop body, token-exact.

The decode mask algebra is the product contract (token-exact vs the torch
oracle in tests/reference_impl.py); these tests pin that the Pallas
fused-step kernel (ops/decode_pallas.py) is BIT-identical to the XLA body
— same tokens, same emission counts, same carried prediction state — on
the interpret path (the TPU path is checked in scripts/microbench.py runs).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rnnt_inference_tpu.config import RNNTParams
from rnnt_inference_tpu.models.decoder import greedy_decode, set_decode_impl
from rnnt_inference_tpu.models.weights import init_weights

SMALL = RNNTParams(
    trans_input_size=240,
    trans_hidden_size=64,
    pred_hidden_size=32,
    joint_hidden_size=32,
    max_res_len=64,
)


def _decode_both(params, w, feats, flens, split_len=-1):
    try:
        set_decode_impl("xla")
        res_x, len_x = greedy_decode(w, feats, flens, params=params,
                                     split_len=split_len)
        set_decode_impl("pallas")
        res_p, len_p = greedy_decode(w, feats, flens, params=params,
                                     split_len=split_len)
    finally:
        set_decode_impl("xla")
    return (np.asarray(res_x), np.asarray(len_x),
            np.asarray(res_p), np.asarray(len_p))


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_pallas_decode_matches_xla(seed, dtype):
    # bf16 is the shipping bench configuration — pin exactness there too
    w = init_weights(jax.random.PRNGKey(seed), SMALL, dtype=dtype)
    T, N = 20, 8
    feats = jax.random.normal(
        jax.random.PRNGKey(seed + 10), (T, N, SMALL.trans_input_size)
    )
    flens = jnp.array([20, 17, 12, 8, 5, 2, 1, 0], jnp.int32)
    res_x, len_x, res_p, len_p = _decode_both(SMALL, w, feats, flens)
    np.testing.assert_array_equal(len_p, len_x)
    np.testing.assert_array_equal(res_p, res_x)
    assert len_x[-1] == 0  # zero-length lane emits nothing


def test_pallas_decode_streaming_matches():
    """split_len streaming carries padded state across chunks identically."""
    w = init_weights(jax.random.PRNGKey(3), SMALL)
    T, N = 24, 8
    feats = jax.random.normal(jax.random.PRNGKey(13), (T, N, SMALL.trans_input_size))
    flens = jnp.array([24, 20, 15, 10, 7, 4, 2, 1], jnp.int32)
    res_x, len_x, res_p, len_p = _decode_both(SMALL, w, feats, flens, split_len=8)
    np.testing.assert_array_equal(len_p, len_x)
    np.testing.assert_array_equal(res_p, res_x)


def test_pallas_decode_quant_weights():
    """The decode kernel also runs on QuantRNNTWeights (float pred + joint)."""
    from rnnt_inference_tpu.models.quant import calibrate, quantize_weights

    w = init_weights(jax.random.PRNGKey(5), SMALL)
    T, N = 12, 8
    feats = jax.random.normal(jax.random.PRNGKey(7), (T, N, SMALL.trans_input_size))
    flens = jnp.full((N,), T, jnp.int32)
    calib = calibrate(w, [(feats, flens)], SMALL)
    qw = quantize_weights(w, calib, SMALL, compute_dtype=jnp.float32)
    res_x, len_x, res_p, len_p = _decode_both(SMALL, qw, feats, flens)
    np.testing.assert_array_equal(len_p, len_x)
    np.testing.assert_array_equal(res_p, res_x)


