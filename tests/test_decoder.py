"""E2E decode parity: jitted while_loop greedy decode vs eager torch oracle.

The decode mask algebra (update_g/update_f, max_symbols_per_step, eos clamp,
streaming split_len chunking) must produce IDENTICAL token sequences to the
eager reference implementation.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rnnt_inference_tpu.config import RNNTParams
from rnnt_inference_tpu.models.decoder import greedy_decode
from rnnt_inference_tpu.models.weights import init_weights

from reference_impl import RefRNNT, ref_greedy_decode

SMALL = RNNTParams(
    trans_input_size=24,
    trans_hidden_size=32,
    pred_hidden_size=16,
    joint_hidden_size=20,
    max_res_len=256,
)


def _make_inputs(T, N, params, seed=0):
    key = jax.random.PRNGKey(seed)
    x = jax.random.normal(key, (T, N, params.trans_input_size))
    lens = np.random.RandomState(seed).randint(1, T + 1, size=N)
    lens[0] = T
    return x, jnp.asarray(lens, jnp.int32)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_greedy_decode_matches_reference(seed):
    params = SMALL
    T, N = 16, 5
    w = init_weights(jax.random.PRNGKey(100 + seed), params)
    x, x_lens = _make_inputs(T, N, params, seed)

    res, res_lens = greedy_decode(w, x, x_lens, params=params)
    ref = RefRNNT(w, params)
    res_ref, res_lens_ref = ref_greedy_decode(ref, np.asarray(x), np.asarray(x_lens))

    np.testing.assert_array_equal(np.asarray(res_lens), res_lens_ref)
    np.testing.assert_array_equal(np.asarray(res), res_ref)


def test_greedy_decode_split_matches_reference():
    params = SMALL
    T, N, split = 16, 4, 4
    w = init_weights(jax.random.PRNGKey(200), params)
    x, x_lens = _make_inputs(T, N, params, seed=3)

    res, res_lens = greedy_decode(w, x, x_lens, params=params, split_len=split)
    ref = RefRNNT(w, params)
    res_ref, res_lens_ref = ref_greedy_decode(
        ref, np.asarray(x), np.asarray(x_lens), split_len=split
    )
    np.testing.assert_array_equal(np.asarray(res_lens), res_lens_ref)
    np.testing.assert_array_equal(np.asarray(res), res_ref)


def test_split_equals_nosplit():
    """Even-sized streaming chunks must reproduce the non-streaming decode
    bit-for-bit (state carry across chunks is exact)."""
    params = SMALL
    T, N = 20, 4
    w = init_weights(jax.random.PRNGKey(300), params)
    x, x_lens = _make_inputs(T, N, params, seed=4)

    res_a, lens_a = greedy_decode(w, x, x_lens, params=params, split_len=-1)
    res_b, lens_b = greedy_decode(w, x, x_lens, params=params, split_len=4)
    np.testing.assert_array_equal(np.asarray(lens_a), np.asarray(lens_b))
    np.testing.assert_array_equal(np.asarray(res_a), np.asarray(res_b))


def test_split_nondivisible_T_equals_nosplit():
    """T not a multiple of split_len: the trailing scan chunk is padded and
    must be a no-op past each lane's length."""
    params = SMALL
    T, N = 18, 4
    w = init_weights(jax.random.PRNGKey(301), params)
    x, x_lens = _make_inputs(T, N, params, seed=5)

    res_a, lens_a = greedy_decode(w, x, x_lens, params=params, split_len=-1)
    res_b, lens_b = greedy_decode(w, x, x_lens, params=params, split_len=4)
    np.testing.assert_array_equal(np.asarray(lens_a), np.asarray(lens_b))
    np.testing.assert_array_equal(np.asarray(res_a), np.asarray(res_b))


def test_zero_length_lane_emits_nothing():
    params = SMALL
    T, N = 8, 3
    w = init_weights(jax.random.PRNGKey(400), params)
    x = jax.random.normal(jax.random.PRNGKey(5), (T, N, params.trans_input_size))
    x_lens = jnp.array([T, 0, 3], jnp.int32)
    res, res_lens = greedy_decode(w, x, x_lens, params=params)
    assert int(res_lens[1]) == 0
    assert np.all(np.asarray(res)[1] == -1)


def test_full_dims_smoke():
    """Real model dims, small T/N: exercises 1024-wide encoder + decode."""
    params = RNNTParams(max_res_len=128)
    T, N = 8, 2
    w = init_weights(jax.random.PRNGKey(0), params)
    x = jax.random.normal(jax.random.PRNGKey(1), (T, N, params.trans_input_size))
    x_lens = jnp.array([T, 5], jnp.int32)
    res, res_lens = greedy_decode(w, x, x_lens, params=params)
    assert res.shape == (N, params.max_res_len)
    assert res_lens.shape == (N,)
    assert np.all(np.asarray(res_lens) >= 0)


@pytest.mark.parametrize("cap", [1, 2, 30])
def test_symbol_cap_matches_reference(cap):
    """max_symbols_per_step algebra: the per-frame burst cap must clamp the
    jitted decode exactly like the eager oracle (reference decoder.py caps
    symbols emitted without advancing time)."""
    import dataclasses

    params = dataclasses.replace(SMALL, max_symbols_per_step=cap)
    T, N = 12, 4
    w = init_weights(jax.random.PRNGKey(42), params)
    x, x_lens = _make_inputs(T, N, params, seed=7)

    res, res_lens = greedy_decode(w, x, x_lens, params=params)
    ref = RefRNNT(w, params)
    res_ref, res_lens_ref = ref_greedy_decode(ref, np.asarray(x), np.asarray(x_lens))
    np.testing.assert_array_equal(np.asarray(res_lens), res_lens_ref)
    np.testing.assert_array_equal(np.asarray(res), res_ref)




@pytest.mark.parametrize("depth", [1, 3])
def test_unroll_depth_token_exact(depth, monkeypatch):
    """RNNT_DECODE_UNROLL composes the while body N times per trip; every
    update is finish-gated so any depth must be token-exact vs the default
    (2x).  Pins the perf knob so deeper-unroll A/Bs never change tokens."""
    from rnnt_inference_tpu.models import decoder as dec

    params = SMALL
    T, N = 16, 5
    w = init_weights(jax.random.PRNGKey(77), params)
    x, x_lens = _make_inputs(T, N, params, seed=3)
    res0, lens0 = greedy_decode(w, x, x_lens, params=params)

    monkeypatch.setattr(dec, "_DECODE_UNROLL", depth)
    # new python callable -> new jit cache entry traces at the new depth
    res1, lens1 = jax.jit(
        lambda w, x, l: dec.greedy_decode.__wrapped__(w, x, l, params=params)
    )(w, x, x_lens)
    assert np.array_equal(np.asarray(res0), np.asarray(res1))
    assert np.array_equal(np.asarray(lens0), np.asarray(lens1))
