"""Checkpoint artifact pipeline: save/load round-trips for f32, bf16, calib,
and quantized weights; torch state-dict import with joint fc1 split."""

import numpy as np
import jax
import jax.numpy as jnp

from rnnt_inference_tpu.config import RNNTParams
from rnnt_inference_tpu.models import checkpoint as ckpt
from rnnt_inference_tpu.models.quant import calibrate, quantize_weights
from rnnt_inference_tpu.models.weights import (
    init_weights,
    weights_from_torch_state_dict,
)

SMALL = RNNTParams(
    trans_input_size=24,
    trans_hidden_size=32,
    pred_hidden_size=16,
    joint_hidden_size=20,
)


def _trees_equal(a, b):
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        assert x.dtype == y.dtype, (x.dtype, y.dtype)
        np.testing.assert_array_equal(
            np.asarray(x, dtype=np.float32), np.asarray(y, dtype=np.float32)
        )


def test_weights_roundtrip(tmp_path):
    w = init_weights(jax.random.PRNGKey(0), SMALL)
    p = str(tmp_path / "w.npz")
    ckpt.save_weights(p, w)
    w2 = ckpt.load_weights(p, SMALL)
    _trees_equal(w, w2)


def test_bf16_weights_roundtrip(tmp_path):
    w = init_weights(jax.random.PRNGKey(1), SMALL, dtype=jnp.bfloat16)
    p = str(tmp_path / "w16.npz")
    ckpt.save_weights(p, w)
    w2 = ckpt.load_weights(p, SMALL)
    assert w2.pre_rnn[0].w_ih.dtype == jnp.bfloat16
    _trees_equal(w, w2)


def test_quant_roundtrip(tmp_path):
    w = init_weights(jax.random.PRNGKey(2), SMALL)
    x = jax.random.normal(jax.random.PRNGKey(3), (8, 2, SMALL.trans_input_size))
    lens = jnp.full((2,), 8, jnp.int32)
    calib = calibrate(w, [(x, lens)], SMALL)

    pc = str(tmp_path / "calib.npz")
    ckpt.save_calib(pc, calib)
    calib2 = ckpt.load_calib(pc)
    _trees_equal(calib, calib2)

    qw = quantize_weights(w, calib, SMALL)
    pq = str(tmp_path / "quant.npz")
    ckpt.save_quant_weights(pq, qw)
    qw2 = ckpt.load_quant_weights(pq, SMALL)
    assert qw2.pre_rnn[0].w_ih.dtype == jnp.int8
    assert qw2.pred_rnn[0].w_ih.dtype == jnp.bfloat16
    _trees_equal(qw, qw2)


def test_torch_state_dict_import():
    """Zenodo-key import: joint fc1 split, key renames, bias folding
    (reference: models/utils.py:60-81)."""
    import torch

    p = RNNTParams()
    rng = np.random.RandomState(0)
    sd = {}

    def lstm_keys(prefix, layers, in0, hidden):
        ic = in0
        for l in range(layers):
            sd[f"{prefix}.weight_ih_l{l}"] = torch.tensor(
                rng.randn(4 * hidden, ic).astype(np.float32)
            )
            sd[f"{prefix}.weight_hh_l{l}"] = torch.tensor(
                rng.randn(4 * hidden, hidden).astype(np.float32)
            )
            sd[f"{prefix}.bias_ih_l{l}"] = torch.tensor(
                rng.randn(4 * hidden).astype(np.float32)
            )
            sd[f"{prefix}.bias_hh_l{l}"] = torch.tensor(
                rng.randn(4 * hidden).astype(np.float32)
            )
            ic = hidden

    lstm_keys("encoder.pre_rnn.lstm", p.pre_num_layers, 240, 1024)
    lstm_keys("encoder.post_rnn.lstm", p.post_num_layers, 2048, 1024)
    lstm_keys("prediction.dec_rnn.lstm", p.pred_num_layers, 320, 320)
    sd["prediction.embed.weight"] = torch.tensor(rng.randn(28, 320).astype(np.float32))
    joint_w = rng.randn(512, 1344).astype(np.float32)
    joint_b = rng.randn(512).astype(np.float32)
    sd["joint_net.0.weight"] = torch.tensor(joint_w)
    sd["joint_net.0.bias"] = torch.tensor(joint_b)
    sd["joint_net.3.weight"] = torch.tensor(rng.randn(29, 512).astype(np.float32))
    sd["joint_net.3.bias"] = torch.tensor(rng.randn(29).astype(np.float32))
    # featurizer buffers must be ignored
    sd["audio_preprocessor.featurizer.fb"] = torch.zeros(1)
    sd["audio_preprocessor.featurizer.window"] = torch.zeros(1)

    w = weights_from_torch_state_dict({"state_dict": sd}, p)
    # fc1 split: trans half = cols :1024, pred half = cols 1024:
    np.testing.assert_allclose(np.asarray(w.joint.w1_trans), joint_w[:, :1024].T)
    np.testing.assert_allclose(np.asarray(w.joint.w1_pred), joint_w[:, 1024:].T)
    # b1 = zero trans bias + original joint bias
    np.testing.assert_allclose(np.asarray(w.joint.b1), joint_b)
    # lstm bias folding
    b0 = (sd["encoder.pre_rnn.lstm.bias_ih_l0"] + sd["encoder.pre_rnn.lstm.bias_hh_l0"]).numpy()
    np.testing.assert_allclose(np.asarray(w.pre_rnn[0].b), b0)
    assert w.pre_rnn[0].w_ih.shape == (240, 4096)
    assert w.pred_rnn[0].w_ih.shape == (320, 1280)
