"""Weight pytrees for the RNN-T model, plus initializers and checkpoint import.

TPU-first layout decisions (vs the reference's torch layout):
  - LSTM weights are stored pre-transposed as (in_features, 4*hidden) so the
    hot path is a plain ``x @ w`` that XLA tiles straight onto the MXU.
  - b_ih and b_hh are folded into a single bias vector; in exact arithmetic
    gates = x@Wih + h@Whh + (b_ih + b_hh), so nothing is lost, and this is
    also what the reference's int8 kernels do after folding
    (reference: models/quant_lstm.py:205-209).
  - gate order follows the torch convention (i, f, g, o) so the zenodo
    checkpoint imports without permutation.

Checkpoint import reproduces ``migrate_state_dict`` semantics
(reference: models/utils.py:60-81): the fused joint fc1 (512, 1344) splits
into a transcription half (columns :1024, zero bias) and a prediction half
(columns 1024:, original bias).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from rnnt_inference_tpu.config import RNNTParams


def _pytree_dataclass(cls):
    cls = dataclasses.dataclass(cls)
    fields = [f.name for f in dataclasses.fields(cls)]
    return jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=[])


@_pytree_dataclass
class LSTMLayerWeights:
    """One LSTM layer.  w_ih: (IC, 4H), w_hh: (H, 4H), b: (4H,)."""

    w_ih: jax.Array
    w_hh: jax.Array
    b: jax.Array

    @property
    def hidden_size(self) -> int:
        return self.w_hh.shape[0]

    @property
    def input_size(self) -> int:
        return self.w_ih.shape[0]


@_pytree_dataclass
class JointWeights:
    """Joint network: two input linears summed, ReLU, output linear
    (reference: models/modeling_rnnt.py:208-289).

    w1_trans: (1024, 512)  b1: (512,)  (b1 = b_trans + b_pred, folded like the
    reference's bf16 prepack, models/modeling_rnnt.py:226-228)
    w1_pred:  (320, 512)
    w2:       (512, 29)    b2: (29,)
    """

    w1_trans: jax.Array
    w1_pred: jax.Array
    b1: jax.Array
    w2: jax.Array
    b2: jax.Array


@_pytree_dataclass
class RNNTWeights:
    """Full model: 2-layer pre-rnn, 3-layer post-rnn (encoder), embedding +
    2-layer prediction rnn, joint net (reference: models/modeling_rnnt.py:15-32)."""

    pre_rnn: List[LSTMLayerWeights]
    post_rnn: List[LSTMLayerWeights]
    embed: jax.Array  # (num_labels - 1, pred_hidden)
    pred_rnn: List[LSTMLayerWeights]
    joint: JointWeights

    def astype(self, dtype) -> "RNNTWeights":
        return jax.tree.map(lambda x: x.astype(dtype), self)


def _init_lstm_layer(key, input_size: int, hidden_size: int, dtype) -> LSTMLayerWeights:
    # torch LSTM init: U(-k, k), k = 1/sqrt(hidden)
    k = 1.0 / np.sqrt(hidden_size)
    k_ih, k_hh, k_b1, k_b2 = jax.random.split(key, 4)
    u = lambda kk, shape: jax.random.uniform(kk, shape, dtype, -k, k)
    return LSTMLayerWeights(
        w_ih=u(k_ih, (input_size, 4 * hidden_size)),
        w_hh=u(k_hh, (hidden_size, 4 * hidden_size)),
        b=u(k_b1, (4 * hidden_size,)) + u(k_b2, (4 * hidden_size,)),
    )


def init_weights(
    key: jax.Array, params: RNNTParams = RNNTParams(), dtype=jnp.float32
) -> RNNTWeights:
    """Random weights with torch-style init, for tests and benchmarks."""
    keys = iter(jax.random.split(key, 16))
    pre_sizes = [params.trans_input_size] + [params.trans_hidden_size] * (
        params.pre_num_layers - 1
    )
    post_in = params.trans_hidden_size * params.stack_time_factor
    post_sizes = [post_in] + [params.trans_hidden_size] * (params.post_num_layers - 1)
    pred_sizes = [params.pred_hidden_size] * params.pred_num_layers

    pre = [
        _init_lstm_layer(next(keys), s, params.trans_hidden_size, dtype)
        for s in pre_sizes
    ]
    post = [
        _init_lstm_layer(next(keys), s, params.trans_hidden_size, dtype)
        for s in post_sizes
    ]
    pred = [
        _init_lstm_layer(next(keys), s, params.pred_hidden_size, dtype)
        for s in pred_sizes
    ]
    embed = jax.random.normal(
        next(keys), (params.num_labels - 1, params.pred_hidden_size), dtype
    )
    H, P, J, K = (
        params.trans_hidden_size,
        params.pred_hidden_size,
        params.joint_hidden_size,
        params.num_labels,
    )
    u = lambda kk, shape, fan: jax.random.uniform(
        kk, shape, dtype, -1 / np.sqrt(fan), 1 / np.sqrt(fan)
    )
    joint = JointWeights(
        w1_trans=u(next(keys), (H, J), H + P),
        w1_pred=u(next(keys), (P, J), H + P),
        b1=u(next(keys), (J,), H + P),
        w2=u(next(keys), (J, K), J),
        b2=u(next(keys), (K,), J),
    )
    return RNNTWeights(pre_rnn=pre, post_rnn=post, embed=embed, pred_rnn=pred, joint=joint)


# ---------------------------------------------------------------------------
# Checkpoint import (zenodo rnnt.pt -> RNNTWeights)
# ---------------------------------------------------------------------------


def _get(sd: Dict[str, Any], key: str) -> np.ndarray:
    v = sd[key]
    if hasattr(v, "detach"):  # torch tensor without importing torch here
        v = v.detach().cpu().numpy()
    return np.asarray(v, dtype=np.float32)


def _lstm_from_torch(sd: Dict[str, Any], prefix: str, num_layers: int) -> List[LSTMLayerWeights]:
    layers = []
    for l in range(num_layers):
        w_ih = _get(sd, f"{prefix}.weight_ih_l{l}")  # (4H, IC)
        w_hh = _get(sd, f"{prefix}.weight_hh_l{l}")  # (4H, H)
        b_ih = _get(sd, f"{prefix}.bias_ih_l{l}")
        b_hh = _get(sd, f"{prefix}.bias_hh_l{l}")
        layers.append(
            LSTMLayerWeights(
                w_ih=jnp.asarray(w_ih.T), w_hh=jnp.asarray(w_hh.T), b=jnp.asarray(b_ih + b_hh)
            )
        )
    return layers


def weights_from_torch_state_dict(
    state_dict: Dict[str, Any], params: RNNTParams = RNNTParams()
) -> RNNTWeights:
    """Import the MLPerf RNN-T checkpoint.

    Accepts either raw zenodo keys (encoder.pre_rnn.lstm.*, joint_net.0.*) or
    already-migrated keys (transcription.pre_rnn.*, joint.linear1_trans.*);
    key migration mirrors reference models/utils.py:60-81.
    """
    sd = dict(state_dict)
    if "state_dict" in sd:
        sd = dict(sd["state_dict"])

    # Migrate zenodo-era keys.
    migrated: Dict[str, Any] = {}
    for key, value in sd.items():
        if key == "joint_net.0.weight":
            w = _get(sd, key)  # (512, 1344)
            migrated["joint.linear1_trans.weight"] = w[:, : params.trans_hidden_size]
            migrated["joint.linear1_pred.weight"] = w[:, params.trans_hidden_size :]
            continue
        if key == "joint_net.0.bias":
            migrated["joint.linear1_trans.bias"] = np.zeros(
                params.joint_hidden_size, dtype=np.float32
            )
            migrated["joint.linear1_pred.bias"] = value
            continue
        key = key.replace("encoder.pre_rnn.lstm", "transcription.pre_rnn")
        key = key.replace("encoder.post_rnn.lstm", "transcription.post_rnn")
        key = key.replace("dec_rnn.lstm", "pred_rnn")
        key = key.replace("joint_net.0", "joint.linear1")
        key = key.replace("joint_net.3", "joint.linear2")
        migrated[key] = value
    sd = migrated

    pre = _lstm_from_torch(sd, "transcription.pre_rnn", params.pre_num_layers)
    post = _lstm_from_torch(sd, "transcription.post_rnn", params.post_num_layers)
    pred = _lstm_from_torch(sd, "prediction.pred_rnn", params.pred_num_layers)
    embed = jnp.asarray(_get(sd, "prediction.embed.weight"))
    joint = JointWeights(
        w1_trans=jnp.asarray(_get(sd, "joint.linear1_trans.weight").T),
        w1_pred=jnp.asarray(_get(sd, "joint.linear1_pred.weight").T),
        b1=jnp.asarray(
            _get(sd, "joint.linear1_trans.bias") + _get(sd, "joint.linear1_pred.bias")
        ),
        w2=jnp.asarray(_get(sd, "joint.linear2.weight").T),
        b2=jnp.asarray(_get(sd, "joint.linear2.bias")),
    )
    return RNNTWeights(pre_rnn=pre, post_rnn=post, embed=embed, pred_rnn=pred, joint=joint)


def load_torch_checkpoint(path: str, params: RNNTParams = RNNTParams()) -> RNNTWeights:
    """Load the zenodo rnnt.pt via torch (CPU) and convert."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    return weights_from_torch_state_dict(ckpt, params)
