"""Model-artifact pipeline: save/load weights, calibration state, and
quantized models.

Replaces the reference's torch/TorchScript artifact chain
(rnnt.pt -> rnnt_calib.pt -> rnnt_quant_jit.pt, SURVEY §5 checkpoint/resume;
reference: models/main.py:22-58, models/utils.py:84-110) with dtype-tagged
.npz containers — no TorchScript stage is needed because jit compilation is
structural in JAX; the artifact is just the weight pytree + scales.
"""

from __future__ import annotations

import json
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rnnt_inference_tpu.config import RNNTParams
from rnnt_inference_tpu.models.quant import (
    CalibState,
    QuantLSTMLayerWeights,
    QuantRNNTWeights,
)
from rnnt_inference_tpu.models.weights import (
    JointWeights,
    LSTMLayerWeights,
    RNNTWeights,
)

_DTYPE_TAG = {"bfloat16": jnp.bfloat16, "float32": jnp.float32, "int8": jnp.int8,
              "float16": jnp.float16}


def _flatten(tree) -> Tuple[dict, Any]:
    leaves, treedef = jax.tree.flatten(tree)
    arrays = {}
    dtypes = []
    for i, leaf in enumerate(leaves):
        a = np.asarray(leaf)
        dtypes.append(str(a.dtype))
        if a.dtype == jnp.bfloat16:
            a = a.view(np.uint16)  # npz can't store bf16 — bit-pattern it
        arrays[f"a{i}"] = a
    return arrays, (treedef, dtypes)


def save_pytree(path: str, tree, kind: str) -> None:
    arrays, (treedef, dtypes) = _flatten(tree)
    meta = {"kind": kind, "n": len(dtypes), "dtypes": dtypes}
    np.savez_compressed(
        path,
        __meta__=np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8),
        **arrays,
    )


def _load_arrays(path: str):
    z = np.load(path)
    meta = json.loads(bytes(z["__meta__"]).decode())
    leaves = []
    for i in range(meta["n"]):
        a = z[f"a{i}"]
        if meta["dtypes"][i] == "bfloat16":
            a = jnp.asarray(a.view(jnp.bfloat16))
        else:
            a = jnp.asarray(a)
        leaves.append(a)
    return meta, leaves


def save_weights(path: str, weights: RNNTWeights) -> None:
    save_pytree(path, weights, "rnnt_weights")


def load_weights(path: str, params: RNNTParams = RNNTParams()) -> RNNTWeights:
    meta, leaves = _load_arrays(path)
    assert meta["kind"] == "rnnt_weights", meta["kind"]
    ref = _weights_structure(params)
    return jax.tree.unflatten(jax.tree.structure(ref), leaves)


def save_calib(path: str, calib: CalibState) -> None:
    save_pytree(path, calib, "rnnt_calib")


def load_calib(path: str) -> CalibState:
    meta, leaves = _load_arrays(path)
    assert meta["kind"] == "rnnt_calib", meta["kind"]
    return CalibState(pre_amax=leaves[0], post_amax=leaves[1])


def save_quant_weights(path: str, qweights: QuantRNNTWeights) -> None:
    save_pytree(path, qweights, "rnnt_quant_weights")


def load_quant_weights(
    path: str, params: RNNTParams = RNNTParams()
) -> QuantRNNTWeights:
    meta, leaves = _load_arrays(path)
    assert meta["kind"] == "rnnt_quant_weights", meta["kind"]
    ref = _quant_structure(params)
    return jax.tree.unflatten(jax.tree.structure(ref), leaves)


# -- structure templates (shapes irrelevant; only treedef matters) -----------


def _weights_structure(params: RNNTParams) -> RNNTWeights:
    z = jnp.zeros(())
    lstm = lambda: LSTMLayerWeights(w_ih=z, w_hh=z, b=z)
    return RNNTWeights(
        pre_rnn=[lstm() for _ in range(params.pre_num_layers)],
        post_rnn=[lstm() for _ in range(params.post_num_layers)],
        embed=z,
        pred_rnn=[lstm() for _ in range(params.pred_num_layers)],
        joint=JointWeights(w1_trans=z, w1_pred=z, b1=z, w2=z, b2=z),
    )


def _quant_structure(params: RNNTParams) -> QuantRNNTWeights:
    z = jnp.zeros(())
    qlstm = lambda: QuantLSTMLayerWeights(
        w_ih=z, w_hh=z, b=z, in_scale=z, w_scale=z, out_scale=z
    )
    lstm = lambda: LSTMLayerWeights(w_ih=z, w_hh=z, b=z)
    return QuantRNNTWeights(
        pre_rnn=[qlstm() for _ in range(params.pre_num_layers)],
        post_rnn=[qlstm() for _ in range(params.post_num_layers)],
        embed=z,
        pred_rnn=[lstm() for _ in range(params.pred_num_layers)],
        joint=JointWeights(w1_trans=z, w1_pred=z, b1=z, w2=z, b2=z),
    )
