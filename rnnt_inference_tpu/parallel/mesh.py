"""Device mesh construction and sharding specs.

TPU-native replacement for the reference's parallelism machinery (SURVEY §2.4):
instance threads + socket clones become a ("data", "model") mesh —
utterance batches shard over "data" (the reference's 28 instance threads,
csrc/torch_sut.cpp:104-121), weights either replicate (the reference's
per-socket model clones, rnnt_model.hpp:41-47 — free on TPU) or shard their
gate/joint dimensions over "model" (tensor parallelism the CPU stack never
had).  XLA GSPMD inserts the collectives.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    model_parallel: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ("data", "model") mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    assert n % model_parallel == 0, f"{n} devices not divisible by tp={model_parallel}"
    arr = np.array(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Features {T, N, C}: shard the batch axis over "data"."""
    return NamedSharding(mesh, P(None, "data", None))


def lens_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def server_state_sharding(mesh: Mesh, state):
    """Sharding pytree for ServerState (and its nested DecodeState): shard
    the SLOT axis over "data".  Every leaf carries the slot axis at
    position 0 for per-slot vectors/matrices ((N,), (N, R)) and position 1
    for layer-stacked / time-major tensors ((L, N, H), (T, N, C)) — the
    layout invariant of runtime/server.py's state pytrees.  With slots
    sharded, server_step's window gather and the decode while_loop run
    per-shard; the loop cond's jnp.all over slots becomes the one
    per-iteration all-reduce (reference analog: each instance thread owns
    a private PipelineState, torch_sut.cpp:470-540 — here one logical
    state spans the mesh)."""

    def spec(leaf):
        if leaf.ndim >= 3:
            return NamedSharding(mesh, P(None, "data"))
        return NamedSharding(mesh, P("data"))

    return jax.tree.map(spec, state)


def weight_shardings(mesh: Mesh, weights, tensor_parallel: bool = True):
    """Sharding pytree for RNNTWeights.

    tensor_parallel=True shards every LSTM gate dimension (4H) and the joint
    hidden dimension over "model" (Megatron-style: gate projections are
    column-parallel; the joint output linear is row-parallel with an
    all-reduce).  With model axis size 1 this degrades to full replication.
    """
    from rnnt_inference_tpu.models.weights import (
        JointWeights,
        LSTMLayerWeights,
        RNNTWeights,
    )

    from rnnt_inference_tpu.models.quant import (
        QuantLSTMLayerWeights,
        QuantRNNTWeights,
    )

    if isinstance(weights, QuantRNNTWeights):
        # int8 encoder TP (XLA path): gate dims (4H) column-parallel like
        # the bf16 layers; per-tensor scales are scalars -> replicated.
        # GSPMD inserts the per-step h all-gather.  The Pallas kernels are
        # single-device programs — with tensor_parallel=False (or under
        # shard_map per data shard) replication matches the reference's
        # per-socket clones.
        def qspec(layer: QuantLSTMLayerWeights) -> QuantLSTMLayerWeights:
            gate = P(None, "model") if tensor_parallel else P()
            vec = P("model") if tensor_parallel else P()
            return QuantLSTMLayerWeights(
                w_ih=NamedSharding(mesh, gate),
                w_hh=NamedSharding(mesh, gate),
                b=NamedSharding(mesh, vec),
                in_scale=NamedSharding(mesh, P()),
                w_scale=NamedSharding(mesh, P()),
                out_scale=NamedSharding(mesh, P()),
            )

        rest = weight_shardings(
            mesh,
            RNNTWeights(
                pre_rnn=[], post_rnn=[], embed=weights.embed,
                pred_rnn=weights.pred_rnn, joint=weights.joint,
            ),
            tensor_parallel,
        )
        return QuantRNNTWeights(
            pre_rnn=[qspec(l) for l in weights.pre_rnn],
            post_rnn=[qspec(l) for l in weights.post_rnn],
            embed=rest.embed,
            pred_rnn=rest.pred_rnn,
            joint=rest.joint,
        )

    if not isinstance(weights, RNNTWeights):
        # fake-quant weights: replicate every leaf (scales included) —
        # the triage mode has no production TP use.
        return jax.tree.map(lambda _: NamedSharding(mesh, P()), weights)

    def lstm_spec(layer: LSTMLayerWeights) -> LSTMLayerWeights:
        if not tensor_parallel:
            return LSTMLayerWeights(
                w_ih=NamedSharding(mesh, P()),
                w_hh=NamedSharding(mesh, P()),
                b=NamedSharding(mesh, P()),
            )
        return LSTMLayerWeights(
            w_ih=NamedSharding(mesh, P(None, "model")),
            w_hh=NamedSharding(mesh, P(None, "model")),
            b=NamedSharding(mesh, P("model")),
        )

    if tensor_parallel:
        joint = JointWeights(
            w1_trans=NamedSharding(mesh, P(None, "model")),
            w1_pred=NamedSharding(mesh, P(None, "model")),
            b1=NamedSharding(mesh, P("model")),
            w2=NamedSharding(mesh, P("model", None)),
            b2=NamedSharding(mesh, P()),
        )
    else:
        joint = JointWeights(*([NamedSharding(mesh, P())] * 5))

    return RNNTWeights(
        pre_rnn=[lstm_spec(l) for l in weights.pre_rnn],
        post_rnn=[lstm_spec(l) for l in weights.post_rnn],
        embed=NamedSharding(mesh, P()),
        pred_rnn=[lstm_spec(l) for l in weights.pred_rnn],
        joint=joint,
    )
