"""Server scenario: slot-based dynamic batching with device-resident state.

TPU-native redesign of the reference ServerSUT pipeline (SURVEY §3.2;
reference: csrc/torch_sut.cpp:354-571, csrc/metadata.cpp:88-194):

  - The reference keeps a fixed-capacity slot batch (PipelineState): a
    persistent feature buffer F {T, N, C}, per-slot LSTM/decode state, and a
    finish mask; producers featurize new arrivals and the consumer refills
    ONLY finished slots, encodes a split_len window per slot AT EACH SLOT'S
    OWN offset, decodes, and responds early for finished slots.
  - Here the whole slot state is ONE pytree resident in HBM, and refill /
    window-gather / encode+decode-chunk / finish-detect are jitted
    functions with static shapes.  The host scheduler only moves sample
    payloads in and token results out.

Chunked streaming reuses the exact decode-chunk semantics of the Offline
path (models/decoder.py), so Server and Offline produce identical tokens.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rnnt_inference_tpu.config import FeaturizerConfig, RNNTParams
from rnnt_inference_tpu.models import rnnt as model
from rnnt_inference_tpu.models.decoder import (
    DecodeState,
    decode_chunk,
    init_decode_state,
)
from rnnt_inference_tpu.models.weights import RNNTWeights


def _pytree_dataclass(cls):
    cls = dataclasses.dataclass(cls)
    fields = [f.name for f in dataclasses.fields(cls)]
    return jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=[])


@_pytree_dataclass
class ServerState:
    """Device-resident slot batch (the reference PipelineState,
    metadata.hpp:84-114)."""

    F: jax.Array  # {T_max, N, C} feature buffer
    F_lens: jax.Array  # {N} int32 total frames per slot (0 = empty slot)
    offsets: jax.Array  # {N} int32 frames already consumed
    active: jax.Array  # {N} bool slot occupied
    decode: DecodeState  # carried encoder+decoder state per slot


def init_server_state(
    slots: int,
    max_frames: int,
    params: RNNTParams = RNNTParams(),
    cfg: FeaturizerConfig = FeaturizerConfig(),
    enc_dtype=jnp.float32,
    pred_dtype=jnp.float32,
) -> ServerState:
    return ServerState(
        F=jnp.zeros((max_frames, slots, cfg.out_feat), jnp.float32),
        F_lens=jnp.zeros((slots,), jnp.int32),
        offsets=jnp.zeros((slots,), jnp.int32),
        active=jnp.zeros((slots,), bool),
        decode=init_decode_state(slots, params, enc_dtype, pred_dtype),
    )


def _masked_reset_decode(state: DecodeState, mask: jax.Array, params: RNNTParams) -> DecodeState:
    """Zero per-slot decoder+encoder state where mask is True (the reference's
    finish_idx_ masked reset, metadata.cpp:122-143).  Shared algebra lives in
    models/decoder.py — slots clear their token buffers on reset (keep_res
    False), unlike the packed Offline path which accumulates them."""
    from rnnt_inference_tpu.models.decoder import masked_reset_decode

    return masked_reset_decode(state, mask, params, keep_res=False)


def server_insert(
    state: ServerState,
    feats: jax.Array,  # {T_new, K, C} padded feature batch of new samples
    feat_lens: jax.Array,  # {K} int32 (0 => no sample in that column)
    slot_ids: jax.Array,  # {K} int32 target slots (unique)
    params: RNNTParams = RNNTParams(),
) -> ServerState:
    """Place K new samples into (free) slots: write their features, reset the
    slots' decode state, activate them.  Jitted, static K."""
    T_new = feats.shape[0]
    K = feat_lens.shape[0]
    valid = feat_lens > 0

    # route invalid columns to a dummy out-of-range slot -> dropped by scatter
    N = state.F.shape[1]
    safe_slots = jnp.where(valid, slot_ids, N)
    F = state.F.at[:T_new, safe_slots, :].set(feats, mode="drop")
    # zero the tail beyond T_new for refilled slots
    tail_mask = (jnp.arange(state.F.shape[0]) >= T_new)[:, None, None] & (
        jnp.zeros((1, N, 1), bool).at[0, safe_slots, 0].set(valid, mode="drop")
    )
    F = jnp.where(tail_mask, 0.0, F)

    F_lens = state.F_lens.at[safe_slots].set(feat_lens, mode="drop")
    offsets = state.offsets.at[safe_slots].set(0, mode="drop")
    active = state.active.at[safe_slots].set(valid, mode="drop")

    reset_mask = jnp.zeros((N,), bool).at[safe_slots].set(valid, mode="drop")
    decode = _masked_reset_decode(state.decode, reset_mask, params)
    return ServerState(F=F, F_lens=F_lens, offsets=offsets, active=active, decode=decode)


def server_step(
    weights: RNNTWeights,
    state: ServerState,
    split_len: int,
    params: RNNTParams = RNNTParams(),
) -> Tuple[ServerState, jax.Array]:
    """One streaming step: gather each slot's next split_len-frame window at
    its own offset (metadata.cpp:171-194), encode+decode the chunk, advance
    offsets.  Returns (state', finished {N} bool = slots that just completed).
    """
    Tmax, N, C = state.F.shape
    # per-slot window gather
    t_idx = state.offsets[None, :] + jnp.arange(split_len, dtype=jnp.int32)[:, None]
    t_idx = jnp.minimum(t_idx, Tmax - 1)
    window = jnp.take_along_axis(state.F, t_idx[:, :, None], axis=0)  # {split, N, C}
    remaining = jnp.maximum(state.F_lens - state.offsets, 0)
    w_lens = jnp.minimum(remaining, split_len) * state.active

    decode = decode_chunk(weights, state.decode, window, w_lens, params)
    offsets = state.offsets + w_lens
    finished = state.active & (offsets >= state.F_lens)
    active = state.active & ~finished
    return (
        ServerState(
            F=state.F, F_lens=state.F_lens, offsets=offsets, active=active, decode=decode
        ),
        finished,
    )


def server_multi_step(
    weights: RNNTWeights,
    state: ServerState,
    split_len: int,
    k: int,
    params: RNNTParams = RNNTParams(),
) -> Tuple[ServerState, jax.Array]:
    """k streaming steps fused into ONE jitted program.

    Per-dispatch host overhead (tens of ms on relayed backends) would
    otherwise dominate the ~2-3 ms device cost of a single step.  The
    returned mask is the OR of the k per-step finish masks; finished slots
    stay inert (w_lens=0 steps don't touch their results) until the host
    extracts and refills them.
    """
    fin_acc = jnp.zeros_like(state.active)
    for _ in range(k):
        state, fin = server_step(weights, state, split_len, params)
        fin_acc = fin_acc | fin
    return state, fin_acc


class ServerRunner:
    """Host-side driver around the jitted slot pipeline.

    Mirrors the reference consumer thread (torch_sut.cpp:470-540): refill
    free slots from the arrival queue, run streaming steps, respond finished
    slots; `response_size` controls how many finished slots we wait for
    before extracting results (stop_size_, metadata.cpp:158-162).
    """

    def __init__(
        self,
        weights: RNNTWeights,
        params: RNNTParams = RNNTParams(),
        cfg: FeaturizerConfig = FeaturizerConfig(),
        slots: int = 128,
        split_len: int = 24,
        max_frames: Optional[int] = None,
        insert_batch: int = 8,
        steps_per_dispatch: int = 4,
    ):
        self.weights = weights
        self.params = params
        self.cfg = cfg
        self.slots = slots
        self.split_len = split_len
        self.max_frames = max_frames or cfg.out_frames(int(15.0 * cfg.sample_rate))
        # round max_frames up so windows never straddle the buffer end
        self.max_frames = -(-self.max_frames // split_len) * split_len
        self.insert_batch = insert_batch
        self.steps_per_dispatch = steps_per_dispatch

        from rnnt_inference_tpu.runtime.qsl import DEFAULT_WAV_BUCKETS_S

        self.wav_buckets = tuple(
            int(s * cfg.sample_rate) for s in sorted(DEFAULT_WAV_BUCKETS_S)
        )

        enc_dtype = weights.pre_rnn[0].w_ih.dtype
        pred_dtype = weights.pred_rnn[0].w_ih.dtype
        self.state = init_server_state(
            slots, self.max_frames, params, cfg, enc_dtype, pred_dtype
        )
        self.free_slots = list(range(slots))
        self.slot_sample: dict = {}  # slot -> sample id

        from rnnt_inference_tpu.ops.features import log_mel_features

        self._featurize = jax.jit(
            lambda wav, lens: log_mel_features(wav, lens, cfg)
        )
        self._insert = jax.jit(
            lambda st, f, fl, si: server_insert(st, f, fl, si, params)
        )
        self._step = jax.jit(
            lambda w, st: server_multi_step(
                w, st, split_len, steps_per_dispatch, params
            )
        )

    def _wav_bucket(self, s: int) -> int:
        for b in self.wav_buckets:
            if b >= s:
                return b
        return self.wav_buckets[-1]

    def warmup(self) -> float:
        """Pre-compile one insert shape per wav bucket plus the step fn
        (the reference's dummy-sample warmup analog, csrc/rnnt_qsl.cpp:136-147)."""
        import time

        t0 = time.time()
        for b in self.wav_buckets:
            self.insert_samples([np.zeros(b, np.float32)], [-1])
            for _ in range(self.max_frames // self.split_len + 2):
                if not self.n_active:
                    break
                finished = self.step()
                if len(finished):
                    self.extract(finished)
        return time.time() - t0

    def insert_samples(self, wavs: List[np.ndarray], sample_ids: List[int]) -> None:
        """Featurize up to insert_batch new samples and place them in slots."""
        assert len(wavs) <= len(self.free_slots)
        K = self.insert_batch
        S = max(int(w.shape[0]) for w in wavs)
        # pad to the wav bucket ladder: one compiled featurizer shape per
        # bucket (compile cost on remote-compile TPU backends is minutes per
        # shape — unbounded shape variety would be pathological)
        S = self._wav_bucket(S)
        wav = np.zeros((K, S), np.float32)
        lens = np.zeros((K,), np.int32)
        for r, w in enumerate(wavs):
            wav[r, : w.shape[0]] = w
            lens[r] = w.shape[0]
        feats, feat_lens = self._featurize(jnp.asarray(wav), jnp.asarray(lens))
        # bucket padding can featurize past the slot buffer; crop (the extra
        # frames are zero/invalid — true lengths come from the wav lens)
        feats = feats[: self.max_frames]
        feat_lens = jnp.minimum(feat_lens, self.max_frames)
        feat_lens = jnp.where(jnp.arange(K) < len(wavs), feat_lens, 0)

        slot_ids = np.full((K,), self.slots, np.int32)
        for r in range(len(wavs)):
            slot = self.free_slots.pop(0)
            slot_ids[r] = slot
            self.slot_sample[slot] = sample_ids[r]
        self.state = self._insert(
            self.state, feats, feat_lens, jnp.asarray(slot_ids)
        )

    def step(self) -> np.ndarray:
        """One streaming step; returns indices of slots that just finished.
        Synchronous (host readback per step) — convenient for tests/warmup."""
        return np.nonzero(np.asarray(self.step_async()))[0]

    def step_async(self):
        """Dispatch one streaming step WITHOUT host synchronization; returns
        the device-resident finished mask.

        Per-step host readbacks serialize the pipeline on backends with high
        host round-trip latency (~50 ms on relayed TPU: measured 31 s p99 at
        30 QPS before this).  Callers keep a small in-flight window of masks
        and read back the oldest while newer steps compute — finished slots
        are safe to extract later because steps with w_lens=0 never modify a
        finished slot's result buffer."""
        self.state, finished = self._step(self.weights, self.state)
        return finished

    def extract(self, finished_slots) -> List[Tuple[int, np.ndarray]]:
        """Pull token results for finished slots and free them."""
        res = np.asarray(self.state.decode.res[np.asarray(finished_slots)])
        res_lens = np.minimum(
            np.asarray(self.state.decode.res_idx[np.asarray(finished_slots)]) + 1,
            self.params.max_res_len,
        )
        out = []
        for k, slot in enumerate(finished_slots):
            sample_id = self.slot_sample.pop(int(slot))
            out.append((sample_id, res[k, : res_lens[k]].astype(np.int32)))
            self.free_slots.append(int(slot))
        return out

    @property
    def n_active(self) -> int:
        return self.slots - len(self.free_slots)
