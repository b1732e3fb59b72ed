"""Batched greedy transducer decode, fully on-chip.

The reference drives the symbol loop from host Python / a fused C++ update op
(reference: models/decoder.py:96-212, mlperf_plugins greedy_decode_update).
Here the ENTIRE utterance->tokens path — encoder, per-symbol prediction +
joint, masked state updates, early-exit — is one jitted function whose inner
loop is a ``jax.lax.while_loop``, so no host round-trips happen per symbol.

Mask algebra reproduced exactly (reference: models/decoder.py:125-168):
  update_g = (symbol != BLANK) & (symbols_added != max_symbols_per_step) & ~finish
      -> emit: append symbol, commit prediction state, keep time
  update_f = ~update_g & ~finish
      -> advance time; finish |= time_idx >= f_lens; clamp time to eos;
         reset symbols_added
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from rnnt_inference_tpu.config import RNNTParams
from rnnt_inference_tpu.models import rnnt as model
from rnnt_inference_tpu.models.weights import RNNTWeights


def _pytree_dataclass(cls):
    cls = dataclasses.dataclass(cls)
    fields = [f.name for f in dataclasses.fields(cls)]
    return jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=[])


@_pytree_dataclass
class DecodeState:
    """Everything carried across streaming chunks
    (reference: models/decoder.py:32-78 allocates these per forward)."""

    enc: model.EncoderState
    res: jax.Array  # (N, max_res_len) int32, -1 padded
    res_idx: jax.Array  # (N,) int32, -1 = empty
    pre_g: jax.Array  # (N,) int32 last emitted symbol, SOS initially
    hg: jax.Array  # (PRED_L, N, P)
    cg: jax.Array  # (PRED_L, N, P) f32


def init_decode_state(
    batch: int,
    params: RNNTParams = RNNTParams(),
    enc_dtype=jnp.float32,
    pred_dtype=jnp.float32,
) -> DecodeState:
    P = params.pred_hidden_size
    L = params.pred_num_layers
    return DecodeState(
        enc=model.init_encoder_state(batch, params, enc_dtype),
        # int8: tokens are 0..28, -1 pad — 4x smaller result transfers
        res=jnp.full((batch, params.max_res_len), -1, jnp.int8),
        res_idx=jnp.full((batch,), -1, jnp.int32),
        pre_g=jnp.full((batch,), params.SOS, jnp.int32),
        hg=jnp.zeros((L, batch, P), pred_dtype),
        cg=jnp.zeros((L, batch, P), jnp.float32),
    )


def masked_reset_decode(
    state: DecodeState,
    mask: jax.Array,  # (N,) bool — True = reset that lane
    params: RNNTParams = RNNTParams(),
    keep_res: bool = False,
) -> DecodeState:
    """Zero per-lane encoder+decoder state where mask is True (the
    reference's finish_idx_ masked reset, metadata.cpp:122-143).

    keep_res=True leaves the token buffer and write cursor untouched — the
    sequence-packed Offline path (runtime/packing.py) resets the model
    state at utterance boundaries while tokens of consecutive utterances
    accumulate in the same lane's res buffer.
    """
    m1 = mask[None, :, None]  # for (L, N, H)
    enc = state.enc
    z = lambda a, m: jnp.where(m, jnp.zeros_like(a), a)
    res, res_idx = state.res, state.res_idx
    if not keep_res:
        mr = mask[:, None]  # for (N, R)
        res = jnp.where(mr, jnp.full_like(res, -1), res)
        res_idx = jnp.where(mask, jnp.full_like(res_idx, -1), res_idx)
    return DecodeState(
        enc=model.EncoderState(
            pre_h=z(enc.pre_h, m1),
            pre_c=z(enc.pre_c, m1),
            post_h=z(enc.post_h, m1),
            post_c=z(enc.post_c, m1),
        ),
        res=res,
        res_idx=res_idx,
        pre_g=jnp.where(mask, jnp.full_like(state.pre_g, params.SOS), state.pre_g),
        hg=z(state.hg, m1),
        cg=z(state.cg, m1),
    )


# Which decode-step implementation greedy_decode_chunk uses:
#   "auto"   — pallas fused-step kernel on TPU (the measured winner in every
#              serving regime, round-4 measurement program), XLA while_loop
#              body elsewhere (CPU tests / virtual meshes).
#   "xla" | "pallas" — explicit override (RNNT_DECODE_IMPL env or
#              set_decode_impl), same trace-time contract as
#              ops.lstm._LSTM_IMPL.
# A third schedule (NeMo-style label-looping, arXiv:2406.06220) was built
# and measured in rounds 3-4: token-exact, but SLOWER in every regime —
# dense Offline -5..-11%, burst cap-30 -35%, Server cadence -13%
# (docs/PERFORMANCE.md "Label-looping decode").  Deleted per the
# keep-winners rule; the perf log retains the design + numbers.
import os as _os

_DECODE_IMPL = _os.environ.get("RNNT_DECODE_IMPL", "auto")


def set_decode_impl(impl: str) -> None:
    global _DECODE_IMPL
    assert impl in ("auto", "xla", "pallas")
    _DECODE_IMPL = impl


# While-body unroll depth (both bodies). Token-exact at ANY depth: every
# update in the body is finish-gated, so extra applications to finished
# lanes are no-ops — unrolling only amortizes the loop-cond all-reduce and
# per-trip overhead around the compute. 2 measured +0.5% on the packed
# cap-1 headline (round 5); the env knob exists to A/B other depths.
_DECODE_UNROLL = max(1, int(_os.environ.get("RNNT_DECODE_UNROLL", "2")))


def _unrolled(body):
    def loop_body(carry):
        for _ in range(_DECODE_UNROLL):
            carry = body(carry)
        return carry

    return loop_body


def _resolved_impl() -> str:
    if _DECODE_IMPL == "auto":
        return "pallas" if jax.default_backend() == "tpu" else "xla"
    return _DECODE_IMPL


def _pallas_decode_eligible(weights, N: int) -> bool:
    return (
        _resolved_impl() == "pallas"
        and N % 8 == 0
        and (N <= 256 or N % 256 == 0)
    )


def _greedy_decode_chunk_pallas(
    weights: RNNTWeights,
    state: DecodeState,
    f: jax.Array,
    f_lens: jax.Array,
    params: RNNTParams,
    starts=None,
    res_base=None,
    utt_budget: int = 0,
):
    """Pallas fused-step variant of the symbol loop: per iteration ONE
    kernel launch + the fproj gather + the res scatter (ops/decode_pallas.py
    has the design notes).  Token-identical to the XLA body.

    starts/res_base/utt_budget: packed-timeline mode (see
    _greedy_decode_chunk_xla) — the kernel itself is unchanged; the
    boundary resets and the per-utterance token budget are applied in XLA
    around it from the kernel's returned lanes (entering = the time cursor
    advanced into a start frame; update_g = res_idx advanced).  Returns
    (state', res_base') in this mode, plain state otherwise."""
    from rnnt_inference_tpu.ops import decode_pallas as dp

    T2, N, _ = f.shape
    interpret = jax.default_backend() == "cpu"
    eos_idx = jnp.maximum(f_lens - 1, 0)
    finish0 = f_lens == 0
    batch_arange = jnp.arange(N, dtype=jnp.int32)
    max_iters = T2 * (params.max_symbols_per_step + 1) + 1
    packed_mode = starts is not None

    jw = weights.joint
    fproj = jnp.dot(
        f.astype(jw.w1_trans.dtype), jw.w1_trans, preferred_element_type=jnp.float32
    )  # (T2, N, J) f32
    pw = dp._pad_pred_weights(weights, params)
    P = params.pred_hidden_size

    col = lambda v: v.astype(jnp.int32)[:, None]

    def cond(carry):
        finish, it = carry[7], carry[8]
        return jnp.logical_and(~jnp.all(finish != 0), it < max_iters)

    def body(carry):
        (res, res_idx, pre_g, hg, cg, time_idx, symbols_added, finish, it,
         rb) = carry
        old_res_idx = res_idx
        old_time = time_idx
        fi_proj = jnp.take_along_axis(fproj, time_idx[None], axis=0)[0]
        lanes, hg, cg = dp.decode_step_pallas(
            fi_proj,
            (pre_g, time_idx, symbols_added, res_idx, finish,
             col(f_lens), col(eos_idx)),
            hg, cg, pw, params, interpret=interpret,
        )
        pre_g, time_idx, symbols_added, res_idx, finish, write_idx, symbols = lanes
        if packed_mode and utt_budget > 0:
            # per-utterance token budget (see _greedy_decode_chunk_xla):
            # over-budget emissions keep the decode dynamics (the kernel
            # already committed pre_g/hg) but neither write nor advance the
            # cursor — exactly the standalone decode's drop-past-capacity.
            # utt_budget == 0 means the gate can never bind (packing.py
            # stage() checks frames*cap <= budget for every utterance) and
            # is skipped — rb + 0 would otherwise gate EVERYTHING off.
            can_emit = old_res_idx[:, 0] < rb + utt_budget
            res_idx = jnp.where(can_emit[:, None], res_idx, old_res_idx)
            write_idx = jnp.where(
                can_emit[:, None], write_idx, params.max_res_len
            )
        if not packed_mode:
            res = res.at[batch_arange, write_idx[:, 0]].set(
                symbols[:, 0].astype(res.dtype), mode="drop"
            )
        else:
            new_time = time_idx[:, 0]
            entering = (
                (new_time > old_time[:, 0])
                & (finish[:, 0] == 0)
                & jnp.take_along_axis(starts, new_time[None, :], axis=0)[0]
            )
            pre_g = jnp.where(entering[:, None], params.SOS, pre_g)
            sel_e = entering[None, :, None]
            hg = jnp.where(sel_e, jnp.zeros_like(hg), hg)
            cg = jnp.where(sel_e, jnp.zeros_like(cg), cg)
            res_idx = res_idx + entering[:, None].astype(jnp.int32)
            # ONE merged scatter per iteration: emitting and entering are
            # mutually exclusive per lane (see the XLA body)
            midx = jnp.where(entering, res_idx[:, 0], write_idx[:, 0])
            val = jnp.where(
                entering, jnp.int8(PACK_BOUNDARY),
                symbols[:, 0].astype(res.dtype),
            )
            res = res.at[batch_arange, midx].set(val, mode="drop")
            rb = jnp.where(entering, res_idx[:, 0], rb)
        return (res, res_idx, pre_g, hg, cg, time_idx, symbols_added, finish,
                it + 1, rb)

    carry0 = (
        state.res,
        col(state.res_idx),
        col(state.pre_g),
        dp.pad_state(state.hg, P),
        dp.pad_state(state.cg, P),
        jnp.zeros((N, 1), jnp.int32),
        jnp.zeros((N, 1), jnp.int32),
        col(finish0),
        jnp.int32(0),
        res_base if packed_mode else jnp.zeros((N,), jnp.int32),
    )
    # Unrolled (default 2x) — same finish-gated-no-op argument as the XLA
    # body; divides the loop-cond all-reduce and trip overhead around the
    # fused kernel by the depth.
    (res, res_idx, pre_g, hg, cg, _t, _s, _f, _it, rb) = jax.lax.while_loop(
        cond, _unrolled(body), carry0
    )
    out = DecodeState(
        enc=state.enc,
        res=res,
        res_idx=res_idx[:, 0],
        pre_g=pre_g[:, 0],
        hg=dp.unpad_state(hg, P),
        cg=dp.unpad_state(cg, P),
    )
    return (out, rb) if packed_mode else out


def greedy_decode_chunk(
    weights: RNNTWeights,
    state: DecodeState,
    f: jax.Array,
    f_lens: jax.Array,
    params: RNNTParams = RNNTParams(),
) -> DecodeState:
    """Run the symbol loop over one already-encoded chunk.

    f: {T2, N, 1024} encoder output, f_lens: {N} valid POST-stack frames.
    """
    if _pallas_decode_eligible(weights, f.shape[1]):
        return _greedy_decode_chunk_pallas(weights, state, f, f_lens, params)
    return _greedy_decode_chunk_xla(weights, state, f, f_lens, params)


# Utterance-boundary marker in packed res buffers (runtime/packing.py): res
# is int8 with tokens 0..28 and -1 padding, so -2 is free.
PACK_BOUNDARY = -2


def greedy_decode_chunk_packed(
    weights: RNNTWeights,
    state: DecodeState,
    f: jax.Array,
    f_lens: jax.Array,
    params: RNNTParams,
    starts: jax.Array,
    res_base: jax.Array,
    utt_budget: int,
):
    """Packed-timeline symbol loop (starts-aware, budget-gated).

    Uses the XLA while-loop body, NOT the fused Pallas step: measured
    round 5, the Pallas step + XLA-side boundary logic scored 63,078
    audio-s/s on the packed cap-1 headline vs 64,582 for the XLA body —
    the packed mode's per-iteration boundary/budget ops (starts gather,
    (L,N,PG) state resets, marker scatter, budget wheres) fuse into the
    XLA body for free but run as standalone ops between kernel launches
    in the Pallas variant, and at N=1024 the step kernel's launch-overhead
    advantage is already thin.  RNNT_DECODE_IMPL=pallas still overrides
    (token-exact by test) for re-measurement if the kernel ever grows
    native starts support.  Returns (state', res_base')."""
    if _DECODE_IMPL == "pallas" and _pallas_decode_eligible(weights, f.shape[1]):
        return _greedy_decode_chunk_pallas(
            weights, state, f, f_lens, params,
            starts=starts, res_base=res_base, utt_budget=utt_budget,
        )
    return _greedy_decode_chunk_xla(
        weights, state, f, f_lens, params,
        starts=starts, res_base=res_base, utt_budget=utt_budget,
    )


def _greedy_decode_chunk_xla(
    weights: RNNTWeights,
    state: DecodeState,
    f: jax.Array,
    f_lens: jax.Array,
    params: RNNTParams = RNNTParams(),
    starts=None,
    res_base=None,
    utt_budget: int = 0,
):
    """The XLA while_loop decode body.

    starts (optional {T2, N} bool) marks packed utterance-start frames
    (runtime/packing.py): advancing INTO a start frame resets the lane's
    prediction state to exactly what a standalone decode would begin with
    (pre_g=SOS, hg=cg=0; symbols_added is already 0 after an advance) and
    writes a PACK_BOUNDARY marker into res so the host can split the
    lane's accumulated tokens per utterance.  starts[0] is never entered
    by an advance, so the first utterance needs no marker — lanes begin
    fresh.  With starts=None the body is the plain single-utterance-per-
    lane chunk decode.

    res_base/utt_budget (packed mode only): per-utterance token budget.
    res_base {N} int32 is each lane's marker position for the CURRENT
    utterance (-1 before the first); an emission may write/advance only
    while res_idx < res_base + utt_budget, i.e. each utterance keeps its
    first utt_budget emissions — exactly the standalone decode's
    drop-past-capacity truncation (write_idx OOB drop + clamped res_lens),
    which harvest() already mirrors with seg[:max_res_len].  Decode
    DYNAMICS (state commits, time advance) are unchanged by the gate, as
    in the standalone path.  This lets the packed res buffer be sized
    Σ_utts (min(frames·cap, budget)+1)+1 per lane instead of
    T·cap — the round-5 bisection measured the oversized carried buffer
    costing ~17% of the whole rep at cap=30 (per-iteration scatter cost
    scales with the carried buffer).  Returns (state', res_base') in
    packed mode, plain state otherwise.
    """
    T2, N, _ = f.shape
    eos_idx = jnp.maximum(f_lens - 1, 0)
    finish0 = f_lens == 0
    batch_arange = jnp.arange(N, dtype=jnp.int32)
    max_iters = T2 * (params.max_symbols_per_step + 1) + 1

    # Hoist the joint's transcription projection out of the symbol loop:
    # ONE (T2*N, 1024)@(1024, 512) MXU matmul here replaces a per-iteration
    # (N, 1024)@(1024, 512) matmul + wide gather inside the loop.  (The
    # reference cannot do this — its AMX joint fuses both projections,
    # modeling_rnnt.py:268-283; on TPU the precompute is ~0.2 ms while the
    # in-loop version costs it ~350 times.)
    jw = weights.joint
    fproj = jnp.dot(
        f.astype(jw.w1_trans.dtype), jw.w1_trans, preferred_element_type=jnp.float32
    )  # (T2, N, J) f32

    packed_mode = starts is not None

    def cond(carry):
        finish, it = carry[7], carry[8]
        return jnp.logical_and(~jnp.all(finish), it < max_iters)

    def body(carry):
        (res, res_idx, pre_g, hg, cg, time_idx, symbols_added, finish, it,
         rb) = carry
        # current frame's precomputed joint projection per lane
        fi_proj = jnp.take_along_axis(fproj, time_idx[None, :, None], axis=0)[0]
        # prediction is always computed from the *committed* state; it is only
        # committed for lanes that emit (reference: models/decoder.py:127,147-151)
        g, hg_new, cg_new = model.prediction_step(weights, pre_g, hg, cg, params)
        y = (
            fi_proj
            + jnp.dot(
                g.astype(jw.w1_pred.dtype), jw.w1_pred,
                preferred_element_type=jnp.float32,
            )
            + jw.b1.astype(jnp.float32)
        )
        y = jnp.maximum(y, 0.0).astype(jw.w2.dtype)
        y = (
            jnp.dot(y, jw.w2, preferred_element_type=jnp.float32)
            + jw.b2.astype(jnp.float32)
        )
        symbols = jnp.argmax(y, axis=-1).astype(jnp.int32)

        update_g = (
            (symbols != params.BLANK)
            & (symbols_added != params.max_symbols_per_step)
            & ~finish
        )
        # 4.1-4.3: emit (in packed mode the cursor advance/write is gated by
        # the per-utterance budget; dynamics below stay on update_g).  In
        # packed mode the token write itself is DEFERRED and merged with the
        # boundary-marker write into ONE scatter per iteration (emitting and
        # entering are mutually exclusive per lane) — scatters are the
        # iteration's serial bottleneck on TPU (cost scales with the carried
        # buffer width, round-5 bisection).
        adv = update_g
        if packed_mode and utt_budget > 0:
            adv = update_g & (res_idx < rb + utt_budget)
        res_idx = res_idx + adv.astype(jnp.int32)
        write_idx = jnp.where(adv, res_idx, params.max_res_len)  # OOB -> drop
        if not packed_mode:
            res = res.at[batch_arange, write_idx].set(
                symbols.astype(res.dtype), mode="drop"
            )
        symbols_added = symbols_added + update_g.astype(jnp.int32)
        pre_g = jnp.where(update_g, symbols, pre_g)
        sel = update_g[None, :, None]
        hg = jnp.where(sel, hg_new, hg)
        cg = jnp.where(sel, cg_new, cg)

        # 5.1-5.4: advance time
        update_f = ~update_g & ~finish
        new_time = time_idx + update_f.astype(jnp.int32)
        finish = finish | (new_time >= f_lens)
        new_time = jnp.minimum(new_time, eos_idx)
        if packed_mode:
            # packed timeline: crossing into an utterance-start frame
            entering = (
                update_f
                & ~finish
                & (new_time > time_idx)
                & jnp.take_along_axis(starts, new_time[None, :], axis=0)[0]
            )
            pre_g = jnp.where(entering, params.SOS, pre_g)
            sel_e = entering[None, :, None]
            hg = jnp.where(sel_e, jnp.zeros_like(hg), hg)
            cg = jnp.where(sel_e, jnp.zeros_like(cg), cg)
            res_idx = res_idx + entering.astype(jnp.int32)
            midx = jnp.where(entering, res_idx, write_idx)
            val = jnp.where(
                entering, jnp.int8(PACK_BOUNDARY), symbols.astype(res.dtype)
            )
            res = res.at[batch_arange, midx].set(val, mode="drop")
            rb = jnp.where(entering, res_idx, rb)
        time_idx = new_time
        symbols_added = jnp.where(update_f, 0, symbols_added)
        return (res, res_idx, pre_g, hg, cg, time_idx, symbols_added, finish,
                it + 1, rb)

    carry0 = (
        state.res,
        state.res_idx,
        state.pre_g,
        state.hg,
        state.cg,
        jnp.zeros((N,), jnp.int32),
        jnp.zeros((N,), jnp.int32),
        finish0,
        jnp.int32(0),
        res_base if packed_mode else jnp.zeros((N,), jnp.int32),
    )
    # Unrolled body (default 2x): the XLA while body is per-iteration
    # overhead-bound (round-2 decode ablation: ~31 us of op-launch gaps
    # around ~19 us of compute at N=512), and every update in the body is
    # ~finish-gated, so applying it to a finished lane is a no-op — N
    # applications per trip are token-exact while dividing the cond/loop
    # overhead (2x measured +0.5% on the packed cap-1 headline).
    (res, res_idx, pre_g, hg, cg, _t, _s, _f, _it, rb) = jax.lax.while_loop(
        cond, _unrolled(body), carry0
    )
    out = DecodeState(
        enc=state.enc, res=res, res_idx=res_idx, pre_g=pre_g, hg=hg, cg=cg
    )
    return (out, rb) if packed_mode else out


def decode_chunk(
    weights: RNNTWeights,
    state: DecodeState,
    x: jax.Array,
    x_lens: jax.Array,
    params: RNNTParams = RNNTParams(),
) -> DecodeState:
    """Encode one feature chunk and decode it: the streaming unit of work."""
    f, enc = model.transcription(weights, x, x_lens, state.enc, params)
    f_lens = -(-x_lens // params.stack_time_factor)  # ceil, matches decoder.py:119
    state = dataclasses.replace(state, enc=enc)
    return greedy_decode_chunk(weights, state, f, f_lens, params)


@functools.partial(jax.jit, static_argnames=("params", "split_len"))
def greedy_decode(
    weights: RNNTWeights,
    x: jax.Array,
    x_lens: jax.Array,
    params: RNNTParams = RNNTParams(),
    split_len: int = -1,
) -> Tuple[jax.Array, jax.Array]:
    """Full-utterance batched greedy decode.

    x: {T, N, 240} features, x_lens: {N} valid frames.
    split_len > 0 streams the encoder in fixed chunks carrying LSTM state
    (reference: models/decoder.py:80-93).
    Returns (res {N, max_res_len} int32 -1-padded, res_lens {N} int32).
    """
    T, N, _ = x.shape
    enc_dtype = weights.pre_rnn[0].w_ih.dtype
    pred_dtype = weights.pred_rnn[0].w_ih.dtype
    state = init_decode_state(N, params, enc_dtype, pred_dtype)
    x_lens = x_lens.astype(jnp.int32)

    if split_len == -1:
        state = decode_chunk(weights, state, x, x_lens, params)
    else:
        # lax.scan over fixed-size chunks: ONE compiled chunk program
        # regardless of T (a Python loop would inline T/split_len copies —
        # at the reference's Offline split_len=2 with T~1500 that is ~750
        # programs, uncompilable in practice).  Chunks with xi_lens == 0
        # are no-ops for that lane, so the trailing pad chunk is harmless.
        n_chunks = -(-T // split_len)
        pad_t = n_chunks * split_len - T
        xc = jnp.pad(x, ((0, pad_t), (0, 0), (0, 0))).reshape(
            n_chunks, split_len, N, x.shape[2]
        )
        starts = jnp.arange(n_chunks, dtype=jnp.int32) * split_len
        chunk_lens = jnp.clip(
            x_lens[None, :] - starts[:, None], 0, split_len
        ).astype(jnp.int32)

        def step(st, inp):
            xi, xi_lens = inp
            return decode_chunk(weights, st, xi, xi_lens, params), None

        state, _ = jax.lax.scan(step, state, (xc, chunk_lens))
    # res_idx counts every emission, including ones dropped past the static
    # buffer capacity — clamp the reported length to what res actually holds
    return state.res, jnp.minimum(state.res_idx + 1, params.max_res_len)
