"""Sequence-packed Offline path (runtime/packing.py): token-exactness vs the
standalone decode, plan correctness, and the harness integration.

The packed path composes three independently-tested mechanisms — bucketed
featurization, masked state resets, split-chunk streaming — so the contract
here is END-TO-END exactness: for every utterance, packed tokens must equal
the tokens of a standalone greedy_decode, bit for bit, regardless of lane
assignment, chunk alignment, partial final chunks, or neighbors.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rnnt_inference_tpu.config import FeaturizerConfig, RNNTParams
from rnnt_inference_tpu.data.dataset import SampleStore
from rnnt_inference_tpu.models.decoder import greedy_decode
from rnnt_inference_tpu.models.weights import init_weights
from rnnt_inference_tpu.ops.features import log_mel_features
from rnnt_inference_tpu.runtime.harness import run_offline
from rnnt_inference_tpu.runtime.packing import (
    PackedOfflineRunner,
    make_pack_plan,
)
from rnnt_inference_tpu.runtime.qsl import QuerySampleLibrary

SMALL = RNNTParams(
    trans_input_size=240,
    trans_hidden_size=64,
    pred_hidden_size=32,
    joint_hidden_size=32,
    max_res_len=128,
)
CFG = FeaturizerConfig()


def _store(n=10, seed=0, max_seconds=2.5):
    return SampleStore.synthetic(
        n=n, seed=seed, min_seconds=0.3, max_seconds=max_seconds,
        mean_seconds=1.0,
    )


def test_pack_plan_shape_and_coverage():
    lens = np.array([33, 17, 64, 5, 48, 1, 16])
    plan = make_pack_plan(lens, n_lanes=3, chunk_frames=16)
    # every utterance placed exactly once, frames conserved
    assert sorted(e[0] for e in plan.entries) == list(range(7))
    assert plan.chunk_lens.sum() == lens.sum()
    assert plan.resets.sum() == 7
    # balanced: C within one max-utterance of the optimum
    opt = int(np.ceil((-(-lens // 16)).sum() / 3))
    assert plan.n_chunks <= opt + int(-(-lens.max() // 16))
    # per-entry layout is chunk-aligned and in-bounds
    for _i, lane, c0, F in plan.entries:
        nc = -(-F // 16)
        assert c0 + nc <= plan.n_chunks
        assert plan.resets[c0, lane]
    assert 0.0 < plan.packing_efficiency <= 1.0


def _standalone_tokens(w, store, params):
    """Decode each utterance alone (batch of 1, unpadded)."""
    toks = []
    for s in store.samples:
        wav = jnp.asarray(s[None, :])
        lens = jnp.asarray([s.shape[0]], jnp.int32)
        feats, flens = jax.jit(
            log_mel_features, static_argnames="cfg"
        )(wav, lens, CFG)
        res, rlens = greedy_decode(w, feats, flens, params=params)
        toks.append(np.asarray(res)[0, : int(rlens[0])].astype(np.int32))
    return toks


@pytest.mark.parametrize("n_lanes,chunk_frames", [(3, 16), (2, 8), (5, 32)])
def test_packed_tokens_exact(n_lanes, chunk_frames):
    """Packed decode == standalone decode for every utterance, across lane
    counts and chunk grains (multi-utterance lanes, partial final chunks,
    idle tail chunks)."""
    store = _store(9, seed=1)
    w = init_weights(jax.random.PRNGKey(0), SMALL)
    qsl = QuerySampleLibrary(store, CFG, wav_buckets_s=(1.0, 2.0, 3.0))
    runner = PackedOfflineRunner(
        w, SMALL, CFG, n_lanes=n_lanes, chunk_frames=chunk_frames,
        batch_size=4,
    )
    plan = runner.stage(qsl)
    assert plan.packing_efficiency > 0.5
    result = runner.run_device()
    ref = _standalone_tokens(w, store, SMALL)
    assert len(result.tokens) == len(ref)
    for i, (got, want) in enumerate(zip(result.tokens, ref)):
        assert np.array_equal(got, want), (
            f"sample {i}: packed {got} != standalone {want}"
        )


@pytest.mark.parametrize("decode_chunk", [2, 3, 8])
def test_packed_decode_chunking_exact(decode_chunk):
    """The chunked decode scan (PackedOfflineRunner.decode_chunk) must be
    token-identical to standalone decodes for ANY chunk size — including
    tiny chunks that force utterance starts to land EXACTLY on decode-chunk
    boundaries, where the reset+marker is applied between chunks rather
    than by the in-chunk entering path."""
    store = _store(9, seed=2)
    w = init_weights(jax.random.PRNGKey(3), SMALL)
    qsl = QuerySampleLibrary(store, CFG, wav_buckets_s=(1.0, 2.0, 3.0))
    runner = PackedOfflineRunner(
        w, SMALL, CFG, n_lanes=3, chunk_frames=16, batch_size=4,
        decode_chunk=decode_chunk,
    )
    runner.stage(qsl)
    result = runner.run_device()
    ref = _standalone_tokens(w, store, SMALL)
    for i, (got, want) in enumerate(zip(result.tokens, ref)):
        assert np.array_equal(got, want), (
            f"sample {i} (decode_chunk={decode_chunk}): {got} != {want}"
        )


def test_packed_tokens_exact_quant():
    """Same exactness with the int8-quantized encoder (the headline config)."""
    from rnnt_inference_tpu.models.quant import calibrate, quantize_weights

    store = _store(6, seed=2)
    w32 = init_weights(jax.random.PRNGKey(0), SMALL)
    xc = jax.random.normal(jax.random.PRNGKey(1), (16, 4, SMALL.trans_input_size))
    lc = jnp.full((4,), 16, jnp.int32)
    wq = quantize_weights(w32, calibrate(w32, [(xc, lc)], SMALL), SMALL)

    qsl = QuerySampleLibrary(store, CFG, wav_buckets_s=(1.0, 2.0, 3.0))
    runner = PackedOfflineRunner(
        wq, SMALL, CFG, n_lanes=2, chunk_frames=16, batch_size=4
    )
    runner.stage(qsl)
    result = runner.run_device()
    ref = _standalone_tokens(wq, store, SMALL)
    for i, (got, want) in enumerate(zip(result.tokens, ref)):
        assert np.array_equal(got, want), f"sample {i} mismatch"


def test_run_offline_packed_harness():
    """run_offline(packed=True) reports the same hypotheses as the batched
    path plus the packing-efficiency metric."""
    store = _store(7, seed=3)
    w = init_weights(jax.random.PRNGKey(0), SMALL)
    ref = run_offline(
        w, store, SMALL, CFG, batch_size=4, warmup=False,
        wav_buckets_s=(1.0, 2.0, 3.0),
    )
    rep = run_offline(
        w, store, SMALL, CFG, batch_size=4, warmup=False, packed=True,
        chunk_frames=16, wav_buckets_s=(1.0, 2.0, 3.0),
    )
    assert rep.hypotheses == ref.hypotheses
    assert 0.5 < rep.extra["packing_efficiency"] <= 1.0
    assert rep.samples == len(store)


def test_packed_res_capacity_never_truncates():
    """The packed res buffer is sized so no token or marker is dropped even
    when every frame emits the per-frame cap."""
    store = _store(4, seed=4, max_seconds=1.0)
    # bias emission-heavy: cap 3 symbols/frame
    params = dataclasses.replace(SMALL, max_symbols_per_step=3)
    w = init_weights(jax.random.PRNGKey(5), params)
    qsl = QuerySampleLibrary(store, CFG, wav_buckets_s=(1.0,))
    runner = PackedOfflineRunner(
        w, params, CFG, n_lanes=2, chunk_frames=8, batch_size=2
    )
    runner.stage(qsl)
    result = runner.run_device()
    ref = _standalone_tokens(w, store, params)
    for got, want in zip(result.tokens, ref):
        assert np.array_equal(got, want)


def test_offline_native_packed_rules_and_tokens():
    """run_offline_native(packed=True): the packed runner serves under the
    native loadgen clock (VERDICT r4 item 1) — queries cycle over the store
    in whole packed reps, min_query_count is honored, and first-cycle
    tokens equal the plain packed harness run."""
    from rnnt_inference_tpu.runtime.harness import run_offline_native

    store = _store(5, seed=9, max_seconds=1.0)
    w = init_weights(jax.random.PRNGKey(2), SMALL)
    report = run_offline_native(
        w, store, SMALL, CFG, batch_size=4,
        target_qps=10.0, min_query_count=8, min_duration_s=0.0,
        warmup=False, packed=True, chunk_frames=8, decode_chunk=16,
    )
    assert report.extra["timing"] == "native"
    assert report.extra["packed"] is True
    assert report.extra["queries"] == 8
    assert report.extra["completed"] == 8  # 5 + 3 across 2 cycles
    assert report.extra["cycles"] == 2
    assert 0.5 < report.extra["packing_efficiency"] <= 1.0
    assert report.wall_seconds > 0

    ref = run_offline(
        w, store, SMALL, CFG, batch_size=4, warmup=False, packed=True,
        chunk_frames=8, decode_chunk=16,
    )
    assert report.hypotheses == ref.hypotheses


def test_packed_mesh_tokens_exact():
    """PackedOfflineRunner with lanes sharded over a "data" mesh produces
    tokens identical to the single-device run (VERDICT r4 item 1: the
    packed headline mode needs the same multi-chip story as the bucketed
    path it replaced)."""
    from rnnt_inference_tpu.parallel.mesh import make_mesh

    n_dev = len(jax.devices())
    if n_dev < 2:
        pytest.skip("needs a multi-device (virtual CPU) mesh")
    store = _store(12, seed=11, max_seconds=1.5)
    w = init_weights(jax.random.PRNGKey(3), SMALL)
    qsl = QuerySampleLibrary(store, CFG, wav_buckets_s=(1.0, 2.0))
    pk = dict(n_lanes=n_dev, chunk_frames=8, batch_size=n_dev,
              decode_chunk=16)
    r1 = PackedOfflineRunner(w, SMALL, CFG, **pk)
    r1.stage(qsl)
    ref = r1.run_device()

    mesh = make_mesh(n_dev, model_parallel=1)
    rm = PackedOfflineRunner(w, SMALL, CFG, mesh=mesh, **pk)
    with mesh:
        rm.stage(qsl)
        got = rm.run_device()
    assert len(got.tokens) == len(ref.tokens) == len(store)
    for a, b in zip(got.tokens, ref.tokens):
        assert np.array_equal(a, b)


def test_packed_budget_truncation_matches_standalone():
    """When an utterance emits more than max_res_len tokens, the packed
    per-utterance budget gate must keep exactly the FIRST max_res_len
    emissions — the standalone decode's drop-past-capacity truncation
    (decoder.py write_idx OOB drop + clamped res_lens) — while later
    utterances in the same lane decode unaffected."""
    params = dataclasses.replace(
        SMALL, max_res_len=8, max_symbols_per_step=3
    )
    # emission-heavy weights: random joint at cap 3 bursts, so 8 tokens are
    # exceeded quickly
    w = init_weights(jax.random.PRNGKey(5), params)
    store = _store(6, seed=4, max_seconds=1.0)
    qsl = QuerySampleLibrary(store, CFG, wav_buckets_s=(1.0,))
    runner = PackedOfflineRunner(
        w, params, CFG, n_lanes=2, chunk_frames=8, batch_size=2
    )
    runner.stage(qsl)
    result = runner.run_device()
    ref = _standalone_tokens(w, store, params)
    assert any(len(t) == params.max_res_len for t in ref), (
        "test store never hits the budget — raise emission or shrink it"
    )
    for got, want in zip(result.tokens, ref):
        assert np.array_equal(got, want)


def test_packed_pallas_step_matches_xla():
    """The packed decode now routes through the fused Pallas step on TPU
    (greedy_decode_chunk_packed); in interpret mode it must produce tokens
    identical to the XLA while-loop body, boundary resets, markers and
    budget gate included."""
    from rnnt_inference_tpu.models.decoder import set_decode_impl

    params = dataclasses.replace(SMALL, max_res_len=16, max_symbols_per_step=2)
    w = init_weights(jax.random.PRNGKey(6), params)
    store = _store(9, seed=7, max_seconds=1.5)
    qsl = QuerySampleLibrary(store, CFG, wav_buckets_s=(1.0, 2.0))

    def run(impl):
        set_decode_impl(impl)
        try:
            runner = PackedOfflineRunner(
                w, params, CFG, n_lanes=8, chunk_frames=8, batch_size=8
            )
            runner.stage(qsl)
            return runner.run_device().tokens
        finally:
            set_decode_impl("auto")

    tok_x = run("xla")
    tok_p = run("pallas")
    assert len(tok_p) == len(tok_x) == len(store)
    for a, b in zip(tok_p, tok_x):
        assert np.array_equal(a, b)


def test_packed_pallas_step_gate_off_matches_xla():
    """With a budget that can never bind (cap 1: frames*1 <= max_res_len),
    stage() passes utt_budget=0 and BOTH decode impls must skip the gate —
    a regression test for the Pallas packed body gating everything off at
    utt_budget=0 (rb starts at -1, so res_idx < rb + 0 is always False)."""
    from rnnt_inference_tpu.models.decoder import set_decode_impl

    params = dataclasses.replace(SMALL, max_symbols_per_step=1)
    w = init_weights(jax.random.PRNGKey(8), params)
    store = _store(6, seed=12, max_seconds=1.0)
    qsl = QuerySampleLibrary(store, CFG, wav_buckets_s=(1.0,))

    def run(impl):
        set_decode_impl(impl)
        try:
            runner = PackedOfflineRunner(
                w, params, CFG, n_lanes=8, chunk_frames=8, batch_size=8
            )
            runner.stage(qsl)
            assert runner._utt_budget == 0  # cap 1 can never exceed budget
            return runner.run_device().tokens
        finally:
            set_decode_impl("auto")

    tok_x = run("xla")
    tok_p = run("pallas")
    assert sum(len(t) for t in tok_x) > 0, "no emissions — test is vacuous"
    for a, b in zip(tok_p, tok_x):
        assert np.array_equal(a, b)


def test_offline_native_packed_mesh_tokens():
    """run_offline_native(packed=True, mesh=...): the native-clock packed
    serve loop with lanes sharded over "data" completes the same first-cycle
    tokens as the unsharded run (the full product stack: native timing +
    packing + mesh in one path)."""
    from rnnt_inference_tpu.parallel.mesh import make_mesh
    from rnnt_inference_tpu.runtime.harness import run_offline_native

    n_dev = len(jax.devices())
    if n_dev < 2:
        pytest.skip("needs a multi-device (virtual CPU) mesh")
    store = _store(6, seed=13, max_seconds=1.0)
    w = init_weights(jax.random.PRNGKey(4), SMALL)
    kw = dict(batch_size=n_dev, target_qps=10.0, min_query_count=6,
              min_duration_s=0.0, warmup=False, packed=True,
              chunk_frames=8, decode_chunk=16)
    ref = run_offline_native(w, store, SMALL, CFG, **kw)
    mesh = make_mesh(n_dev, model_parallel=1)
    with mesh:
        got = run_offline_native(w, store, SMALL, CFG, mesh=mesh, **kw)
    assert got.extra["packed"] is True and got.extra["timing"] == "native"
    assert got.hypotheses == ref.hypotheses
