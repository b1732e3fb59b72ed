"""Offline runtime: bucketing, batching, ordering, accuracy-log round-trip."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp

from rnnt_inference_tpu.config import FeaturizerConfig, RNNTParams
from rnnt_inference_tpu.data.dataset import SampleStore
from rnnt_inference_tpu.models.decoder import greedy_decode
from rnnt_inference_tpu.models.weights import init_weights
from rnnt_inference_tpu.ops.features import log_mel_features
from rnnt_inference_tpu.runtime.harness import (
    eval_accuracy_log,
    hex_to_tokens,
    run_offline,
    tokens_to_hex,
)
from rnnt_inference_tpu.runtime.offline import OfflineRunner
from rnnt_inference_tpu.runtime.qsl import QuerySampleLibrary

SMALL = RNNTParams(
    trans_input_size=240,
    trans_hidden_size=64,
    pred_hidden_size=32,
    joint_hidden_size=32,
    max_res_len=128,
)
CFG = FeaturizerConfig()


def _store(n=6, seed=0):
    return SampleStore.synthetic(
        n=n, seed=seed, min_seconds=0.3, max_seconds=1.5, mean_seconds=0.8
    )


def test_qsl_sort_and_buckets():
    store = _store(8)
    qsl = QuerySampleLibrary(store, CFG, wav_buckets_s=(0.5, 1.0, 1.5))
    order = qsl.sort_desc(np.arange(8))
    lens = qsl.feature_lens[order]
    assert all(lens[i] >= lens[i + 1] for i in range(len(lens) - 1))
    assert qsl.wav_bucket_for(7000) == 8000
    assert qsl.wav_bucket_for(8000) == 8000
    assert qsl.wav_bucket_for(8001) == 16000
    assert qsl.wav_bucket_for(10**9) == 24000  # clamps to largest


def test_offline_matches_individual_decode():
    """Batched+bucketed Offline run must produce the same tokens as decoding
    each sample alone (padding and batch composition are invisible)."""
    store = _store(5)
    w = init_weights(jax.random.PRNGKey(0), SMALL)
    report = run_offline(
        w, store, SMALL, CFG, batch_size=2, warmup=False, accuracy=False
    )
    assert len(report.hypotheses) == 5

    qsl = QuerySampleLibrary(store, CFG)
    for i in range(len(store)):
        wav, lens, _ = qsl.assemble_waveforms([i])
        feats, flens = jax.jit(log_mel_features, static_argnames="cfg")(
            jnp.asarray(wav), jnp.asarray(lens), CFG
        )
        res, res_lens = greedy_decode(w, feats, flens, params=SMALL)
        solo = np.asarray(res)[0, : int(res_lens[0])]
        runner = OfflineRunner(w, SMALL, CFG, batch_size=2)
        # compare against the report's token stream via hypotheses
        from rnnt_inference_tpu.utils.labels import seq_to_sen

        assert report.hypotheses[i] == seq_to_sen(solo, len(solo))


def test_accuracy_log_roundtrip(tmp_path):
    toks = np.array([1, 2, 3, 27, 0], np.int32)
    assert np.array_equal(hex_to_tokens(tokens_to_hex(toks)), toks)

    store = _store(4, seed=1)
    w = init_weights(jax.random.PRNGKey(1), SMALL)
    out = str(tmp_path / "run")
    report = run_offline(w, store, SMALL, CFG, batch_size=4, warmup=False, output_dir=out)
    with open(os.path.join(out, "accuracy_log.json")) as f:
        log = json.load(f)
    assert len(log) == 4
    wer = eval_accuracy_log(
        os.path.join(out, "accuracy_log.json"), report.hypotheses
    )
    assert wer == 0.0  # hypotheses scored against themselves
    with open(os.path.join(out, "summary.json")) as f:
        summary = json.load(f)
    assert summary["samples"] == 4
    assert summary["audio_seconds_per_second"] > 0


def test_packed_result_unpack():
    """Packed int8 result buffer round-trip, incl. lengths > 255 (hi byte)."""
    from rnnt_inference_tpu.runtime.offline import OfflineRunner

    N, cap = 4, 300
    res = np.random.RandomState(0).randint(-1, 29, size=(N, cap)).astype(np.int8)
    lens = np.array([0, 7, 255, 300], np.int32)
    lo = (lens & 0xFF).astype(np.int8)
    hi = (lens >> 8).astype(np.int8)
    packed = np.concatenate([res, lo[:, None], hi[:, None]], axis=1)
    res2, lens2 = OfflineRunner._unpack(packed)
    np.testing.assert_array_equal(res2, res)
    np.testing.assert_array_equal(lens2, lens)


def test_device_qsl_roundtrip_cpu():
    """DeviceQSL staging on CPU devices: batches cover all samples once."""
    store = _store(7, seed=5)
    qsl = QuerySampleLibrary(store, CFG, wav_buckets_s=(1.0, 1.5))
    dqsl = qsl.load_to_device(batch_size=3)
    seen = []
    for wav, lens, rows in dqsl.batches():
        assert wav.shape[0] == 3
        for r, i in enumerate(rows):
            if i >= 0:
                seen.append(int(i))
                assert int(lens[r]) == store.samples[i].shape[0]
    assert sorted(seen) == list(range(7))


def test_offline_precomputed_features_store():
    """Offline run over a kind='features' store (the reference's
    dev-clean-input.pt mode) matches the waveform-mode hypotheses."""
    import jax.numpy as jnp
    from rnnt_inference_tpu.ops.features import log_mel_features

    wave_store = _store(4, seed=9)
    w = init_weights(jax.random.PRNGKey(3), SMALL)
    ref = run_offline(w, wave_store, SMALL, CFG, batch_size=2, warmup=False)

    # precompute features per sample
    feats = []
    fn = jax.jit(log_mel_features, static_argnames="cfg")
    for s in wave_store.samples:
        f, fl = fn(jnp.asarray(s[None]), jnp.asarray([s.shape[0]], np.int32), CFG)
        feats.append(np.asarray(f)[: int(fl[0]), 0, :])
    feat_store = SampleStore(kind="features", samples=feats, transcripts=[""] * 4)

    rep = run_offline(w, feat_store, SMALL, CFG, batch_size=2, warmup=False)
    assert rep.hypotheses == ref.hypotheses


def test_features_store_converter_roundtrip():
    """compute_features_store (the converter's --features path) must produce
    a store whose Offline hypotheses match waveform mode AND match
    per-utterance featurization exactly (batch bucketing is transparent)."""
    import jax.numpy as jnp
    from rnnt_inference_tpu.data.dataset import compute_features_store
    from rnnt_inference_tpu.ops.features import log_mel_features

    wave_store = _store(5, seed=11)
    wave_store.names = [f"utt-{i}.wav" for i in range(5)]
    w = init_weights(jax.random.PRNGKey(4), SMALL)
    ref = run_offline(w, wave_store, SMALL, CFG, batch_size=2, warmup=False)

    feat_store = compute_features_store(wave_store, CFG, batch_size=2)
    assert feat_store.kind == "features"
    assert feat_store.names == wave_store.names

    # exactness vs per-utterance featurization
    fn = jax.jit(log_mel_features, static_argnames="cfg")
    for i, s in enumerate(wave_store.samples):
        f, fl = fn(jnp.asarray(s[None]), jnp.asarray([s.shape[0]], np.int32), CFG)
        np.testing.assert_allclose(
            feat_store.samples[i], np.asarray(f)[: int(fl[0]), 0, :],
            rtol=1e-5, atol=1e-5,
        )

    rep = run_offline(w, feat_store, SMALL, CFG, batch_size=2, warmup=False)
    assert rep.hypotheses == ref.hypotheses


def test_calibration_file_list_filter(tmp_path):
    from rnnt_inference_tpu.data.dataset import SampleStore

    store = _store(4, seed=12)
    store.names = ["a/1.wav", "b/2.wav", "c/3.wav", "d/4.wav"]
    lst = tmp_path / "calib.txt"
    lst.write_text("some-dir/2.wav\n4.wav\n")
    sub = store.filter_by_list(str(lst))
    assert sub.names == ["b/2.wav", "d/4.wav"]
    assert len(sub) == 2
    np.testing.assert_array_equal(sub.samples[0], store.samples[1])
    # save/load keeps names
    p = tmp_path / "s.npz"
    sub.save(str(p))
    back = SampleStore.load(str(p))
    assert back.names == sub.names
