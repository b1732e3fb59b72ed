"""Server slot-pipeline: streaming tokens must match Offline exactly, slots
recycle correctly, latency accounting sane."""

import numpy as np
import jax

from rnnt_inference_tpu.config import FeaturizerConfig, RNNTParams
from rnnt_inference_tpu.data.dataset import SampleStore
from rnnt_inference_tpu.models.weights import init_weights
from rnnt_inference_tpu.runtime.harness import run_offline
from rnnt_inference_tpu.runtime.scheduler import poisson_schedule, run_server
from rnnt_inference_tpu.runtime.server import ServerRunner
from rnnt_inference_tpu.utils.labels import seq_to_sen

SMALL = RNNTParams(
    trans_input_size=240,
    trans_hidden_size=64,
    pred_hidden_size=32,
    joint_hidden_size=32,
    max_res_len=128,
)
CFG = FeaturizerConfig()


def test_server_matches_offline_tokens():
    store = SampleStore.synthetic(
        n=7, seed=3, min_seconds=0.3, max_seconds=1.2, mean_seconds=0.7
    )
    w = init_weights(jax.random.PRNGKey(0), SMALL)

    offline = run_offline(w, store, SMALL, CFG, batch_size=4, warmup=False)

    runner = ServerRunner(
        w, SMALL, CFG, slots=4, split_len=4, max_frames=64, insert_batch=2
    )
    metrics, results = run_server(
        runner, store, target_qps=1000.0, realtime=False, max_wall_s=120.0
    )
    assert metrics.completed == len(store)
    for i in range(len(store)):
        hyp = seq_to_sen(results[i], len(results[i]))
        assert hyp == offline.hypotheses[i], f"sample {i} mismatch"


def test_server_slot_recycling():
    store = SampleStore.synthetic(
        n=6, seed=4, min_seconds=0.3, max_seconds=0.8, mean_seconds=0.5
    )
    w = init_weights(jax.random.PRNGKey(1), SMALL)
    runner = ServerRunner(
        w, SMALL, CFG, slots=2, split_len=4, max_frames=32, insert_batch=2
    )
    metrics, results = run_server(
        runner, store, target_qps=1000.0, realtime=False, max_wall_s=120.0
    )
    assert metrics.completed == 6  # 6 samples through 2 slots => 3+ recycles
    assert len(runner.free_slots) == 2
    assert all(len(results[i]) >= 0 for i in range(6))


def test_poisson_schedule():
    arr = poisson_schedule(1000, target_qps=100.0, seed=0)
    assert arr.shape == (1000,)
    assert np.all(np.diff(arr) >= 0)
    # mean inter-arrival ~ 1/qps
    assert abs(np.diff(arr).mean() - 0.01) < 0.002


def test_server_response_size_batching():
    """response_size > 1: responses arrive in groups of >= response_size
    finished slots (except the forced tail drain), and tokens still match
    Offline exactly (the reference's stop_size_, csrc/metadata.cpp:158-162)."""
    store = SampleStore.synthetic(
        n=8, seed=5, min_seconds=0.3, max_seconds=0.8, mean_seconds=0.5
    )
    w = init_weights(jax.random.PRNGKey(0), SMALL)
    offline = run_offline(w, store, SMALL, CFG, batch_size=4, warmup=False)

    runner = ServerRunner(
        w, SMALL, CFG, slots=8, split_len=4, max_frames=64, insert_batch=4
    )
    extract_sizes = []
    orig_extract = runner.extract

    def spy_extract(slots):
        extract_sizes.append(len(slots))
        return orig_extract(slots)

    runner.extract = spy_extract
    metrics, results = run_server(
        runner, store, target_qps=1000.0, realtime=False, max_wall_s=120.0,
        response_size=3,
    )
    assert metrics.completed == len(store)
    for i in range(len(store)):
        hyp = seq_to_sen(results[i], len(results[i]))
        assert hyp == offline.hypotheses[i], f"sample {i} mismatch"
    # every response except the tail-drain ones carries >= response_size slots
    assert extract_sizes, "no responses recorded"
    assert any(s >= 3 for s in extract_sizes)
    assert all(s >= 3 for s in extract_sizes[:-2])


def test_server_min_query_count_loops():
    """min_query_count > n loops queries over the sample set."""
    store = SampleStore.synthetic(
        n=3, seed=6, min_seconds=0.3, max_seconds=0.6, mean_seconds=0.4
    )
    w = init_weights(jax.random.PRNGKey(1), SMALL)
    runner = ServerRunner(
        w, SMALL, CFG, slots=4, split_len=4, max_frames=48, insert_batch=2
    )
    metrics, results = run_server(
        runner, store, target_qps=1000.0, realtime=False, max_wall_s=120.0,
        min_query_count=7,
    )
    assert metrics.completed == 7
    # query q decodes sample q % 3: same tokens
    for q in range(7):
        np.testing.assert_array_equal(results[q], results[q % 3])


def test_validate_report_verdict():
    from rnnt_inference_tpu.runtime.config import TestSettings, validate_report

    st = TestSettings(scenario="Server", target_latency_ms=1000.0,
                      target_latency_percentile=99.0, min_duration_ms=1000.0,
                      min_query_count=10)
    good = dict(completed=20, wall_seconds=2.0, latency_ms_p50=5.0,
                latency_ms_p90=8.0, latency_ms_p99=900.0)
    out = validate_report(st, good)
    assert out["result_validity"] == "VALID" and not out["invalid_reasons"]

    slow = dict(good, latency_ms_p99=1500.0)
    out = validate_report(st, slow)
    assert out["result_validity"] == "INVALID"
    assert any("latency" in r for r in out["invalid_reasons"])

    short = dict(good, wall_seconds=0.5, completed=5)
    out = validate_report(st, short)
    assert len(out["invalid_reasons"]) == 2


def test_qos_deferred_excluded_from_percentiles():
    """Regression: an over-qos_len sample parked until the stream drains
    must not blow the live p99 — its (multi-second park) latency belongs in
    the separate deferred pool (reference: csrc/torch_sut.cpp:384-417)."""
    store = SampleStore.synthetic(
        n=6, seed=4, min_seconds=0.3, max_seconds=1.2, mean_seconds=0.6
    )
    w = init_weights(jax.random.PRNGKey(1), SMALL)
    runner = ServerRunner(
        w, SMALL, CFG, slots=4, split_len=4, max_frames=64, insert_batch=2
    )
    qos_len = 8000  # 0.5 s: defers the longer samples
    n_long = sum(1 for s in store.samples if s.shape[0] > qos_len)
    assert 0 < n_long < len(store)
    metrics, results = run_server(
        runner, store, target_qps=1000.0, realtime=False, max_wall_s=120.0,
        qos_len=qos_len,
    )
    assert metrics.completed == len(store)
    assert len(metrics.deferred_latencies_ms) == n_long
    assert len(metrics.latencies_ms) == len(store) - n_long
    summary = metrics.summary()
    assert summary["deferred_completed"] == n_long
    # live percentiles computed over the live pool only
    import numpy as _np

    assert summary["latency_ms_p99"] == round(
        float(_np.percentile(list(metrics.latencies_ms.values()), 99)), 1
    )


def test_all_deferred_summary_is_json_safe_and_invalid():
    """Degenerate qos_len (every sample deferred): summary must emit None —
    not NaN, which json.dump writes as a non-standard token and which makes
    `nan > gate` silently False — and validate_report must call the run
    INVALID (no live traffic was measured)."""
    import json

    from rnnt_inference_tpu.runtime.config import TestSettings, validate_report
    from rnnt_inference_tpu.runtime.scheduler import ServerMetrics

    m = ServerMetrics()
    m.deferred_latencies_ms = {0: 1500.0, 1: 2500.0}
    m.completed = 2
    m.wall_seconds = 3.0
    s = m.summary()
    assert s["completed_live"] == 0
    assert s["latency_ms_p99"] is None
    json.dumps(s, allow_nan=False)  # strict JSON (raises on bare NaN)
    st = TestSettings(
        scenario="Server", min_query_count=1, min_duration_ms=0.0
    )
    out = validate_report(st, s)
    assert out["result_validity"] == "INVALID"
    assert any("no live" in r for r in out["invalid_reasons"])


def test_server_matches_offline_tokens_quant():
    """The reference serves the QUANT model in Server; the int8 encoder must
    hold the same streaming == non-streaming token equality as bf16 (slot
    windows carry int8 h / f32 c across chunks)."""
    import jax.numpy as jnp

    from rnnt_inference_tpu.models.quant import calibrate, quantize_weights

    store = SampleStore.synthetic(
        n=6, seed=8, min_seconds=0.3, max_seconds=1.2, mean_seconds=0.7
    )
    w32 = init_weights(jax.random.PRNGKey(5), SMALL, dtype=jnp.float32)
    xc = jax.random.normal(jax.random.PRNGKey(6), (32, 4, SMALL.trans_input_size))
    lc = jnp.full((4,), 32, jnp.int32)
    wq = quantize_weights(w32, calibrate(w32, [(xc, lc)], SMALL), SMALL)

    offline = run_offline(wq, store, SMALL, CFG, batch_size=4, warmup=False)

    runner = ServerRunner(
        wq, SMALL, CFG, slots=4, split_len=4, max_frames=64, insert_batch=2
    )
    metrics, results = run_server(
        runner, store, target_qps=1000.0, realtime=False, max_wall_s=120.0
    )
    assert metrics.completed == len(store)
    for i in range(len(store)):
        hyp = seq_to_sen(results[i], len(results[i]))
        assert hyp == offline.hypotheses[i], f"sample {i} mismatch"
