"""Native mini-loadgen (C++ via ctypes): build, schedule, queue, latency."""

import time

import numpy as np
import pytest

from rnnt_inference_tpu.runtime.native import NativeLoadGen, get_lib


pytestmark = pytest.mark.skipif(get_lib() is None, reason="no g++ toolchain")


def test_offline_mode_issues_everything_immediately():
    lg = NativeLoadGen(100, target_qps=0.0, mode="Offline")
    got = []
    while len(got) < 100:
        got.extend(lg.poll(max_n=64, timeout_us=100000))
    assert sorted(got) == list(range(100))
    for i in got:
        lg.complete(i)
    rep = lg.report()
    assert rep["completed"] == 100
    lg.close()


def test_server_mode_poisson_timing():
    qps = 500.0
    n = 200
    lg = NativeLoadGen(n, target_qps=qps, mode="Server", seed=1)
    t0 = time.time()
    got = []
    while len(got) < n and time.time() - t0 < 10:
        ids = lg.poll(max_n=16, timeout_us=10000)
        now = time.time()
        for i in ids:
            lg.complete(i)
        got.extend(ids)
    wall = time.time() - t0
    assert len(got) == n
    # ~200 samples at 500 qps => ~0.4 s schedule; allow generous slack
    assert 0.2 < wall < 5.0
    rep = lg.report()
    assert rep["completed"] == n
    assert rep["latency_ms_p99"] >= rep["latency_ms_p50"] >= 0
    assert abs(rep["qps"] - n / rep["wall_seconds"]) < 5.0  # rounded fields
    lg.close()


def test_server_e2e_with_native_loadgen():
    """Full server pipeline driven by the native issue thread."""
    import jax

    from rnnt_inference_tpu.config import FeaturizerConfig, RNNTParams
    from rnnt_inference_tpu.data.dataset import SampleStore
    from rnnt_inference_tpu.models.weights import init_weights
    from rnnt_inference_tpu.runtime.harness import run_offline
    from rnnt_inference_tpu.runtime.scheduler import run_server_native
    from rnnt_inference_tpu.runtime.server import ServerRunner
    from rnnt_inference_tpu.utils.labels import seq_to_sen

    SMALL = RNNTParams(
        trans_input_size=240,
        trans_hidden_size=64,
        pred_hidden_size=32,
        joint_hidden_size=32,
        max_res_len=128,
    )
    cfg = FeaturizerConfig()
    store = SampleStore.synthetic(
        n=5, seed=7, min_seconds=0.3, max_seconds=1.0, mean_seconds=0.6
    )
    w = init_weights(jax.random.PRNGKey(2), SMALL)
    offline = run_offline(w, store, SMALL, cfg, batch_size=4, warmup=False)

    runner = ServerRunner(w, SMALL, cfg, slots=4, split_len=4, max_frames=64, insert_batch=2)
    report, results = run_server_native(
        runner, store, target_qps=200.0, max_wall_s=60.0
    )
    assert report["completed"] == 5
    for i in range(5):
        assert seq_to_sen(results[i], len(results[i])) == offline.hypotheses[i]


def test_server_native_qos_deferred_with_response_size_completes():
    """Regression: QoS-deferred queries + response_size larger than the
    remaining finishers used to form a circular wait (deferred admission
    required an idle pipeline, but finished slots are only freed by an
    extraction that waited on response_size).  The run must complete and
    every query — deferred included — must get a response."""
    import jax

    from rnnt_inference_tpu.config import FeaturizerConfig, RNNTParams
    from rnnt_inference_tpu.data.dataset import SampleStore
    from rnnt_inference_tpu.models.weights import init_weights
    from rnnt_inference_tpu.runtime.scheduler import run_server_native
    from rnnt_inference_tpu.runtime.server import ServerRunner

    SMALL = RNNTParams(
        trans_input_size=240,
        trans_hidden_size=64,
        pred_hidden_size=32,
        joint_hidden_size=32,
        max_res_len=128,
    )
    cfg = FeaturizerConfig()
    store = SampleStore.synthetic(
        n=5, seed=7, min_seconds=0.3, max_seconds=1.0, mean_seconds=0.6
    )
    w = init_weights(jax.random.PRNGKey(2), SMALL)
    runner = ServerRunner(w, SMALL, cfg, slots=4, split_len=4, max_frames=64,
                          insert_batch=2)
    # qos_len of 0.5 s defers the longer samples; response_size 9 > n
    report, results = run_server_native(
        runner, store, target_qps=200.0, max_wall_s=30.0,
        qos_len=8000, response_size=9,
    )
    assert report["completed"] == 5
    assert sorted(results) == list(range(5))


def test_single_stream_mode_issue_after_complete():
    """Mode 2: the next query is issued only after the previous completes."""
    n = 10
    lg = NativeLoadGen(n, target_qps=0.0, mode="SingleStream")
    got = []
    t0 = time.time()
    while len(got) < n and time.time() - t0 < 10:
        ids = lg.poll(max_n=8, timeout_us=100000)
        # issue-after-complete: never more than one query outstanding
        assert len(ids) <= 1
        for q in ids:
            time.sleep(0.002)
            lg.complete(q)
        got.extend(ids)
    assert got == list(range(n))
    rep = lg.report()
    assert rep["completed"] == n
    assert rep["latency_ms_p50"] >= 2.0  # the sleep is the floor
    lg.close()


def test_min_query_count_loops_sample_set():
    """min_query_count > n_samples cycles queries over the set (loadgen rule)."""
    lg = NativeLoadGen(4, target_qps=0.0, mode="Offline", min_query_count=10)
    got = []
    while len(got) < 10:
        got.extend(lg.poll(max_n=16, timeout_us=100000))
    assert sorted(got) == list(range(10))
    assert [lg.sample_of(q) for q in sorted(got)] == [0, 1, 2, 3, 0, 1, 2, 3, 0, 1]
    for q in got:
        lg.complete(q)
    assert lg.drained
    lg.close()


def test_server_min_duration_keeps_issuing():
    """Server mode keeps issuing past min_query_count until min_duration."""
    lg = NativeLoadGen(
        2, target_qps=200.0, mode="Server", min_query_count=1, min_duration_s=0.2
    )
    got = []
    t0 = time.time()
    while not lg.done_issuing and time.time() - t0 < 5:
        got.extend(lg.poll(max_n=16, timeout_us=20000))
    got.extend(lg.poll(max_n=64, timeout_us=20000))
    # ~200 qps for >= 0.2 s => ~40 queries, far more than min_query_count
    assert len(got) >= 10
    for q in got:
        lg.complete(q)
    lg.close()


def test_server_latency_charged_from_scheduled_arrival():
    """Under overload (consumer stalls), latency must grow by the stall even
    though the queue backpressures the issuer: charged from scheduled time."""
    n = 50
    lg = NativeLoadGen(n, target_qps=5000.0, mode="Server", seed=3)
    time.sleep(0.3)  # everything is scheduled within ~10 ms; let it pile up
    got = []
    t0 = time.time()
    while len(got) < n and time.time() - t0 < 5:
        got.extend(lg.poll(max_n=64, timeout_us=50000))
    for q in got:
        lg.complete(q)
    rep = lg.report()
    # completions happened ~300 ms after the ~10 ms schedule
    assert rep["latency_ms_p50"] > 200.0
    lg.close()


def test_single_stream_e2e_native():
    """SingleStream through the full runner, paced by the native loadgen."""
    import jax

    from rnnt_inference_tpu.config import FeaturizerConfig, RNNTParams
    from rnnt_inference_tpu.data.dataset import SampleStore
    from rnnt_inference_tpu.models.weights import init_weights
    from rnnt_inference_tpu.runtime.harness import (
        run_offline,
        run_single_stream_native,
    )

    SMALL = RNNTParams(
        trans_input_size=240,
        trans_hidden_size=64,
        pred_hidden_size=32,
        joint_hidden_size=32,
        max_res_len=128,
    )
    cfg = FeaturizerConfig()
    store = SampleStore.synthetic(
        n=3, seed=8, min_seconds=0.3, max_seconds=0.8, mean_seconds=0.5
    )
    w = init_weights(jax.random.PRNGKey(5), SMALL)
    offline = run_offline(w, store, SMALL, cfg, batch_size=2, warmup=False)

    # min_query_count loops the 3-sample set to 5 queries
    report = run_single_stream_native(
        w, store, SMALL, cfg, min_query_count=5, warmup=False
    )
    s = report.summary()
    assert s["completed"] == 5
    assert s["latency_ms_p90"] >= s["latency_ms_p50"] > 0
    assert report.hypotheses == offline.hypotheses


def test_report_deferred_excluded_from_percentiles():
    """QoS-deferred completions must not pollute the live percentile pool
    (reference drains its QoS queue only after FlushQueries —
    csrc/torch_sut.cpp:384-417); they are reported separately."""
    n = 20
    lg = NativeLoadGen(n, target_qps=10000.0, mode="Server", seed=3)
    got = []
    while len(got) < n:
        got.extend(lg.poll(max_n=64, timeout_us=100000))
    # complete 19 quickly; defer one and complete it much later
    deferred_q = got[-1]
    lg.mark_deferred(deferred_q)
    for q in got[:-1]:
        lg.complete(q)
    time.sleep(0.5)
    lg.complete(deferred_q)
    rep = lg.report()
    assert rep["completed"] == n
    assert rep["completed_live"] == n - 1
    assert rep["deferred_completed"] == 1
    assert rep["deferred_ms_max"] >= 500.0
    # the >=500 ms deferred latency must not show up in the live pool
    assert rep["latency_ms_max"] < 500.0
    assert rep["latency_ms_p99"] < 500.0
    # nor in the measured wall: the deferred drain landed at t>=0.5 s but
    # every live completion finished well before that
    assert rep["wall_seconds"] < 0.5
    lg.close()


def test_offline_native_rules_e2e():
    """Native-issuer Offline run: performance_sample_count restricts the
    QSL, queries cycle over it, min_query_count is honored, and first-cycle
    tokens match the plain Offline runner."""
    import jax

    from rnnt_inference_tpu.config import FeaturizerConfig, RNNTParams
    from rnnt_inference_tpu.data.dataset import SampleStore
    from rnnt_inference_tpu.models.weights import init_weights
    from rnnt_inference_tpu.runtime.harness import run_offline, run_offline_native

    SMALL = RNNTParams(
        trans_input_size=240,
        trans_hidden_size=64,
        pred_hidden_size=32,
        joint_hidden_size=32,
        max_res_len=128,
    )
    cfg = FeaturizerConfig()
    store = SampleStore.synthetic(
        n=5, seed=7, min_seconds=0.3, max_seconds=1.0, mean_seconds=0.6
    )
    w = init_weights(jax.random.PRNGKey(2), SMALL)

    report = run_offline_native(
        w, store, SMALL, cfg, batch_size=4,
        target_qps=10.0, min_query_count=7, min_duration_s=0.0,
        performance_sample_count=3, warmup=False,
    )
    assert report.extra["performance_sample_count"] == 3
    assert report.extra["queries"] == 7
    assert report.extra["completed"] == 7  # 3 + 3 + 1 across 3 cycles
    assert report.extra["cycles"] == 3
    assert report.extra["timing"] == "native"
    assert report.wall_seconds > 0

    sub = store.select(np.arange(3))
    offline = run_offline(w, sub, SMALL, cfg, batch_size=4, warmup=False)
    assert report.hypotheses == offline.hypotheses


def test_offline_native_duration_rule_sizes_queries():
    """Offline effective sample count = max(min_query_count,
    target_qps * min_duration) — the loadgen Offline sizing rule."""
    import jax

    from rnnt_inference_tpu.config import FeaturizerConfig, RNNTParams
    from rnnt_inference_tpu.data.dataset import SampleStore
    from rnnt_inference_tpu.models.weights import init_weights
    from rnnt_inference_tpu.runtime.harness import run_offline_native

    SMALL = RNNTParams(
        trans_input_size=240,
        trans_hidden_size=64,
        pred_hidden_size=32,
        joint_hidden_size=32,
        max_res_len=128,
    )
    store = SampleStore.synthetic(
        n=3, seed=7, min_seconds=0.3, max_seconds=0.8, mean_seconds=0.5
    )
    w = init_weights(jax.random.PRNGKey(2), SMALL)
    # qps 100 * 0.05 s duration -> 5 queries beats min_query_count 2
    report = run_offline_native(
        w, store, SMALL, FeaturizerConfig(), batch_size=4,
        target_qps=100.0, min_query_count=2, min_duration_s=0.05,
        warmup=False,
    )
    assert report.extra["queries"] == 5
    assert report.extra["completed"] == 5
