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
