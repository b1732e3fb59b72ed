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
