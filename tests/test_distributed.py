"""Multi-process jax.distributed + mesh-parallel Offline serving.

The reference is single-node shared-memory (SURVEY §2.4); the TPU-native
scale-out story is jax.distributed over hosts + a data mesh over chips.
These tests exercise it end-to-end on CPU: a real 2-process
jax.distributed cluster (subprocesses), and the OfflineRunner data-parallel
path on the virtual 8-device mesh.
"""

import os
import subprocess
import sys
import textwrap

import numpy as np
import jax
import pytest

from rnnt_inference_tpu.config import FeaturizerConfig, RNNTParams
from rnnt_inference_tpu.data.dataset import SampleStore
from rnnt_inference_tpu.models.weights import init_weights
from rnnt_inference_tpu.parallel.distributed import host_shard_indices
from rnnt_inference_tpu.parallel.mesh import make_mesh
from rnnt_inference_tpu.runtime.harness import run_offline
from rnnt_inference_tpu.runtime.offline import OfflineRunner

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SMALL = RNNTParams(
    trans_input_size=240,
    trans_hidden_size=64,
    pred_hidden_size=32,
    joint_hidden_size=32,
    max_res_len=128,
)

needs_8 = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")


_WORKER = textwrap.dedent(
    """
    import os, sys
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, os.environ["RNNT_REPO"])
    import numpy as np
    from rnnt_inference_tpu.parallel.distributed import (
        all_hosts_report, host_shard_indices, initialize,
    )

    pid = int(os.environ["PROC_ID"])
    initialize(
        coordinator_address=os.environ["COORD"],
        num_processes=2,
        process_id=pid,
    )
    assert jax.process_count() == 2, jax.process_count()
    assert jax.process_index() == pid

    # host_shard_indices: each host's shard, printed for the parent to check
    lengths = np.arange(11) * 7 % 11  # deterministic, distinct
    mine = host_shard_indices(11, lengths)
    print("SHARD", pid, ",".join(map(str, sorted(mine.tolist()))), flush=True)

    # all_hosts_report merges across processes
    local = dict(audio_seconds_per_second=100.0 * (pid + 1), samples=5 * (pid + 1))
    merged = all_hosts_report(local)
    print("MERGED", pid, merged["audio_seconds_per_second"],
          merged["samples"], merged["hosts"], flush=True)
    """
)


def test_two_process_distributed_cluster(tmp_path):
    """Spawn a real 2-process jax.distributed CPU cluster and exercise
    initialize, host_shard_indices (disjoint cover), all_hosts_report."""
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    env = dict(
        os.environ,
        RNNT_REPO=REPO,
        COORD=f"127.0.0.1:{port}",
        JAX_PLATFORMS="",
    )
    env.pop("XLA_FLAGS", None)  # workers don't need the 8-device fork
    procs = [
        subprocess.Popen(
            [sys.executable, str(script)],
            env=dict(env, PROC_ID=str(pid)),
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=120)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append(out)

    shards = {}
    merged = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("SHARD"):
                _, pid, idxs = line.split(" ")
                shards[int(pid)] = [int(v) for v in idxs.split(",")]
            if line.startswith("MERGED"):
                _, pid, aps, n, hosts = line.split(" ")
                merged[int(pid)] = (float(aps), int(n), int(hosts))
    # disjoint cover of range(11)
    assert sorted(shards[0] + shards[1]) == list(range(11))
    assert not set(shards[0]) & set(shards[1])
    # both processes see the same merged totals: 100+200, 5+10, 2 hosts
    for pid in (0, 1):
        assert merged[pid] == (300.0, 15, 2)


def test_host_shard_indices_single_process():
    lengths = np.array([5, 3, 9, 1, 7])
    mine = host_shard_indices(5, lengths)
    assert sorted(mine.tolist()) == [0, 1, 2, 3, 4]


@needs_8
def test_offline_runner_data_parallel_matches_single():
    """Full OfflineRunner path (featurize + decode + packed device loop) on a
    dp=8 mesh must reproduce single-device hypotheses."""
    cfg = FeaturizerConfig()
    store = SampleStore.synthetic(
        n=10, seed=21, min_seconds=0.3, max_seconds=1.0, mean_seconds=0.6
    )
    w = init_weights(jax.random.PRNGKey(0), SMALL)
    ref = run_offline(w, store, SMALL, cfg, batch_size=8, warmup=False)

    mesh = make_mesh(8, model_parallel=1)
    runner = OfflineRunner(w, SMALL, cfg, batch_size=8, mesh=mesh)
    with mesh:
        rep = run_offline(
            w, store, SMALL, cfg, batch_size=8, warmup=False, runner=runner
        )
    assert rep.hypotheses == ref.hypotheses


@needs_8
def test_offline_runner_dp_device_resident():
    """Device-resident (packed int8 readback) Offline loop under dp=8."""
    cfg = FeaturizerConfig()
    store = SampleStore.synthetic(
        n=8, seed=22, min_seconds=0.3, max_seconds=0.8, mean_seconds=0.5
    )
    w = init_weights(jax.random.PRNGKey(1), SMALL)
    ref = run_offline(w, store, SMALL, cfg, batch_size=8, warmup=False)

    mesh = make_mesh(8, model_parallel=1)
    runner = OfflineRunner(w, SMALL, cfg, batch_size=8, mesh=mesh)
    with mesh:
        rep = run_offline(
            w, store, SMALL, cfg, batch_size=8, warmup=False,
            runner=runner, device_resident=True,
        )
    assert rep.hypotheses == ref.hypotheses


def test_multihost_probe_artifact():
    """scripts/multihost_probe.py end-to-end: a 2-process cluster serving a
    sharded Offline workload and reporting weak-scaling balance."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "multihost_probe", os.path.join(REPO, "scripts", "multihost_probe.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    report = mod.run_cluster(nproc=2, n_samples=12, batch=4, hidden=64)
    assert report["hosts"] == 2
    assert report["samples"] >= 12  # reps can serve the shard multiple times
    assert 0.0 < report["load_balance_efficiency"] <= 1.0
    assert len(report["per_host_wall_seconds"]) == 2
