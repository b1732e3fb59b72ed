"""Multi-host weak-scaling probe: a real N-process jax.distributed cluster
serving one Offline workload, sharded per host.

Promotes the 2-process machinery test (tests/test_distributed.py:74) into a
runnable artifact: spawns N controller processes on this machine (CPU
backend), forms a jax.distributed cluster, length-stripes the sample set
over hosts (parallel/distributed.host_shard_indices), runs a REAL Offline
serve per host, and merges the per-host reports (all_hosts_report).

Weak-scaling on one shared machine: raw throughput/host is core-shared and
meaningless, so the printed efficiency is LOAD-BALANCE efficiency —
mean(host wall) / max(host wall) — which is the actual weak-scaling limiter
for this embarrassingly-parallel workload (no cross-host communication in
the serve path; on separate hosts, aggregate throughput = sum of per-host
throughputs and efficiency is bounded by exactly this balance term).

Usage:
  python scripts/multihost_probe.py --procs 4 --n 64
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = textwrap.dedent(
    """
    import json, os, sys, time
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, os.environ["RNNT_REPO"])
    import numpy as np
    from rnnt_inference_tpu.config import FeaturizerConfig, RNNTParams
    from rnnt_inference_tpu.data.dataset import SampleStore
    from rnnt_inference_tpu.models.weights import init_weights
    from rnnt_inference_tpu.parallel.distributed import (
        all_hosts_report, host_shard_indices, initialize,
    )
    from rnnt_inference_tpu.runtime.harness import run_offline

    nproc = int(os.environ["NPROC"])
    pid = int(os.environ["PROC_ID"])
    initialize(
        coordinator_address=os.environ["COORD"], num_processes=nproc,
        process_id=pid,
    )

    params = RNNTParams(
        trans_input_size=240,
        trans_hidden_size=int(os.environ.get("HIDDEN", "64")),
        pred_hidden_size=32,
        joint_hidden_size=32,
        max_res_len=128,
    )
    cfg = FeaturizerConfig()
    n = int(os.environ["N_SAMPLES"])
    batch = int(os.environ.get("BATCH", "8"))
    # every host builds the same deterministic store, serves only its shard
    store = SampleStore.synthetic(
        n=n, seed=11, min_seconds=0.5, max_seconds=3.0, mean_seconds=1.5
    )
    mine = host_shard_indices(n, store.lengths)
    shard = store.select(np.sort(mine))
    w = init_weights(jax.random.PRNGKey(0), params)

    # serve repeatedly for >= PROBE_MIN_S so the wall measures steady-state
    # throughput, not sub-100 ms dispatch jitter (which would dominate the
    # balance metric)
    rep = run_offline(
        w, shard, params, cfg, batch_size=batch, warmup=True,
        min_duration_s=float(os.environ.get("PROBE_MIN_S", "2.0")),
    )
    local = dict(
        audio_seconds_per_second=rep.audio_seconds_per_second,
        samples=rep.samples,
        wall_seconds=rep.wall_seconds,
    )
    merged = all_hosts_report(local)
    # gather per-host walls for the balance metric (tiny, untimed)
    from jax.experimental import multihost_utils
    import jax.numpy as jnp
    walls = np.asarray(
        multihost_utils.process_allgather(jnp.asarray([rep.wall_seconds]))
    ).reshape(-1)
    if pid == 0 or nproc == 1:
        merged["per_host_wall_seconds"] = [round(float(v), 3) for v in walls]
        merged["load_balance_efficiency"] = round(
            float(np.mean(walls) / np.max(walls)), 4
        )
        print("PROBE " + json.dumps(merged), flush=True)
    """
)


def run_cluster(nproc: int, n_samples: int, batch: int, hidden: int) -> dict:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env = dict(
        os.environ,
        RNNT_REPO=REPO,
        COORD=f"127.0.0.1:{port}",
        NPROC=str(nproc),
        N_SAMPLES=str(n_samples),
        BATCH=str(batch),
        HIDDEN=str(hidden),
        JAX_PLATFORMS="",
    )
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER],
            env=dict(env, PROC_ID=str(pid)),
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        for pid in range(nproc)
    ]
    report = None
    for p in procs:
        out, err = p.communicate(timeout=900)
        if p.returncode != 0:
            raise RuntimeError(f"worker failed:\n{out}\n{err}")
        for line in out.splitlines():
            if line.startswith("PROBE "):
                report = json.loads(line[len("PROBE "):])
    assert report is not None, "no PROBE report from process 0"
    return report


def main(argv=None) -> int:
    p = argparse.ArgumentParser("multihost_probe")
    p.add_argument("--procs", type=int, default=2,
                   help="number of controller processes (simulated hosts)")
    p.add_argument("--n", type=int, default=32, help="total samples")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--hidden", type=int, default=64,
                   help="encoder width (64 = probe-sized; 1024 = product)")
    args = p.parse_args(argv)

    report = run_cluster(args.procs, args.n, args.batch, args.hidden)
    report["procs"] = args.procs
    eff = report["load_balance_efficiency"]
    print(json.dumps(report, indent=2))
    print(
        f"weak-scaling (load-balance) efficiency over {args.procs} hosts: "
        f"{eff:.1%} {'(>=90% target met)' if eff >= 0.9 else '(below 90% target)'}",
        file=sys.stderr,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
