"""Server-scenario load generation and latency accounting.

A self-contained replacement for the mlperf loadgen's Server mode (the
reference links the real loadgen, csrc/main.cpp:130): Poisson arrivals at a
target QPS, a FIFO issue queue, per-sample completion latency, and the
p50/p90/p99 summary the reference's target_latency check gates on
(configs/mlperf.conf:48,56 -> 1000 ms @ p99).

QoS deferral reproduced: samples longer than qos_len waveform samples are
parked and only served after the main stream drains
(reference: csrc/torch_sut.cpp:384-417).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

from rnnt_inference_tpu.data.dataset import SampleStore
from rnnt_inference_tpu.runtime.server import ServerRunner


@dataclass
class ServerMetrics:
    latencies_ms: Dict[int, float] = field(default_factory=dict)
    issued: int = 0
    completed: int = 0
    wall_seconds: float = 0.0

    def percentile(self, p: float) -> float:
        if not self.latencies_ms:
            return float("nan")
        return float(np.percentile(list(self.latencies_ms.values()), p))

    def summary(self) -> dict:
        return dict(
            scenario="Server",
            completed=self.completed,
            wall_seconds=round(self.wall_seconds, 3),
            qps=round(self.completed / self.wall_seconds, 2) if self.wall_seconds else 0,
            latency_ms_p50=round(self.percentile(50), 1),
            latency_ms_p90=round(self.percentile(90), 1),
            latency_ms_p99=round(self.percentile(99), 1),
        )


def poisson_schedule(n: int, target_qps: float, seed: int = 0) -> np.ndarray:
    """Arrival offsets (seconds) for n samples at target_qps (exponential
    inter-arrival gaps, like loadgen's Server mode)."""
    rng = np.random.RandomState(seed)
    gaps = rng.exponential(1.0 / target_qps, size=n)
    return np.cumsum(gaps)


def run_server(
    runner: ServerRunner,
    store: SampleStore,
    target_qps: float,
    sample_order: Optional[np.ndarray] = None,
    seed: int = 0,
    qos_len: int = 233500,
    max_wall_s: float = 600.0,
    realtime: bool = True,
) -> Tuple[ServerMetrics, Dict[int, np.ndarray]]:
    """Drive the slot pipeline against a Poisson arrival trace.

    realtime=True honors wall-clock arrival times (true Server latency
    measurement); realtime=False issues as fast as the pipeline accepts
    (functional/throughput testing).
    Returns (metrics, {sample_idx: tokens}).
    """
    n = len(store)
    order = sample_order if sample_order is not None else np.arange(n)
    arrivals = poisson_schedule(n, target_qps, seed)

    metrics = ServerMetrics()
    results: Dict[int, np.ndarray] = {}
    issue_times: Dict[int, float] = {}
    deferred: List[int] = []

    t_start = time.time()
    next_i = 0
    finished_backlog: List[int] = []

    def respond(pairs):
        now = time.time()
        for sample_id, tokens in pairs:
            results[sample_id] = tokens
            metrics.latencies_ms[sample_id] = (now - issue_times[sample_id]) * 1e3
            metrics.completed += 1

    while metrics.completed < n and (time.time() - t_start) < max_wall_s:
        now = time.time() - t_start
        # 1. admit due arrivals into free slots (QoS: defer over-long samples)
        batch: List[int] = []
        while (
            next_i < n
            and (not realtime or arrivals[next_i] <= now)
            and len(batch) < runner.insert_batch
            and len(batch) < len(runner.free_slots)
        ):
            idx = int(order[next_i])
            next_i += 1
            if store.samples[idx].shape[0] > qos_len:
                deferred.append(idx)
                issue_times[idx] = t_start + arrivals[next_i - 1]
                continue
            batch.append(idx)
            issue_times[idx] = t_start + arrivals[next_i - 1] if realtime else time.time()
        # drain deferred QoS samples once the main stream is exhausted
        if next_i >= n and not batch and deferred:
            while deferred and len(batch) < min(
                runner.insert_batch, len(runner.free_slots)
            ):
                batch.append(deferred.pop(0))
        if batch:
            runner.insert_samples([store.samples[i] for i in batch], batch)
            metrics.issued += len(batch)

        # 2. one streaming step if anything is active
        if runner.n_active:
            finished = runner.step()
            finished_backlog.extend(int(s) for s in finished)
        elif next_i < n and realtime:
            # idle until the next arrival
            wait = arrivals[next_i] - (time.time() - t_start)
            if wait > 0:
                time.sleep(min(wait, 0.01))

        # 3. early response of finished slots
        if finished_backlog:
            respond(runner.extract(finished_backlog))
            finished_backlog.clear()

    metrics.wall_seconds = time.time() - t_start
    return metrics, results


def run_server_native(
    runner: ServerRunner,
    store: SampleStore,
    target_qps: float,
    seed: int = 0,
    qos_len: int = 233500,
    max_wall_s: float = 600.0,
    pipeline_depth: int = 16,
) -> Tuple[dict, Dict[int, np.ndarray]]:
    """Server run driven by the native mini-loadgen (csrc/rnnt_loadgen.cpp):
    a C++ thread issues Poisson arrivals on a steady clock and completions
    are timestamped natively, so latency numbers are free of Python jitter.

    Returns (native latency report dict, {sample_idx: tokens}).
    """
    import collections
    import time as _time

    from rnnt_inference_tpu.runtime.native import NativeLoadGen

    n = len(store)
    lg = NativeLoadGen(n, target_qps, mode="Server", seed=seed)
    results: Dict[int, np.ndarray] = {}
    deferred: List[int] = []
    inflight: collections.deque = collections.deque()  # device finished masks
    t_start = _time.time()

    def drain_one():
        finished = np.nonzero(np.asarray(inflight.popleft()))[0]
        if len(finished):
            for sample_id, tokens in runner.extract(finished):
                results[sample_id] = tokens
                if sample_id >= 0:
                    lg.complete(sample_id)

    try:
        while lg.completed < n and (_time.time() - t_start) < max_wall_s:
            # 1. admit arrivals into free slots
            room = min(runner.insert_batch, len(runner.free_slots))
            batch: List[int] = []
            if room:
                for idx in lg.poll(max_n=room, timeout_us=500):
                    if store.samples[idx].shape[0] > qos_len:
                        deferred.append(idx)
                    else:
                        batch.append(idx)
            if lg.pending == 0 and not batch and deferred and runner.n_active == 0:
                while deferred and len(batch) < room:
                    batch.append(deferred.pop(0))
            if batch:
                runner.insert_samples([store.samples[i] for i in batch], batch)

            # 2. dispatch steps ahead; read back finish masks lazily and in
            # BURSTS: on relayed backends a readback is a global sync with
            # hundreds of ms of RPC latency, so the first drain pays the
            # flush and the rest of the burst is nearly free
            if runner.n_active:
                inflight.append(runner.step_async())
            if inflight:
                # NOTE: do not drain more eagerly at low load — on relayed
                # backends every drain is a ~0.5 s global flush, and paying
                # it per-iteration collapses the dispatch rate (measured:
                # p50 735 ms -> 4.4 s when draining each iteration).
                if len(inflight) > pipeline_depth:
                    target = max(pipeline_depth // 2, 1)
                elif not runner.free_slots or (
                    not runner.n_active and lg.pending == 0
                ):
                    target = 0  # starved for slots / tail: drain everything
                else:
                    target = len(inflight)
                while len(inflight) > target:
                    drain_one()
        report = lg.report()
    finally:
        lg.close()
    return report, results
