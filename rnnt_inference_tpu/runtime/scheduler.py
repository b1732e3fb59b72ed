"""Server-scenario load generation and latency accounting.

A self-contained replacement for the mlperf loadgen's Server mode (the
reference links the real loadgen, csrc/main.cpp:130): Poisson arrivals at a
target QPS, a FIFO issue queue, per-sample completion latency, and the
p50/p90/p99 summary plus a VALID/INVALID verdict the reference's
target_latency check gates on (configs/mlperf.conf:48,56 -> 1000 ms @ p99).

QoS deferral reproduced: samples longer than qos_len waveform samples are
parked and only served after the main stream drains
(reference: csrc/torch_sut.cpp:384-417).

response_size reproduced: finished slots are accumulated and responded in
groups of at least `response_size` (the reference's stop_size_ batching,
csrc/metadata.cpp:158-162, torch_sut.cpp:542-571) — except when the tail is
draining or the slot pool is starved, where waiting would deadlock/stall.

Queries loop over the sample set (query q -> sample q % n) so
min_query_count/min_duration from the conf are honored like loadgen's rules.
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
    # QoS-deferred queries (parked past the measured window, reference
    # csrc/torch_sut.cpp:384-417) are tracked separately: their multi-minute
    # park times must not pollute the live-traffic percentiles
    deferred_latencies_ms: Dict[int, float] = field(default_factory=dict)
    issued: int = 0
    completed: int = 0
    wall_seconds: float = 0.0

    def percentile(self, p: float) -> float:
        if not self.latencies_ms:
            return float("nan")
        return float(np.percentile(list(self.latencies_ms.values()), p))

    def summary(self) -> dict:
        # None (not NaN) when every completion was QoS-deferred: NaN is not
        # valid JSON and float('nan') > gate comparisons are silently False —
        # validate_report treats a missing/None percentile as INVALID
        have_live = bool(self.latencies_ms)
        d = dict(
            scenario="Server",
            completed=self.completed,
            completed_live=len(self.latencies_ms),
            wall_seconds=round(self.wall_seconds, 3),
            qps=round(self.completed / self.wall_seconds, 2) if self.wall_seconds else 0,
            latency_ms_p50=round(self.percentile(50), 1) if have_live else None,
            latency_ms_p90=round(self.percentile(90), 1) if have_live else None,
            latency_ms_p99=round(self.percentile(99), 1) if have_live else None,
        )
        if self.deferred_latencies_ms:
            vals = list(self.deferred_latencies_ms.values())
            d["deferred_completed"] = len(vals)
            d["deferred_ms_mean"] = round(float(np.mean(vals)), 1)
            d["deferred_ms_max"] = round(float(np.max(vals)), 1)
        # per-sample slow-query log (reference prints every sample whose
        # latency exceeds 1 s, csrc/torch_sut.cpp:558-565 — sourced there by
        # poking loadgen's private metadata; here from our own public stamps)
        slow = sorted(
            ((q, lat) for q, lat in self.latencies_ms.items() if lat > 1000.0),
            key=lambda kv: -kv[1],
        )
        if slow:
            d["slow_sample_count"] = len(slow)
            d["slow_samples"] = [
                {"query": int(q), "latency_ms": round(lat, 1)} for q, lat in slow[:16]
            ]
        return d


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
    response_size: int = 1,
    min_query_count: int = 0,
    min_duration_s: float = 0.0,
    inflight_window: int = 1,
) -> Tuple[ServerMetrics, Dict[int, np.ndarray]]:
    """Drive the slot pipeline against a Poisson arrival trace.

    realtime=True honors wall-clock arrival times (true Server latency
    measurement); realtime=False issues as fast as the pipeline accepts
    (functional/throughput testing; latencies then measure pipeline
    residency from actual issue, one clock for every sample).
    Returns (metrics, {query_id: tokens}); query q is sample q % len(store).
    """
    n = len(store)
    n_queries = max(n, min_query_count)
    order = sample_order if sample_order is not None else np.arange(n)
    # 2x duration slack: the sum of qps*dur exponential gaps has mean ~dur,
    # so ~half of all seeds would otherwise run out of arrivals BEFORE
    # min_duration and silently shorten the load window (the C++ twin
    # csrc/rnnt_loadgen.cpp allocates the same slack)
    arrivals = poisson_schedule(
        max(n_queries, int(target_qps * min_duration_s * 2) + 16), target_qps, seed
    )

    metrics = ServerMetrics()
    results: Dict[int, np.ndarray] = {}
    issue_times: Dict[int, float] = {}
    deferred: List[int] = []
    deferred_set = set()

    t_start = time.time()
    next_i = 0
    finished_backlog: List[int] = []
    inflight: List[np.ndarray] = []  # device-resident finished masks

    def total_queries() -> int:
        # issue until count AND duration rules are both satisfied
        nq = n_queries
        while nq < len(arrivals) and arrivals[nq - 1] < min_duration_s:
            nq += 1
        return nq

    nq = total_queries()

    def sample_of(q: int) -> int:
        return int(order[q % n])

    def respond(pairs):
        now = time.time()
        for query_id, tokens in pairs:
            results[query_id] = tokens
            lat = (now - issue_times[query_id]) * 1e3
            # QoS-deferred completions land after the measured window and
            # are summarized separately (reference drains mQosQueue_ only
            # after FlushQueries, csrc/torch_sut.cpp:384-417)
            pool = (
                metrics.deferred_latencies_ms
                if query_id in deferred_set
                else metrics.latencies_ms
            )
            pool[query_id] = lat
            metrics.completed += 1

    def drain_inflight(force: bool) -> None:
        # responses wait for >= response_size finished slots unless forced
        # (tail drain / slot starvation), per the reference's stop_size_
        while inflight:
            finished = np.nonzero(np.asarray(inflight.pop(0)))[0]
            finished_backlog.extend(int(s) for s in finished)
        tail = next_i >= nq and not deferred
        starved = not runner.free_slots
        if finished_backlog and (
            force or tail or starved or len(finished_backlog) >= response_size
        ):
            respond(runner.extract(finished_backlog))
            finished_backlog.clear()

    while metrics.completed < nq and (time.time() - t_start) < max_wall_s:
        now = time.time() - t_start
        # 1. admit due arrivals into free slots (QoS: defer over-long samples)
        batch: List[int] = []
        while (
            next_i < nq
            and (not realtime or arrivals[next_i] <= now)
            and len(batch) < runner.insert_batch
            and len(batch) < len(runner.free_slots)
        ):
            q = next_i
            next_i += 1
            stamp = t_start + arrivals[q] if realtime else time.time()
            issue_times[q] = stamp
            if store.samples[sample_of(q)].shape[0] > qos_len:
                deferred.append(q)
                deferred_set.add(q)
                continue
            batch.append(q)
        # drain deferred QoS samples once the main stream is exhausted
        if next_i >= nq and not batch and deferred:
            while deferred and len(batch) < min(
                runner.insert_batch, len(runner.free_slots)
            ):
                q = deferred.pop(0)
                if not realtime:
                    issue_times[q] = time.time()
                batch.append(q)
        if batch:
            runner.insert_samples([store.samples[sample_of(q)] for q in batch], batch)
            metrics.issued += len(batch)

        # 2. streaming steps: dispatch WITHOUT an intervening readback so the
        # insert's featurize+scatter and the step overlap in the device queue
        if runner.n_active:
            inflight.append(runner.step_async())
        elif next_i < nq and realtime and not inflight:
            # idle until the next arrival
            wait = arrivals[next_i] - (time.time() - t_start)
            if wait > 0:
                time.sleep(min(wait, 0.01))

        # 3. read back finish masks and respond in response_size groups
        if len(inflight) >= inflight_window or not runner.n_active:
            drain_inflight(force=not runner.n_active and next_i >= nq)

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
    response_size: int = 1,
    min_query_count: int = 0,
    min_duration_s: float = 0.0,
) -> Tuple[dict, Dict[int, np.ndarray]]:
    """Server run driven by the native mini-loadgen (csrc/rnnt_loadgen.cpp):
    a C++ thread issues Poisson arrivals on a steady clock and completions
    are timestamped natively, so latency numbers are free of Python jitter.
    Latency is charged from the scheduled arrival (loadgen semantics).

    Returns (native latency report dict, {query_id: tokens}).
    """
    import time as _time

    from rnnt_inference_tpu.runtime.native import NativeLoadGen

    n = len(store)
    lg = NativeLoadGen(
        n, target_qps, mode="Server", seed=seed,
        min_query_count=min_query_count, min_duration_s=min_duration_s,
    )
    results: Dict[int, np.ndarray] = {}
    deferred: List[int] = []
    inflight: List = []  # device finished masks
    finished_backlog: List[int] = []
    t_start = _time.time()

    def drain_one(force: bool):
        finished = np.nonzero(np.asarray(inflight.pop(0)))[0]
        finished_backlog.extend(int(s) for s in finished)
        tail = lg.done_issuing and lg.pending == 0 and not deferred
        starved = not runner.free_slots
        if finished_backlog and (
            force or tail or starved or len(finished_backlog) >= response_size
        ):
            for query_id, tokens in runner.extract(finished_backlog):
                results[query_id] = tokens
                if query_id >= 0:
                    lg.complete(query_id)
            finished_backlog.clear()

    try:
        while not lg.drained and (_time.time() - t_start) < max_wall_s:
            # 1. admit arrivals into free slots
            room = min(runner.insert_batch, len(runner.free_slots))
            batch: List[int] = []
            if room:
                for q in lg.poll(max_n=room, timeout_us=500):
                    if store.samples[lg.sample_of(q)].shape[0] > qos_len:
                        lg.mark_deferred(q)  # excluded from live percentiles
                        deferred.append(q)
                    else:
                        batch.append(q)
            # drain QoS-deferred queries once the main stream is exhausted
            # (reference: mQosQueue_ drained after FlushQueries sets lStop_,
            # torch_sut.cpp:384-417).  Must NOT wait for n_active == 0:
            # finished slots are only freed by extract, and extraction can be
            # gated on response_size — requiring an idle pipeline here forms
            # a circular wait (finished_backlog < response_size forever).
            if lg.pending == 0 and lg.done_issuing and not batch and deferred:
                while deferred and len(batch) < room:
                    batch.append(deferred.pop(0))
            if batch:
                runner.insert_samples(
                    [store.samples[lg.sample_of(q)] for q in batch], batch
                )

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
                force = not runner.n_active and lg.pending == 0 and lg.done_issuing
                while len(inflight) > target:
                    drain_one(force)
        report = lg.report()
    finally:
        lg.close()
    return report, results
