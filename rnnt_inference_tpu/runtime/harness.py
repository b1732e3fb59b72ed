"""Benchmark/accuracy harness: the mlperf-loadgen-shaped front door.

Produces the same artifacts a reference run produces (reference:
models/main.py:60-85, eval_accuracy.py:85-101):
  - accuracy log JSON: [{qsl_idx, data: <hex int32 tokens>}] — byte-compatible
    with the reference's mlperf_log_accuracy.json entries
  - summary JSON with throughput (samples/s and audio-seconds/s) and WER
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np

from rnnt_inference_tpu.config import FeaturizerConfig, RNNTParams
from rnnt_inference_tpu.data.dataset import SampleStore
from rnnt_inference_tpu.models.weights import RNNTWeights
from rnnt_inference_tpu.runtime.offline import OfflineRunner
from rnnt_inference_tpu.runtime.qsl import QuerySampleLibrary
from rnnt_inference_tpu.utils.labels import seq_to_sen
from rnnt_inference_tpu.utils.wer import word_error_rate


def tokens_to_hex(tokens: np.ndarray) -> str:
    """int32 little-endian hex, matching the reference's response buffers
    (csrc/torch_sut.cpp:221-236 responds res_len*4-byte int32 buffers)."""
    return tokens.astype("<i4").tobytes().hex()


def hex_to_tokens(data: str) -> np.ndarray:
    return np.frombuffer(bytes.fromhex(data), dtype="<i4")


@dataclass
class RunReport:
    scenario: str
    samples: int
    wall_seconds: float
    samples_per_second: float
    audio_seconds_per_second: float
    wer: Optional[float] = None
    hypotheses: List[str] = field(default_factory=list)
    extra: dict = field(default_factory=dict)

    def summary(self) -> dict:
        d = dict(
            scenario=self.scenario,
            samples=self.samples,
            wall_seconds=round(self.wall_seconds, 4),
            samples_per_second=round(self.samples_per_second, 2),
            audio_seconds_per_second=round(self.audio_seconds_per_second, 2),
        )
        if self.wer is not None:
            d["wer_percent"] = round(self.wer * 100, 3)
        d.update(self.extra)
        return d


def run_offline(
    weights: RNNTWeights,
    store: SampleStore,
    params: RNNTParams = RNNTParams(),
    cfg: FeaturizerConfig = FeaturizerConfig(),
    batch_size: int = 128,
    split_len: int = -1,
    accuracy: bool = False,
    output_dir: Optional[str] = None,
    warmup: bool = True,
    min_duration_s: float = 0.0,
    runner: Optional[OfflineRunner] = None,
    device_resident: bool = False,
    wav_buckets_s=None,
    packed: bool = False,
    chunk_frames: int = 16,
    decode_chunk: int = 128,
) -> RunReport:
    """Offline scenario: issue the whole sample set as one query, measure
    end-to-end throughput (reference run shape: run.sh:66-71).

    device_resident=True stages samples into HBM untimed (the loadgen
    LoadSamplesToRam analog) and times only the serve loop.
    packed=True serves via the sequence-packed path (runtime/packing.py):
    utterances concatenate along time on a chunk_frames grain with
    per-boundary state resets instead of bucket-padding; token-exact.
    """
    qsl = (
        QuerySampleLibrary(store, cfg, wav_buckets_s=wav_buckets_s)
        if wav_buckets_s
        else QuerySampleLibrary(store, cfg)
    )
    if packed:
        assert store.kind == "waveform", "packed Offline serves waveforms"
        from rnnt_inference_tpu.runtime.packing import PackedOfflineRunner

        prunner = PackedOfflineRunner(
            weights, params, cfg,
            # more lanes than utterances would idle (each lane needs >= 1
            # utterance); small stores pack into fewer, fuller lanes
            n_lanes=min(batch_size, len(store)),
            chunk_frames=chunk_frames, batch_size=batch_size,
            decode_chunk=decode_chunk,
        )
        plan = prunner.stage(qsl)
        rep_walls = []
        result = None
        if warmup:
            prunner.run_device()  # compile + one-off lazy costs, untimed
        while result is None or sum(rep_walls) < min_duration_s:
            result = prunner.run_device()
            rep_walls.append(result.wall_seconds)
        reps = len(rep_walls)
        total_wall = sum(rep_walls)
        n = len(store) * reps
        audio_s = store.audio_seconds * reps
        report = RunReport(
            scenario="Offline",
            samples=n,
            wall_seconds=total_wall,
            samples_per_second=n / total_wall,
            audio_seconds_per_second=audio_s / total_wall,
            extra=dict(
                batches=result.batches,
                reps=reps,
                batch_size=batch_size,
                rep_wall_seconds=[round(w, 3) for w in rep_walls],
                readback_seconds=round(result.readback_seconds, 3),
                packing_efficiency=round(plan.packing_efficiency, 4),
                pack_chunks=plan.n_chunks,
                chunk_frames=chunk_frames,
            ),
        )
        hyps = [seq_to_sen(t, len(t)) for t in result.tokens]
        report.hypotheses = hyps
        if accuracy and any(store.transcripts):
            wer, _, _ = word_error_rate(hyps, store.transcripts)
            report.wer = wer
        if output_dir:
            os.makedirs(output_dir, exist_ok=True)
            acc_log = [
                {"qsl_idx": i, "data": tokens_to_hex(t)}
                for i, t in enumerate(result.tokens)
            ]
            with open(os.path.join(output_dir, "accuracy_log.json"), "w") as f:
                json.dump(acc_log, f)
            with open(os.path.join(output_dir, "summary.json"), "w") as f:
                json.dump(report.summary(), f, indent=2)
        return report

    runner = runner or OfflineRunner(weights, params, cfg, batch_size, split_len)

    indices = np.arange(len(store))
    rep_walls = []
    result = None
    if device_resident and store.kind == "waveform":
        dqsl = qsl.load_to_device(batch_size)
        if warmup:
            runner.warmup_device(dqsl)
            # one full untimed priming pass: the first serve pass after
            # compile pays one-off lazy costs (measured 2.7 s vs 0.96 s
            # steady-state reps) that per-shape warmup does not cover
            runner.run_device(dqsl)
        while result is None or sum(rep_walls) < min_duration_s:
            result = runner.run_device(dqsl)
            rep_walls.append(result.wall_seconds)
    else:
        if warmup:
            runner.warmup(qsl, waveform_mode=(store.kind == "waveform"))
        while result is None or sum(rep_walls) < min_duration_s:
            result = runner.run(qsl, indices)
            rep_walls.append(result.wall_seconds)

    reps = len(rep_walls)
    total_wall = sum(rep_walls)
    n = len(store) * reps
    audio_s = store.audio_seconds * reps
    report = RunReport(
        scenario="Offline",
        samples=n,
        wall_seconds=total_wall,
        samples_per_second=n / total_wall,
        audio_seconds_per_second=audio_s / total_wall,
        extra=dict(
            batches=result.batches,
            reps=reps,
            batch_size=batch_size,
            # per-rep walls expose one-off relay/RPC stalls that would
            # otherwise silently skew the mean
            rep_wall_seconds=[round(w, 3) for w in rep_walls],
            # bulk token transfer of the LAST rep (untimed on device-
            # resident runs; ~1 ms on real hosts, link-bound on relays)
            readback_seconds=round(result.readback_seconds, 3),
        ),
    )

    hyps = [seq_to_sen(t, len(t)) for t in result.tokens]
    report.hypotheses = hyps
    if accuracy and any(store.transcripts):
        wer, _, _ = word_error_rate(hyps, store.transcripts)
        report.wer = wer

    if output_dir:
        os.makedirs(output_dir, exist_ok=True)
        acc_log = [
            {"qsl_idx": i, "data": tokens_to_hex(t)}
            for i, t in enumerate(result.tokens)
        ]
        with open(os.path.join(output_dir, "accuracy_log.json"), "w") as f:
            json.dump(acc_log, f)
        with open(os.path.join(output_dir, "summary.json"), "w") as f:
            json.dump(report.summary(), f, indent=2)
    return report


def _native_offline_loop(
    store, cfg, n, n_queries, dispatch, harvest,
    max_wall_s, max_inflight_cycles, extra,
) -> RunReport:
    """Native-clock Offline serve loop for whole-set-cycle runners (the
    packed path): `dispatch()` async-dispatches one full cycle and returns
    device arrays, `harvest(*host_arrays)` turns them into per-sample token
    lists in store order.  Queries cycle over the sample set (query q ->
    sample q % n); the measured wall is first-issue -> last-completion on
    the native loadgen clock, bulk token readback included."""
    from rnnt_inference_tpu.runtime.native import NativeLoadGen

    n_cycles = -(-n_queries // n)
    lg = NativeLoadGen(n, 1.0, mode="Offline", min_query_count=n_queries)
    polled = 0
    tokens_first_cycle: dict = {}
    sample_lens = store.lengths
    completed_audio_samples = 0
    t_host0 = time.time()

    def poll_until(q_max: int) -> None:
        nonlocal polled
        while polled <= q_max:
            got = lg.poll(max_n=4096, timeout_us=100000)
            polled += len(got)
            if not got and lg.done_issuing:
                break

    try:
        inflight: List[tuple] = []  # (cycle, device arrays...)

        def complete_cycle(cycle: int, arrays) -> None:
            nonlocal completed_audio_samples
            host = [np.asarray(a) for a in arrays]  # bulk readback (timed)
            tokens = harvest(*host)
            base = cycle * n
            for i, toks in enumerate(tokens):
                q = base + i
                if q >= n_queries:
                    continue  # partial last cycle: extra work is dead work
                poll_until(q)
                if cycle == 0:
                    tokens_first_cycle[i] = toks
                completed_audio_samples += int(sample_lens[i])
                lg.complete(q)

        for cycle in range(n_cycles):
            if time.time() - t_host0 > max_wall_s:
                break
            inflight.append((cycle, dispatch()))
            while len(inflight) >= max_inflight_cycles:
                complete_cycle(*inflight.pop(0))
        while inflight:
            complete_cycle(*inflight.pop(0))
        rep = lg.report()
    finally:
        lg.close()

    wall = rep["wall_seconds"]
    audio_s = completed_audio_samples / cfg.sample_rate
    hyps = [
        seq_to_sen(tokens_first_cycle[i], len(tokens_first_cycle[i]))
        for i in sorted(tokens_first_cycle)
    ]
    return RunReport(
        scenario="Offline",
        samples=rep["completed"],
        wall_seconds=wall,
        samples_per_second=rep["completed"] / wall if wall else 0.0,
        audio_seconds_per_second=audio_s / wall if wall else 0.0,
        hypotheses=hyps,
        extra=dict(
            completed=rep["completed"],
            issued=rep["issued"],
            qps=rep["qps"],
            performance_sample_count=n,
            queries=n_queries,
            cycles=n_cycles,
            timing="native",
            **extra,
        ),
    )


def run_offline_native(
    weights: RNNTWeights,
    store: SampleStore,
    params: RNNTParams = RNNTParams(),
    cfg: FeaturizerConfig = FeaturizerConfig(),
    batch_size: int = 128,
    split_len: int = -1,
    target_qps: float = 1.0,
    min_query_count: int = 0,
    min_duration_s: float = 0.0,
    samples_per_query: int = 1,
    performance_sample_count: int = 0,
    warmup: bool = True,
    wav_buckets_s=None,
    max_wall_s: float = 700.0,
    max_inflight_cycles: int = 4,
    packed: bool = False,
    chunk_frames: int = 16,
    decode_chunk: int = 128,
    mesh=None,
) -> RunReport:
    """Offline performance run with the native mini-loadgen as the single
    timing authority — the same clock Server and SingleStream use (reference:
    loadgen owns all timing for every scenario, csrc/main.cpp:108-147).

    packed=True serves every cycle through the sequence-packed runner
    (runtime/packing.py) under the SAME native clock: a cycle's queries
    complete from harvest() order after its bulk token readback, so the
    measured wall includes readback exactly as the reference's loadgen
    timing does.  mesh optionally shards the packed lanes over "data".

    MLPerf Offline rules enforced:
      - the QSL loads exactly `performance_sample_count` samples (reference
        configs/mlperf.conf rnnt override = 2513, csrc/rnnt_qsl.hpp:42-46)
        and queries CYCLE over them (query q -> sample q % psc)
      - the effective sample count is max(min_query_count,
        target_qps * min_duration, samples_per_query) — loadgen maps
        Offline min_query_count to a min SAMPLE count and sizes its single
        query as target_qps * min_duration (configs/mlperf.conf Offline
        comment block)
      - the query stream is issued at t=0 by the native issuer; a query is
        completed only after its token buffer is host-resident, and the
        measured wall is first-issue -> last-completion on the native clock

    The serve loop runs whole cycles over the staged sample set (the batch
    plan is per-set), pipelined `max_inflight_cycles` deep so one cycle's
    token readback overlaps the next cycle's device compute.  Staging to HBM
    and bucket-shape compilation happen before the issuer starts (loadgen's
    untimed LoadSamplesToRam + warmup phase).
    """
    from rnnt_inference_tpu.runtime.native import NativeLoadGen

    psc = performance_sample_count or len(store)
    if len(store) > psc:
        store = store.select(np.arange(psc))
    n = len(store)
    n_queries = max(
        min_query_count, int(np.ceil(target_qps * min_duration_s)),
        samples_per_query, n,
    )

    qsl = (
        QuerySampleLibrary(store, cfg, wav_buckets_s=wav_buckets_s)
        if wav_buckets_s
        else QuerySampleLibrary(store, cfg)
    )
    assert store.kind == "waveform", "native Offline path serves waveforms"
    if packed:
        from rnnt_inference_tpu.runtime.packing import PackedOfflineRunner

        prunner = PackedOfflineRunner(
            weights, params, cfg,
            # lanes capped at the store size (see run_offline); with a mesh
            # the cap still must divide the data-parallel degree
            n_lanes=(
                min(batch_size, len(store)) if mesh is None else batch_size
            ),
            chunk_frames=chunk_frames, batch_size=batch_size,
            decode_chunk=decode_chunk, mesh=mesh,
        )
        plan = prunner.stage(qsl)
        if warmup:
            prunner.run_device()  # compile + one-off lazy costs, untimed
        return _native_offline_loop(
            store, cfg, n, n_queries,
            dispatch=prunner.run_device_async,
            harvest=prunner.harvest,
            max_wall_s=max_wall_s,
            max_inflight_cycles=max_inflight_cycles,
            extra=dict(
                packed=True,
                packing_efficiency=round(plan.packing_efficiency, 4),
                pack_chunks=plan.n_chunks,
                chunk_frames=chunk_frames,
            ),
        )
    runner = OfflineRunner(weights, params, cfg, batch_size, split_len)
    dqsl = qsl.load_to_device(batch_size)
    if warmup:
        runner.warmup_device(dqsl)
        runner.run_device(dqsl)  # untimed priming pass (one-off lazy costs)

    import jax.numpy as jnp  # noqa: F401  (runner dispatch is jitted)

    n_cycles = -(-n_queries // n)
    lg = NativeLoadGen(
        n, target_qps, mode="Offline", min_query_count=n_queries,
    )
    polled = 0
    tokens_first_cycle: dict = {}
    t_host0 = time.time()
    sample_lens = store.lengths  # raw waveform samples per store row
    completed_audio_samples = 0  # summed over ACTUALLY completed queries

    def poll_until(q_max: int) -> None:
        # drain the issuer's bounded queue at least past query q_max (ids
        # arrive in order; the issuer blocks when the queue fills)
        nonlocal polled
        while polled <= q_max:
            got = lg.poll(max_n=4096, timeout_us=100000)
            polled += len(got)
            if not got and lg.done_issuing:
                break

    try:
        inflight: List[tuple] = []  # (cycle_idx, packed, row_indices)

        def complete_cycle(cycle: int, packed, row_indices) -> None:
            packed_np = np.asarray(packed)  # bulk token readback (timed)
            res_all, lens_all = OfflineRunner._unpack(packed_np)
            base = cycle * n
            for r, i in enumerate(row_indices):
                if i < 0:
                    continue
                q = base + int(i)
                if q >= n_queries:
                    continue  # partial last cycle: extra rows are dead work
                poll_until(q)
                if cycle == 0 and int(i) not in tokens_first_cycle:
                    tokens_first_cycle[int(i)] = (
                        res_all[r, : lens_all[r]].astype(np.int32)
                    )
                # attribute this query's audio by its actual sample index:
                # after a max_wall_s break the completed remainder is a
                # bucket-ordered subset, not the first rows (ADVICE r3)
                nonlocal completed_audio_samples
                completed_audio_samples += int(sample_lens[int(i)])
                lg.complete(q)

        for cycle in range(n_cycles):
            if time.time() - t_host0 > max_wall_s:
                break
            pending = []
            rows = []
            for wav, lens, row_index in dqsl.batches():
                pending.append(runner._pipeline_i16(runner.weights, wav, lens))
                rows.append(row_index)
            inflight.append(
                (cycle, jnp.concatenate(pending, axis=0), np.concatenate(rows))
            )
            while len(inflight) >= max_inflight_cycles:
                complete_cycle(*inflight.pop(0))
        while inflight:
            complete_cycle(*inflight.pop(0))
        rep = lg.report()
    finally:
        lg.close()

    wall = rep["wall_seconds"]
    audio_s = completed_audio_samples / cfg.sample_rate
    hyps = [
        seq_to_sen(tokens_first_cycle[i], len(tokens_first_cycle[i]))
        for i in sorted(tokens_first_cycle)
    ]
    report = RunReport(
        scenario="Offline",
        samples=rep["completed"],
        wall_seconds=wall,
        samples_per_second=rep["completed"] / wall if wall else 0.0,
        audio_seconds_per_second=audio_s / wall if wall else 0.0,
        hypotheses=hyps,
        extra=dict(
            completed=rep["completed"],
            issued=rep["issued"],
            qps=rep["qps"],
            performance_sample_count=n,
            queries=n_queries,
            cycles=n_cycles,
            timing="native",
        ),
    )
    return report


def eval_accuracy_log(log_path: str, references: List[str]) -> float:
    """Score an accuracy log against reference transcripts
    (reference: eval_accuracy.py:85-101)."""
    with open(log_path) as f:
        results = json.load(f)
    hyps: List[Optional[str]] = [None] * len(results)
    for r in results:
        seq = hex_to_tokens(r["data"])
        hyps[r["qsl_idx"]] = seq_to_sen(seq, len(seq))
    wer, _, _ = word_error_rate([h or "" for h in hyps], references)
    return wer


def run_single_stream_native(
    weights: RNNTWeights,
    store: SampleStore,
    params: RNNTParams = RNNTParams(),
    cfg: FeaturizerConfig = FeaturizerConfig(),
    min_query_count: int = 0,
    min_duration_s: float = 0.0,
    warmup: bool = True,
    max_wall_s: float = 700.0,
) -> RunReport:
    """SingleStream driven by the native mini-loadgen's issue-after-complete
    mode (csrc/rnnt_loadgen.cpp mode 2): latencies timestamped natively, the
    conf's min_query_count/min_duration rules enforced by the issuer."""
    import jax.numpy as jnp

    from rnnt_inference_tpu.runtime.native import NativeLoadGen

    qsl = QuerySampleLibrary(store, cfg)
    runner = OfflineRunner(weights, params, cfg, batch_size=1)
    if warmup:
        runner.warmup(
            qsl, waveform_mode=(store.kind == "waveform"), packed=True
        )

    lg = NativeLoadGen(
        len(store), target_qps=0.0, mode="SingleStream",
        min_query_count=min_query_count, min_duration_s=min_duration_s,
    )
    hyps: dict = {}
    t_all = time.time()
    audio_s = 0.0
    try:
        while not lg.drained and (time.time() - t_all) < max_wall_s:
            ids = lg.poll(max_n=1, timeout_us=100000)
            for q in ids:
                i = lg.sample_of(q)
                wav, lens, _ = qsl.assemble_waveforms([i])
                # packed tokens+lens row -> ONE host readback per query
                # (separate res + res_lens reads paid two RPC flushes each
                # on relayed backends)
                wav_i16 = jnp.asarray(
                    np.clip(np.round(wav * 32768.0), -32768, 32767).astype(
                        np.int16
                    )
                )
                packed = np.asarray(
                    runner._pipeline_i16(
                        runner.weights, wav_i16, jnp.asarray(lens)
                    )
                )
                res, res_lens = OfflineRunner._unpack(packed)
                n_tok = int(res_lens[0])
                lg.complete(q)
                audio_s += store.samples[i].shape[0] / float(cfg.sample_rate)
                if i not in hyps:
                    hyps[i] = seq_to_sen(res[0, :n_tok].astype(np.int32), n_tok)
        rep = lg.report()
    finally:
        lg.close()

    wall = time.time() - t_all
    report = RunReport(
        scenario="SingleStream",
        samples=rep["completed"],
        wall_seconds=wall,
        samples_per_second=rep["completed"] / wall if wall else 0.0,
        audio_seconds_per_second=audio_s / wall if wall else 0.0,
        hypotheses=[hyps[i] for i in sorted(hyps)],
        extra={k: rep[k] for k in (
            "latency_ms_mean", "latency_ms_p50", "latency_ms_p90",
            "latency_ms_p99", "latency_ms_max", "completed",
        )},
    )
    if any(store.transcripts) and len(hyps) == len(store):
        wer, _, _ = word_error_rate(
            [hyps[i] for i in range(len(store))], store.transcripts
        )
        report.wer = wer
    return report


def run_single_stream(
    weights: RNNTWeights,
    store: SampleStore,
    params: RNNTParams = RNNTParams(),
    cfg: FeaturizerConfig = FeaturizerConfig(),
    split_len: int = -1,
    max_samples: Optional[int] = None,
    warmup: bool = True,
) -> RunReport:
    """SingleStream scenario: one sample at a time, next issued only after
    the previous completes; 90th-percentile latency is the metric
    (reference: configs/mlperf.conf *.SingleStream.target_latency_percentile=90).
    """
    qsl = QuerySampleLibrary(store, cfg)
    runner = OfflineRunner(weights, params, cfg, batch_size=1, split_len=split_len)
    if warmup:
        runner.warmup(qsl, waveform_mode=(store.kind == "waveform"))

    n = min(max_samples or len(store), len(store))
    latencies = []
    hyps = []
    import jax.numpy as jnp

    t_all = time.time()
    for i in range(n):
        t0 = time.time()
        wav, lens, _ = qsl.assemble_waveforms([i])
        res, res_lens = runner._pipeline(
            runner.weights, jnp.asarray(wav), jnp.asarray(lens)
        )
        res = np.asarray(res)
        res_lens = np.asarray(res_lens)
        latencies.append((time.time() - t0) * 1e3)
        hyps.append(seq_to_sen(res[0, : res_lens[0]].astype(np.int32), int(res_lens[0])))
    wall = time.time() - t_all

    lat = np.array(latencies)
    report = RunReport(
        scenario="SingleStream",
        samples=n,
        wall_seconds=wall,
        samples_per_second=n / wall,
        audio_seconds_per_second=sum(
            s.shape[0] for s in store.samples[:n]
        ) / float(cfg.sample_rate) / wall if store.kind == "waveform" else 0.0,
        hypotheses=hyps,
        extra=dict(
            latency_ms_p50=round(float(np.percentile(lat, 50)), 2),
            latency_ms_p90=round(float(np.percentile(lat, 90)), 2),
            latency_ms_p99=round(float(np.percentile(lat, 99)), 2),
        ),
    )
    if any(store.transcripts):
        wer, _, _ = word_error_rate(hyps, store.transcripts[:n])
        report.wer = wer
    return report
