"""CLI entry point (rnnt_inference_tpu.main): the staged flow of the
reference's models/main.py — calibrate -> quantize -> accuracy run — plus
SingleStream, exercised end-to-end through parse_args/main on tiny
synthetic stores at full model dims."""

import json
import os

import numpy as np
import pytest

from rnnt_inference_tpu.data.dataset import SampleStore
from rnnt_inference_tpu.main import main


def _tiny_store(tmp_path, n=4, seed=0, name="store.npz"):
    store = SampleStore.synthetic(
        n=n, seed=seed, min_seconds=0.3, max_seconds=0.6, mean_seconds=0.4
    )
    store.transcripts = ["hello world"] * n
    p = tmp_path / name
    store.save(str(p))
    return str(p)


def test_staged_calibrate_quantize_accuracy(tmp_path):
    """Full pipeline: --calibration writes amaxes, --save_quant writes the
    int8 model, --accuracy runs it and writes summary + accuracy log
    (reference: main.py:22-85 staged flow)."""
    store_path = _tiny_store(tmp_path)
    calib_path = str(tmp_path / "calib.npz")
    quant_path = str(tmp_path / "quant.npz")
    out_dir = str(tmp_path / "out")

    main([
        "--run_mode", "f32",
        "--calibration", "--calib_file", store_path,
        "--calib_out", calib_path,
        "--save_quant", "--calib_in", calib_path,
        "--quant_out", quant_path,
        "--batch_size", "4",
    ])
    assert os.path.exists(calib_path) and os.path.exists(quant_path)

    main([
        "--quant_in", quant_path,
        "--accuracy", "--scenario", "Offline",
        "--sample_file", store_path,
        "--batch_size", "4",
        "--output_dir", out_dir,
    ])
    summary = json.load(open(os.path.join(out_dir, "summary.json")))
    assert summary["scenario"] == "Offline"
    assert "wer_percent" in summary
    acc = json.load(open(os.path.join(out_dir, "accuracy_log.json")))
    assert len(acc) == 4
    assert all(set(e) == {"qsl_idx", "data"} for e in acc)


def test_fake_quant_accuracy_run(tmp_path):
    """--run_mode fake_quant (quantization-error triage, reference
    quant_lstm.py:162-183) runs end-to-end from a calibration file."""
    store_path = _tiny_store(tmp_path, n=2, seed=2)
    calib_path = str(tmp_path / "calib.npz")
    main([
        "--run_mode", "f32",
        "--calibration", "--calib_file", store_path,
        "--calib_out", calib_path,
        "--batch_size", "2",
    ])
    out_dir = str(tmp_path / "out_fq")
    main([
        "--run_mode", "fake_quant", "--calib_in", calib_path,
        "--accuracy", "--scenario", "Offline",
        "--sample_file", store_path,
        "--batch_size", "2",
        "--output_dir", out_dir,
    ])
    summary = json.load(open(os.path.join(out_dir, "summary.json")))
    assert "wer_percent" in summary


def test_single_stream_benchmark(tmp_path):
    """SingleStream benchmark honoring tiny conf rules, verdict emitted."""
    store_path = _tiny_store(tmp_path, n=3, seed=1)
    conf = tmp_path / "user.conf"
    conf.write_text(
        "rnnt.SingleStream.min_query_count = 3\n"
        "rnnt.SingleStream.min_duration = 0\n"
        "rnnt.SingleStream.target_latency = 60000\n"
    )
    out_dir = str(tmp_path / "out_ss")
    main([
        "--benchmark", "--scenario", "SingleStream",
        "--sample_file", store_path,
        "--user_conf", str(conf),
        "--output_dir", out_dir,
    ])
    summary = json.load(open(os.path.join(out_dir, "summary.json")))
    assert summary["scenario"] == "SingleStream"
    assert summary["result_validity"] in ("VALID", "INVALID")


def test_offline_native_benchmark_with_psc(tmp_path):
    """Offline performance run through the native issuer: the conf's
    performance_sample_count restricts the QSL and min_query_count cycles
    queries over it (reference: configs/mlperf.conf:13, csrc/main.cpp:108-147
    where loadgen owns Offline timing)."""
    store_path = _tiny_store(tmp_path, n=5, seed=2)
    conf = tmp_path / "user.conf"
    conf.write_text(
        "rnnt.*.performance_sample_count_override = 3\n"
        "rnnt.Offline.min_query_count = 7\n"
        "rnnt.Offline.min_duration = 0\n"
        "rnnt.Offline.target_qps = 10\n"
    )
    out_dir = str(tmp_path / "out_native")
    main([
        "--benchmark", "--scenario", "Offline", "--native_loadgen",
        "--sample_file", store_path,
        "--batch_size", "4",
        "--user_conf", str(conf),
        "--output_dir", out_dir,
    ])
    summary = json.load(open(os.path.join(out_dir, "summary.json")))
    assert summary["scenario"] == "Offline"
    assert summary["performance_sample_count"] == 3
    assert summary["completed"] == 7
    assert summary["timing"] == "native"
    assert summary["result_validity"] in ("VALID", "INVALID")


def test_cmp_res_golden_diff_flow(tmp_path):
    """The golden-diff workflow (reference tests/cmp_res.py): produce
    hypotheses.log from two runs' accuracy logs and diff them.  A re-run of
    the same quant model must be transcript-identical (determinism gate);
    the fake_quant-vs-quant diff exercises the mismatch-reporting path."""
    import sys as _sys

    _sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from cmp_res import main as cmp_main

    from rnnt_inference_tpu.runtime.harness import hex_to_tokens
    from rnnt_inference_tpu.utils.labels import seq_to_sen

    store_path = _tiny_store(tmp_path, n=3, seed=5)
    calib_path = str(tmp_path / "calib.npz")
    quant_path = str(tmp_path / "quant.npz")
    main([
        "--run_mode", "f32",
        "--calibration", "--calib_file", store_path,
        "--calib_out", calib_path,
        "--save_quant", "--calib_in", calib_path,
        "--quant_out", quant_path,
        "--batch_size", "4",
    ])

    def run_and_dump(out_name, extra):
        out_dir = str(tmp_path / out_name)
        main(extra + [
            "--accuracy", "--scenario", "Offline",
            "--sample_file", store_path,
            "--batch_size", "4",
            "--output_dir", out_dir,
        ])
        acc = json.load(open(os.path.join(out_dir, "accuracy_log.json")))
        log = str(tmp_path / f"{out_name}.hyp.log")
        with open(log, "w") as f:
            for e in acc:
                seq = hex_to_tokens(e["data"])
                f.write(f"{e['qsl_idx']}::{seq_to_sen(seq, len(seq))}\n")
        return log

    quant_a = run_and_dump("out_qa", ["--quant_in", quant_path])
    quant_b = run_and_dump("out_qb", ["--quant_in", quant_path])
    fq = run_and_dump(
        "out_fq2", ["--run_mode", "fake_quant", "--calib_in", calib_path]
    )
    assert cmp_main([quant_a, quant_b]) == 0  # deterministic re-run
    cmp_main([quant_a, fq])  # mismatch path runs (count may be non-zero)


def test_offline_packed_default_and_optout(tmp_path):
    """--packed serves the sequence-packed path from the product CLI
    (VERDICT r4 item 1: the headline mode must be product-reachable); the
    bare default at the product decode cap (30) is the bucketed path —
    the measured winner in that regime (round-5 A/B) — and both modes
    produce the same accuracy artifacts."""
    # snap the synthetic waveforms to the int16 grid (real LibriSpeech IS
    # 16-bit PCM): the packed path stages audio as int16 — bit-exact for
    # 16-bit sources, but a raw f32 synthetic store would round, and bf16
    # weights can flip a token on that sub-int16 difference
    store = SampleStore.synthetic(
        n=4, seed=5, min_seconds=0.3, max_seconds=0.6, mean_seconds=0.4
    )
    store.samples = [
        np.clip(np.round(s * 32768.0), -32768, 32767) / 32768.0
        for s in store.samples
    ]
    store.transcripts = ["hello world"] * 4
    store_path = str(tmp_path / "store_i16.npz")
    store.save(store_path)
    out_p = str(tmp_path / "out_packed")
    main([
        "--accuracy", "--scenario", "Offline", "--packed",
        "--sample_file", store_path,
        "--batch_size", "4", "--pack_chunk", "8",
        "--output_dir", out_p,
    ])
    summary = json.load(open(os.path.join(out_p, "summary.json")))
    assert "packing_efficiency" in summary

    out_b = str(tmp_path / "out_bucketed")
    main([
        "--accuracy", "--scenario", "Offline",
        "--sample_file", store_path,
        "--batch_size", "4",
        "--output_dir", out_b,
    ])
    summary_b = json.load(open(os.path.join(out_b, "summary.json")))
    # bare default at the product cap (30) = bucketed
    assert "packing_efficiency" not in summary_b
    acc_p = json.load(open(os.path.join(out_p, "accuracy_log.json")))
    acc_b = json.load(open(os.path.join(out_b, "accuracy_log.json")))
    assert [r["data"] for r in acc_p] == [r["data"] for r in acc_b]
