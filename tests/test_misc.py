"""Coverage for smaller subsystems: fake_quant, SingleStream, conf parsing,
profiler timeline, manifest."""

import json

import numpy as np
import jax
import jax.numpy as jnp

from rnnt_inference_tpu.config import FeaturizerConfig, RNNTParams
from rnnt_inference_tpu.data.dataset import SampleStore
from rnnt_inference_tpu.models.decoder import greedy_decode
from rnnt_inference_tpu.models.quant import calibrate, fake_quantize_weights
from rnnt_inference_tpu.models.weights import init_weights
from rnnt_inference_tpu.runtime.config import TestSettings
from rnnt_inference_tpu.runtime.harness import run_single_stream
from rnnt_inference_tpu.utils.profiler import BatchTimeline

import os
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SMALL = RNNTParams(
    trans_input_size=240,
    trans_hidden_size=64,
    pred_hidden_size=32,
    joint_hidden_size=32,
    max_res_len=128,
)


def test_fake_quant_close_to_f32():
    params = SMALL
    w = init_weights(jax.random.PRNGKey(0), params)
    x = jax.random.normal(jax.random.PRNGKey(1), (10, 2, params.trans_input_size))
    lens = jnp.full((2,), 10, jnp.int32)
    calib = calibrate(w, [(x, lens)], params)
    fq = fake_quantize_weights(w, calib, params)
    # weights differ but only by quantization rounding
    d = np.abs(np.asarray(fq.pre_rnn[0].w_ih) - np.asarray(w.pre_rnn[0].w_ih)).max()
    amax = np.abs(np.asarray(w.pre_rnn[0].w_ih)).max()
    assert 0 < d <= amax / 127.0 + 1e-6
    res, _ = greedy_decode(fq, x, lens, params=params)
    assert res.shape[0] == 2


def test_single_stream(tmp_path):
    store = SampleStore.synthetic(
        n=4, seed=0, min_seconds=0.3, max_seconds=1.0, mean_seconds=0.5
    )
    w = init_weights(jax.random.PRNGKey(0), SMALL)
    report = run_single_stream(w, store, SMALL, FeaturizerConfig(), warmup=False)
    s = report.summary()
    assert s["scenario"] == "SingleStream"
    assert s["samples"] == 4
    assert s["latency_ms_p90"] >= s["latency_ms_p50"] > 0


def test_conf_wildcards(tmp_path):
    conf = tmp_path / "a.conf"
    conf.write_text(
        "*.*.min_duration = 1000\nrnnt.Server.target_latency = 500\n"
        "*.Offline.target_qps = 123\n"
    )
    s = TestSettings.from_conf(str(conf), None, "rnnt", "Server")
    assert s.target_latency_ms == 500
    assert s.min_duration_ms == 1000
    s2 = TestSettings.from_conf(str(conf), None, "rnnt", "Offline")
    assert s2.target_qps == 123


def test_batch_timeline(tmp_path):
    tl = BatchTimeline()
    with tl.span("batch", size=4):
        pass
    tl.mark("done")
    out = tmp_path / "trace.json"
    tl.save(str(out))
    data = json.loads(out.read_text())
    assert len(data["traceEvents"]) == 2
    assert data["traceEvents"][0]["name"] == "batch"


def test_check_calib_cross_reference(tmp_path):
    """scripts/check_calib.py parses the TRT cache format (name: big-endian
    hex f32 scale) and passes a calibration whose shared cat(x,h) amaxes
    match the reconstructed NV values."""
    import struct
    import subprocess
    import sys

    import numpy as np

    hx = lambda v: struct.pack(">f", v).hex()
    # synthetic NV table: input amax 5.84 -> scale/127, hiddens ~1, outputs ~1
    lines = ["TRT-8001-MinMaxCalibration"]
    vals = {"input": 5.84}
    for pre in range(2):
        vals[f"encoder.pre_rnn.lstm{pre}_hidden"] = 0.95 + 0.01 * pre
        vals[f"encoder.pre_rnn.lstm{pre}_output"] = 1.0 + 0.01 * pre
    for post in range(3):
        vals[f"encoder.post_rnn.lstm{post}_hidden"] = 0.9 + 0.01 * post
        vals[f"encoder.post_rnn.lstm{post}_output"] = 1.02 + 0.01 * post
    for k, v in vals.items():
        lines.append(f"{k}: {hx(v / 127.0)}")
    cache = tmp_path / "nv.cache"
    cache.write_text("\n".join(lines))

    # write through the REAL artifact API (models.checkpoint.save_calib):
    # a hand-built npz with raw keys let check_calib drift out of sync with
    # the flattened-pytree format main.py actually saves (round-5 fix)
    from rnnt_inference_tpu.models.checkpoint import save_calib
    from rnnt_inference_tpu.models.quant import CalibState

    pre_amax = [max(5.84, 0.95), max(1.0, 0.96)]
    post_amax = [max(1.01, 0.9), max(1.02, 0.91), max(1.03, 0.92)]
    calib = tmp_path / "calib.npz"
    save_calib(str(calib), CalibState(
        pre_amax=np.array(pre_amax), post_amax=np.array(post_amax)
    ))

    r = subprocess.run(
        [sys.executable, "scripts/check_calib.py", "--cache", str(cache),
         "--calib", str(calib), "--rtol", "0.05"],
        capture_output=True, text=True, cwd=REPO,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert "OK" in r.stdout

    # an out-of-range amax must fail the gate
    save_calib(str(calib), CalibState(
        pre_amax=np.array([50.0, pre_amax[1]]),
        post_amax=np.array(post_amax),
    ))
    r = subprocess.run(
        [sys.executable, "scripts/check_calib.py", "--cache", str(cache),
         "--calib", str(calib), "--rtol", "0.05"],
        capture_output=True, text=True, cwd=REPO,
    )
    assert r.returncode == 1
