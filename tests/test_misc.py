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
