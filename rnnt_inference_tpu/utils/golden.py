"""Golden-bundle generation: the quantization-semantics regression anchor
(VERDICT r3 item 8).

Real dev-clean WER is unreachable in this image (no checkpoint, no corpus),
so the oracle chain IS the accuracy contract.  This module computes, on CPU
with fixed seeds, the greedy-decode tokens of a small model over synthetic
utterances under every numeric mode the framework ships:

  f32         plain float pipeline
  fake_quant  fake-quantized weights (rounding isolated from kernels;
              reference run_mode fake_quant, main.py:90-96)
  quant       real int8 encoder execution
  packed      quant weights + the sequence-packed Offline path

(A fifth mode, the label-looping decode schedule, was golden-pinned while
it existed; it measured slower than the standard loop in every regime and
was deleted in round 4 — docs/PERFORMANCE.md keeps the record.)

The committed bundle (tests/golden/golden.npz) pins these token sequences
byte-for-byte; tests/test_golden.py recomputes and compares, so ANY
regression in quantization scale algebra, decode mask algebra, packing, or
the featurizer fails CI loudly.  Reference methodology analog: golden
transcript diffing, tests/cmp_res.py:16-28.

Regenerate (only after an INTENDED semantic change, with justification in
the commit message):  python scripts/make_golden.py
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

# seed 21 chosen at authoring time because int8 rounding flips tokens in
# 8/8 sequences and fake-quant in 3/8 (seeds 7/13 produced quant==f32:
# a non-discriminating bundle, rejected by test_quant_differs_from_f32)
SEED_WEIGHTS = 21
SEED_STORE = 11
N_SAMPLES = 8


def _small_params():
    from rnnt_inference_tpu.config import RNNTParams

    return RNNTParams(
        trans_input_size=240,
        trans_hidden_size=64,
        pred_hidden_size=32,
        joint_hidden_size=32,
        max_res_len=128,
    )


def compute_golden() -> Dict[str, List[np.ndarray]]:
    """Returns {mode: [tokens per sample]} — deterministic on CPU."""
    import jax
    import jax.numpy as jnp

    from rnnt_inference_tpu.config import FeaturizerConfig
    from rnnt_inference_tpu.data.dataset import SampleStore
    from rnnt_inference_tpu.models.decoder import greedy_decode
    from rnnt_inference_tpu.models.quant import (
        calibrate,
        fake_quantize_weights,
        quantize_weights,
    )
    from rnnt_inference_tpu.models.weights import init_weights
    from rnnt_inference_tpu.ops.features import log_mel_features
    from rnnt_inference_tpu.runtime.packing import PackedOfflineRunner
    from rnnt_inference_tpu.runtime.qsl import QuerySampleLibrary

    params = _small_params()
    cfg = FeaturizerConfig()
    store = SampleStore.synthetic(
        n=N_SAMPLES, seed=SEED_STORE, min_seconds=0.4, max_seconds=2.0,
        mean_seconds=1.0,
    )
    w32 = init_weights(jax.random.PRNGKey(SEED_WEIGHTS), params, dtype=jnp.float32)
    xc = jax.random.normal(
        jax.random.PRNGKey(SEED_WEIGHTS + 1), (16, 4, params.trans_input_size)
    )
    lc = jnp.full((4,), 16, jnp.int32)
    calib = calibrate(w32, [(xc, lc)], params)
    wq = quantize_weights(w32, calib, params)
    wfq = fake_quantize_weights(w32, calib, params)

    featurize = jax.jit(log_mel_features, static_argnames="cfg")

    def decode_all(weights) -> List[np.ndarray]:
        toks = []
        for s in store.samples:
            wav = jnp.asarray(s[None, :])
            lens = jnp.asarray([s.shape[0]], jnp.int32)
            feats, flens = featurize(wav, lens, cfg)
            res, rlens = greedy_decode(weights, feats, flens, params=params)
            toks.append(np.asarray(res)[0, : int(rlens[0])].astype(np.int32))
        return toks

    out: Dict[str, List[np.ndarray]] = {}
    out["f32"] = decode_all(w32)
    out["fake_quant"] = decode_all(wfq)
    out["quant"] = decode_all(wq)

    qsl = QuerySampleLibrary(store, cfg, wav_buckets_s=(1.0, 2.0))
    runner = PackedOfflineRunner(
        wq, params, cfg, n_lanes=3, chunk_frames=16, batch_size=4
    )
    runner.stage(qsl)
    out["packed"] = [t.astype(np.int32) for t in runner.run_device().tokens]
    return out


def save_golden(path: str) -> None:
    golden = compute_golden()
    arrays = {}
    for mode, toks in golden.items():
        for i, t in enumerate(toks):
            arrays[f"{mode}_{i:02d}"] = t
    np.savez(path, **arrays)


def load_golden(path: str) -> Dict[str, List[np.ndarray]]:
    data = np.load(path)
    out: Dict[str, List[np.ndarray]] = {}
    for key in sorted(data.files):
        mode, _, idx = key.rpartition("_")
        out.setdefault(mode, []).append(data[key])
    return out
