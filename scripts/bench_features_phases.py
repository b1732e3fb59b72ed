"""Frontend phase attribution with the dispatch-free device-loop protocol
(VERDICT r4 item 5: "measure where the 46.6 ms goes").

The log-mel frontend (ops/features.py) is pure XLA; before building the
SURVEY-planned fused Pallas featurizer we need to know which stage actually
costs: framing gather, DFT matmuls (MXU), mel+log, or splice+normalize
(VPU/HBM).  Standalone per-stage timings through the relay are unreliable
(CLAUDE.md), so each CUMULATIVE prefix of the pipeline is chained inside one
jitted fori_loop (data dependence via one output element folded back into
the input) and timed with a single readback; stage cost = consecutive
difference of the prefix medians.

Prefixes:
  p0: preemphasis + framing (gather/reshape traffic)
  p1: + windowed-DFT power spectrum (the two big MXU matmuls)
  p2: + dither + mel matmul + log
  p3: + splice + normalize + mask + transpose  (the full frontend)

Usage: python scripts/bench_features_phases.py [N] [SECS]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from rnnt_inference_tpu.config import FeaturizerConfig
from rnnt_inference_tpu.ops import features as F


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    secs = float(sys.argv[2]) if len(sys.argv) > 2 else 15.0
    cfg = FeaturizerConfig()
    S = int(secs * cfg.sample_rate)
    rng = np.random.RandomState(0)
    wav0 = jnp.asarray((rng.randn(N, S) * 0.1).astype(np.float32))
    lens = jnp.full((N,), S, jnp.int32)
    iters = 10

    cos_m, sin_m, fb, support = F._frontend_constants(cfg)
    cos_j, sin_j = jnp.asarray(cos_m), jnp.asarray(sin_m)
    fb_t = jnp.asarray(fb.T)

    def prefix(stage):
        """wav -> scalar: the pipeline truncated after `stage`."""

        def run(x):
            y = F.preemphasis(x, lens, cfg.preemph)
            frames = F.frame_signal(
                y, cfg.n_fft, cfg.hop_length, cfg.pad_mode, support=support
            )
            if stage == 0:
                return frames[0, 0, 0]
            spec = F.power_spectrum(frames, cos_j, sin_j)
            if stage == 1:
                return spec[0, 0, 0]
            frame_lens = lens // cfg.hop_length + 1
            mel = jnp.dot(
                (spec + cfg.dither**2).astype(jnp.float32), fb_t,
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            ) + 1e-20
            mel = jnp.log(mel)
            if stage == 2:
                return mel[0, 0, 0]
            t_idx = jnp.arange(mel.shape[1])[None, :, None]
            mel = jnp.where(t_idx < frame_lens[:, None, None], mel, 0.0)
            mel = F.frame_splice(mel, cfg.frame_splicing)
            out_lens = -(-frame_lens // cfg.frame_splicing)
            mel = F.normalize_per_feature(mel, out_lens)
            T = mel.shape[1]
            valid = jnp.arange(T)[None, :, None] < out_lens[:, None, None]
            mel = jnp.where(valid, mel, 0.0)
            return mel.transpose(1, 0, 2)[0, 0, 0]

        @jax.jit
        def chained(x):
            def body(_, xc):
                return xc + run(xc) * 0  # data dependence blocks hoisting

            return jax.lax.fori_loop(0, iters, body, x)

        return chained

    results = {}
    for stage, name in enumerate(
        ["framing", "dft_power", "mel_log", "splice_norm"]
    ):
        fn = prefix(stage)
        np.asarray(fn(wav0)[0, 0])  # compile + warm
        walls = []
        for _ in range(5):
            t0 = time.time()
            np.asarray(fn(wav0)[0, 0])
            walls.append((time.time() - t0) / iters * 1e3)
        results[f"p{stage}_{name}"] = float(np.median(walls))
        log(f"prefix p{stage} ({name}): {results[f'p{stage}_{name}']:.1f} "
            f"ms/batch (reps {['%.1f' % w for w in walls]})")

    keys = sorted(results)
    deltas = {}
    prev = 0.0
    for k in keys:
        deltas["d_" + k] = round(results[k] - prev, 1)
        prev = results[k]
    log(f"stage deltas: {deltas}")

    print(json.dumps({
        "metric": "frontend_phase_ms",
        "value": round(results[keys[-1]], 1),
        "unit": "ms",
        **{k: round(v, 1) for k, v in results.items()},
        **deltas,
        "N": N, "secs": secs, "iters": iters,
    }))


if __name__ == "__main__":
    main()
