"""Fused Pallas featurizer: frames -> windowed DFT -> |.|^2 -> mel -> log.

The XLA frontend (ops/features.py) materializes two large intermediates in
HBM: the framed signal (N, T, 320) f32 (~2 GB at batch 1024 x 15 s) and the
power spectrum (N, T, 257) f32 (~1.5 GB), each written once and re-read by
the next matmul.  Round-5 phase attribution (scripts/bench_features_phases,
measurements/features_phases.json) measured the framing materialization at
13.9 ms/batch and the DFT-power stage at ~1.9x its 6-pass MXU roofline —
i.e. the frontend is traffic-bound, not FLOP-bound, which is exactly what a
fused kernel removes: this kernel reads the (preemphasized, padded)
waveform once per frame-tile, builds the frames IN VMEM, runs the three
matmuls back-to-back on the MXU, and writes only the (N, T, 80) log-mel.

Framing without a gather: the reference dims have win_length = 2 x hop
(320 = 2 x 160, configs/rnnt.toml), so with the waveform viewed as
consecutive 160-sample rows, frame t is exactly rows [t, t+1] concatenated.
The kernel takes the SAME waveform twice under two blockings offset by one
row (x_a rows t, x_b rows t+1) and frames = concat(x_a, x_b) per tile —
pure reshapes, no dynamic indexing.

Numerics: identical operations to the XLA path (f32 operands, HIGHEST
matmul precision, same dither/log placement), but a different accumulation
tiling, so features agree to f32 roundoff (~1e-6 relative) rather than
bit-exactly; the adoption gate is token equality on the quant test model
(tests/test_features_pallas.py) plus the golden bundle.

Reference behavior being reproduced: datasets/parts/features.py:186-229
(preemphasis -> stft(center=False) -> power_spectrum -> +dither^2 -> mel
baddbmm -> log), as mapped in ops/features.py.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rnnt_inference_tpu.config import FeaturizerConfig
from rnnt_inference_tpu.ops import features as F


def _mel_kernel(dither2: float):
  def kernel(xa_ref, xb_ref, cos_ref, sin_ref, fb_ref, out_ref):
    TN, FT, hop = xa_ref.shape
    # (TN, FT, hop) rows t / t+1 of the 160-sample row view; flatten the
    # batch tile into the frame axis so the MXU sees ONE (TN*FT, 320)
    # matmul per program (TN=1 measured 70 ms vs XLA's 47 — per-program
    # overhead and small matmuls dominated)
    frames = jnp.concatenate(
        [xa_ref[:].reshape(TN * FT, hop), xb_ref[:].reshape(TN * FT, hop)],
        axis=1,
    )  # (TN*FT, 320) == wav[t*hop : t*hop + 2*hop] per frame
    dot = lambda a, b: jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    re = dot(frames, cos_ref[:])
    im = dot(frames, sin_ref[:])
    spec = re * re + im * im + dither2
    mel = dot(spec, fb_ref[:]) + 1e-20
    out_ref[:] = jnp.log(mel).reshape(TN, FT, fb_ref.shape[1])

  return kernel


@functools.partial(
    jax.jit, static_argnames=("n_frames", "cfg", "interpret")
)
def _fused_mel(
    x: jax.Array,  # (N, S') preemphasized waveform, already front-trimmed
    n_frames: int,
    cfg: FeaturizerConfig,
    interpret: bool = False,
) -> jax.Array:
    """x -> log-mel (N, n_frames, n_mels); frame t reads x[t*hop : t*hop+2*hop]."""
    cos_m, sin_m, fb, (start, flen) = F._frontend_constants(cfg)
    hop = cfg.hop_length
    assert flen == 2 * hop, (
        "fused featurizer assumes win_length == 2*hop_length "
        f"(got support {flen}, hop {hop})"
    )
    N = x.shape[0]
    # frame tile: TN batch rows x FT frames flatten into one (TN*FT, 320)
    # frames tile; VMEM at TN=8, FT=512: frames 5.2 MB + cos/sin 0.7 MB +
    # re/im/spec 12.6 MB + out 1.3 MB — under the default budget, and
    # 4096-row matmuls keep the MXU busy with few grid programs
    FT = min(512, n_frames)
    nb = -(-n_frames // FT)
    TN = 8 if N % 8 == 0 else 1
    # pad so both row views cover nb*FT frames
    need = nb * FT * hop + hop  # + hop: row t+1 of the last frame
    if x.shape[1] < need:
        x = jnp.pad(x, ((0, 0), (0, need - x.shape[1])))
    xa = x[:, : nb * FT * hop].reshape(N, nb * FT, hop)
    xb = x[:, hop : nb * FT * hop + hop].reshape(N, nb * FT, hop)

    kernel = pl.pallas_call(
        _mel_kernel(float(cfg.dither) ** 2),
        grid=(N // TN, nb),
        in_specs=[
            pl.BlockSpec((TN, FT, hop), lambda n, b: (n, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TN, FT, hop), lambda n, b: (n, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((flen, cos_m.shape[1]), lambda n, b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((flen, sin_m.shape[1]), lambda n, b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((fb.shape[1], fb.shape[0]), lambda n, b: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TN, FT, cfg.n_mels), lambda n, b: (n, b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, nb * FT, cfg.n_mels), jnp.float32),
        # TN=8 tiles need ~20 MB of scoped VMEM (> the 16 MB default); raise
        # the cap like ops/lstm_pallas.py's int8 kernel does
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )
    mel = kernel(xa, xb, jnp.asarray(cos_m), jnp.asarray(sin_m),
                 jnp.asarray(fb.T.copy()))
    return mel[:, :n_frames]


def log_mel_features_pallas(
    x: jax.Array,
    x_lens: jax.Array,
    cfg: FeaturizerConfig = FeaturizerConfig(),
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Drop-in replacement for ops.features.log_mel_features with the
    frames->DFT->power->mel->log middle fused into one Pallas kernel.
    Preemphasis/padding (cheap elementwise) and splice/normalize (need
    cross-frame/utterance reductions) stay in XLA, unchanged."""
    cos_m, sin_m, fb, (start, flen) = F._frontend_constants(cfg)
    del cos_m, sin_m, fb
    N, S = x.shape
    pad = cfg.n_fft // 2
    T = S // cfg.hop_length + 1

    x = F.preemphasis(x, x_lens, cfg.preemph)
    mode = "constant" if cfg.pad_mode == "zeros" else cfg.pad_mode
    x = jnp.pad(x, ((0, 0), (pad, pad)), mode=mode)
    x = x[:, start:]  # frame t begins at t*hop + start in the padded signal

    mel = _fused_mel(x, T, cfg, interpret=interpret)  # (N, T, 80)
    frame_lens = x_lens // cfg.hop_length + 1

    # identical tail to ops.features.log_mel_features
    t_idx = jnp.arange(mel.shape[1])[None, :, None]
    mel = jnp.where(t_idx < frame_lens[:, None, None], mel, 0.0)
    if cfg.frame_splicing > 1:
        mel = F.frame_splice(mel, cfg.frame_splicing)
    out_lens = -(-frame_lens // cfg.frame_splicing)
    if cfg.normalize == "per_feature":
        mel = F.normalize_per_feature(mel, out_lens)
    Tm = mel.shape[1]
    valid = jnp.arange(Tm)[None, :, None] < out_lens[:, None, None]
    mel = jnp.where(valid, mel, 0.0)
    return mel.transpose(1, 0, 2), out_lens.astype(jnp.int32)
