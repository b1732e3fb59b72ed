"""Feature-frontend parity vs a torch.stft-based oracle of the reference
pipeline (datasets/parts/features.py:186-252 semantics)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from rnnt_inference_tpu.config import FeaturizerConfig
from rnnt_inference_tpu.ops.features import (
    frame_splice,
    hann_window,
    log_mel_features,
    mel_filterbank,
    normalize_per_feature,
    preemphasis,
)


def torch_ref_features(x_np, lens_np, cfg: FeaturizerConfig):
    """Eager torch oracle: preemphasis -> stft -> |.|^2 -> +dither^2
    -> mel -> log -> splice x3 -> per-feature normalize -> zero pad frames.

    pad_mode "zeros" is modeled the way the reference SUT does it: explicit
    zero-pad of n_fft//2 around the preemphasized signal followed by
    torch.stft(center=False) (reference: datasets/parts/features.py:196-210,
    preemphasis op pad_size=n_fft//2).  "reflect" uses torch.stft(center=True).
    """
    x = torch.as_tensor(x_np.copy())
    lens = torch.as_tensor(lens_np)
    N, S = x.shape
    # masked preemphasis
    y = x - cfg.preemph * torch.nn.functional.pad(x[:, :-1], (1, 0))
    t = torch.arange(S)[None, :]
    y = torch.where(t < lens[:, None], y, torch.zeros(())).to(torch.float32)

    win = torch.from_numpy(hann_window(cfg.win_length))
    if cfg.pad_mode == "zeros":
        y_padded = torch.nn.functional.pad(y, (cfg.n_fft // 2, cfg.n_fft // 2))
        spec = torch.stft(
            y_padded,
            n_fft=cfg.n_fft,
            hop_length=cfg.hop_length,
            win_length=cfg.win_length,
            window=win,
            center=False,
            return_complex=True,
        )  # (N, F, T)
    else:
        spec = torch.stft(
            y,
            n_fft=cfg.n_fft,
            hop_length=cfg.hop_length,
            win_length=cfg.win_length,
            window=win,
            center=True,
            pad_mode="reflect",
            return_complex=True,
        )  # (N, F, T)
    power = spec.real**2 + spec.imag**2
    frame_lens = torch.div(lens, cfg.hop_length, rounding_mode="floor") + 1
    power = power + cfg.dither**2

    fb = torch.from_numpy(mel_filterbank(cfg.sample_rate, cfg.n_fft, cfg.n_mels, cfg.lowfreq, cfg.fmax))
    mel = torch.log(fb @ power + 1e-20)  # (N, n_mels, T)

    # zero frames past each row's frame count before splicing (models the
    # reference's length-aware frame_splicing(x, x_lens) op: padded frames
    # contribute zeros, not the dither-floor log-mel of silent padding)
    t = torch.arange(mel.shape[2])[None, None, :]
    mel = torch.where(t < frame_lens[:, None, None], mel, torch.zeros(()))

    # frame splicing x3 (reference splice_frames)
    seq = [mel]
    for n in range(1, cfg.frame_splicing):
        tmp = torch.zeros_like(mel)
        tmp[:, :, :-n] = mel[:, :, n:]
        seq.append(tmp)
    spliced = torch.cat(seq, dim=1)[:, :, :: cfg.frame_splicing]  # (N, C*3, T')
    out_lens = torch.div(frame_lens + cfg.frame_splicing - 1, cfg.frame_splicing, rounding_mode="floor")

    # per-feature normalize over valid frames (unbiased std + 1e-5)
    out = spliced.clone()
    for i in range(N):
        L = int(out_lens[i])
        m = spliced[i, :, :L].mean(dim=1)
        s = spliced[i, :, :L].std(dim=1) + 1e-5
        out[i] = (spliced[i] - m[:, None]) / s[:, None]
        out[i, :, L:] = 0.0
    return out.permute(2, 0, 1).numpy(), out_lens.numpy().astype(np.int32)


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("pad_mode", ["zeros", "reflect"])
def test_log_mel_features_match_torch(seed, pad_mode):
    cfg = FeaturizerConfig(pad_mode=pad_mode)
    rng = np.random.RandomState(seed)
    N = 3
    S = 16000  # 1 s
    x = (rng.randn(N, S) * 0.1).astype(np.float32)
    lens = np.array([S, S - 4000, S // 2], dtype=np.int32)

    feats, out_lens = jax.jit(log_mel_features, static_argnames="cfg")(
        jnp.asarray(x), jnp.asarray(lens), cfg
    )
    ref, ref_lens = torch_ref_features(x, lens, cfg)

    np.testing.assert_array_equal(np.asarray(out_lens), ref_lens)
    assert feats.shape == ref.shape
    np.testing.assert_allclose(np.asarray(feats), ref, rtol=1e-3, atol=2e-3)


def test_frame_splice_matches_reference_logic():
    x = jnp.asarray(np.random.RandomState(0).randn(2, 10, 4).astype(np.float32))
    out = frame_splice(x, 3)
    assert out.shape == (2, 4, 12)
    # frame 0 of output = [x0, x1, x2] channel-stacked
    np.testing.assert_allclose(
        np.asarray(out[:, 0]),
        np.concatenate([np.asarray(x[:, 0]), np.asarray(x[:, 1]), np.asarray(x[:, 2])], -1),
    )
    # last output frame (t=9) has zeros for the x[10], x[11] shifts
    np.testing.assert_allclose(np.asarray(out[:, 3, 4:]), np.zeros((2, 8)), atol=0)


def test_mel_filterbank_properties():
    fb = mel_filterbank(16000, 512, 80, 0.0, 8000.0)
    assert fb.shape == (80, 257)
    assert np.all(fb >= 0)
    # every filter has nonzero support and slaney normalization keeps peak < 1
    assert np.all(fb.sum(axis=1) > 0)
    assert fb.max() < 0.1


def test_preemphasis_masking():
    x = jnp.ones((1, 10))
    lens = jnp.array([6], jnp.int32)
    y = preemphasis(x, lens, 0.97)
    np.testing.assert_allclose(np.asarray(y[0, 6:]), np.zeros(4))
    assert abs(float(y[0, 0]) - 1.0) < 1e-6
    np.testing.assert_allclose(np.asarray(y[0, 1:6]), np.full(5, 0.03), rtol=1e-5)


def test_radix2_power_spectrum_matches_direct():
    """power_spectrum_radix2 (documented negative perf result on TPU, kept
    as an exact alternative formulation) must match the direct DFT."""
    from rnnt_inference_tpu.ops.features import (
        _frontend_constants,
        power_spectrum,
        power_spectrum_radix2,
    )

    cfg = FeaturizerConfig()
    cos_m, sin_m, _, (start, flen) = _frontend_constants(cfg)
    frames = jnp.asarray(np.random.RandomState(1).randn(2, 5, 512).astype(np.float32))
    # the direct matrices are trimmed to the window support; radix2 takes
    # full n_fft frames (the window is zero outside the support either way)
    a = np.asarray(
        power_spectrum(
            frames[..., start : start + flen], jnp.asarray(cos_m), jnp.asarray(sin_m)
        )
    )
    b = np.asarray(power_spectrum_radix2(frames, cfg))
    np.testing.assert_allclose(b, a, rtol=2e-4, atol=1e-3)


def test_bf16_feature_matmuls():
    """bf16 DFT/mel matmul operands (f32 accumulate) were measured-REJECTED:
    the log stage amplifies bf16 cancellation error in low-power DFT bins
    (destructive interference leaves |X_k|^2 near the dither floor where
    relative error explodes).  Measured drift on normalized features: p50
    ~1e-3 (harmless) but p99 ~0.1 and max ~1.0 — past the int8 quantization
    step, so the fake-quant token-equality gate fails and f32 is the
    contract (VERDICT r2 item 5: "keep f32 if tokens shift").  The bf16 mode
    is reachable ONLY through this test fixture (_set_matmul_dtype) — the
    former RNNT_FEATURE_DTYPE env knob was demoted because a serving process
    could silently inherit rejected numerics from the environment
    (VERDICT r4 item 7)."""
    import jax
    import jax.numpy as jnp

    from rnnt_inference_tpu.config import FeaturizerConfig
    from rnnt_inference_tpu.ops import features as F

    cfg = FeaturizerConfig()
    rng = np.random.RandomState(0)
    wav = jnp.asarray(rng.randn(3, 32000).astype(np.float32) * 0.1)
    lens = jnp.asarray([32000, 17000, 9000], jnp.int32)

    f32_out, l32 = jax.jit(lambda a, b: F.log_mel_features(a, b, cfg))(wav, lens)
    F._set_matmul_dtype(jnp.bfloat16)
    try:
        # fresh trace: matmul_dtype() is read at trace time
        bf_out, lbf = jax.jit(lambda a, b: F.log_mel_features(a, b, cfg))(wav, lens)
    finally:
        F._set_matmul_dtype(jnp.float32)
    assert np.array_equal(np.asarray(l32), np.asarray(lbf))
    d = np.abs(np.asarray(bf_out) - np.asarray(f32_out))
    # bulk of the features are fine; the tail is what kills the token gate
    assert np.percentile(d, 50) < 0.01
    assert d.max() < 2.0  # sanity: same pipeline, not garbage
    # document the failing gate: tail drift exceeds the ~0.05 int8 step
    assert np.percentile(d, 99) > 0.02, (
        "tail drift shrank below the int8 step — re-evaluate enabling bf16 "
        "features by default (docs/PERFORMANCE.md bf16-featurizer entry)"
    )


def test_fused_pallas_featurizer_matches_xla():
    """ops/features_pallas.py (fused frames->DFT->power->mel->log kernel)
    agrees with the XLA frontend to f32 roundoff: same operations and
    precision, different accumulation tiling.  Kept as an A/B candidate —
    round-5 TPU timing had it SLOWER than XLA (docs/PERFORMANCE.md), but
    the numerics contract is pinned here so it stays usable."""
    import jax
    import jax.numpy as jnp

    from rnnt_inference_tpu.config import FeaturizerConfig
    from rnnt_inference_tpu.ops.features import log_mel_features
    from rnnt_inference_tpu.ops.features_pallas import log_mel_features_pallas

    cfg = FeaturizerConfig()
    rng = np.random.RandomState(0)
    wav = jnp.asarray(rng.randn(8, 24000).astype(np.float32) * 0.1)
    lens = jnp.asarray([24000] * 4 + [17000, 9000, 5000, 24000], jnp.int32)
    a, la = jax.jit(lambda x, l: log_mel_features(x, l, cfg))(wav, lens)
    b, lb = jax.jit(
        lambda x, l: log_mel_features_pallas(x, l, cfg, interpret=True)
    )(wav, lens)
    assert np.array_equal(np.asarray(la), np.asarray(lb))
    d = np.abs(np.asarray(a) - np.asarray(b))
    assert d.max() < 5e-4, f"fused featurizer drift {d.max()}"
