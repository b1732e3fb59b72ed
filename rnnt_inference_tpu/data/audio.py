"""Waveform loading without librosa/soundfile (not in this image).

WAV via stdlib `wave` / scipy; FLAC decode is gated with a clear error —
LibriSpeech prep on this framework expects .wav (convert offline with any
flac tool; the reference used sox, datasets/process_librispeech.py:31-97).
"""

from __future__ import annotations

import wave
from typing import Tuple

import numpy as np


def load_wav(path: str) -> Tuple[np.ndarray, int]:
    """Read a PCM wav file -> (float32 samples in [-1, 1], sample_rate).

    Mirrors the int->float scaling of the reference's AudioSegment
    (reference: datasets/parts/segment.py:29-60).
    """
    with wave.open(path, "rb") as w:
        sr = w.getframerate()
        n = w.getnframes()
        width = w.getsampwidth()
        channels = w.getnchannels()
        raw = w.readframes(n)
    if width == 2:
        x = np.frombuffer(raw, dtype=np.int16).astype(np.float32) / 32768.0
    elif width == 4:
        x = np.frombuffer(raw, dtype=np.int32).astype(np.float32) / 2147483648.0
    elif width == 1:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported sample width {width} in {path}")
    if channels > 1:
        x = x.reshape(-1, channels).mean(axis=1)
    return x, sr


def load_audio(path: str, target_sr: int = 16000) -> np.ndarray:
    """Load audio, resampling if needed (polyphase via scipy)."""
    if path.endswith(".flac"):
        raise NotImplementedError(
            "FLAC decode is not available in this environment; convert "
            "LibriSpeech to .wav offline (e.g. with flac/sox) first."
        )
    x, sr = load_wav(path)
    if sr != target_sr:
        from math import gcd

        from scipy.signal import resample_poly

        g = gcd(sr, target_sr)
        x = resample_poly(x, target_sr // g, sr // g).astype(np.float32)
    return x
