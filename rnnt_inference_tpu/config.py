"""Model / featurizer / runtime hyper-parameters.

TPU-native re-design of the reference configuration surface:
  - model dims mirror the MLPerf RNN-T checkpoint (reference: models/config.py:1-19)
  - featurizer params mirror configs/rnnt.toml [input_eval] (reference: configs/rnnt.toml)

Everything is a frozen dataclass so configs can be closed over by jitted
functions as static values.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional


@dataclasses.dataclass(frozen=True)
class RNNTParams:
    """Transducer model dimensions (reference: models/config.py:1-19)."""

    # Transcription (encoder)
    trans_input_size: int = 240  # 80 mels x 3 frame splicing
    trans_hidden_size: int = 1024
    pre_num_layers: int = 2
    post_num_layers: int = 3
    stack_time_factor: int = 2
    # Prediction
    pred_hidden_size: int = 320
    pred_num_layers: int = 2
    # Joint
    joint_hidden_size: int = 512
    num_labels: int = 29
    # Alphabet: [SOS, SPACE, a~z, ', BLANK] -> [-1, 0, 1..26, 27, 28]
    SOS: int = -1
    BLANK: int = 28
    max_symbols_per_step: int = 30
    sample_rate: int = 16000
    # Static capacity of the per-utterance token result buffer.  The
    # reference allocates max_symbols_per_step * T dynamically
    # (models/decoder.py:32-37); XLA needs a static shape, and real
    # transcripts for <=15 s utterances are < 500 chars, so 1024 is
    # conservative.  Writes beyond capacity are dropped.
    max_res_len: int = 1024

    @property
    def joint_input_trans(self) -> int:
        return self.trans_hidden_size

    @property
    def joint_input_pred(self) -> int:
        return self.pred_hidden_size


@dataclasses.dataclass(frozen=True)
class FeaturizerConfig:
    """Log-mel frontend parameters (reference: configs/rnnt.toml [input_eval],
    datasets/parts/features.py:94-177)."""

    sample_rate: int = 16000
    window_size: float = 0.02  # seconds -> 320 samples
    window_stride: float = 0.01  # seconds -> 160 samples
    window: str = "hann"
    normalize: str = "per_feature"
    n_fft: int = 512
    preemph: float = 0.97
    n_mels: int = 80
    lowfreq: float = 0.0
    highfreq: Optional[float] = None  # defaults to sample_rate / 2
    log: bool = True
    dither: float = 1e-5
    frame_splicing: int = 3
    max_duration: float = 16.7
    # STFT boundary padding of n_fft//2 on both sides:
    #   "zeros"   — the reference SUT's behavior: its custom preemphasis op
    #               zero-pads pad_size=n_fft//2 and torch.stft runs with
    #               center=False (reference: datasets/parts/features.py:196-210)
    #   "reflect" — torch.stft(center=True) semantics of the upstream
    #               training featurizer; kept as an option
    # Only boundary frames differ; "zeros" is the default because the WER
    # contract is scored against the reference SUT.
    pad_mode: str = "zeros"

    @property
    def win_length(self) -> int:
        return int(self.sample_rate * self.window_size)

    @property
    def hop_length(self) -> int:
        return int(self.sample_rate * self.window_stride)

    @property
    def fmax(self) -> float:
        return self.highfreq if self.highfreq is not None else self.sample_rate / 2

    @property
    def out_feat(self) -> int:
        return self.n_mels * self.frame_splicing

    @property
    def max_length(self) -> int:
        """Max output frame count, padded to a multiple of 16
        (reference: datasets/parts/features.py:162-167)."""
        max_length = 1 + math.ceil(
            (self.max_duration * self.sample_rate - self.win_length) / self.hop_length
        )
        max_pad = 16 - (max_length % 16)
        return max_length + max_pad

    def num_frames(self, num_samples: int) -> int:
        """Frames produced by the STFT stage for a waveform of this length
        (reference: datasets/parts/features.py:179-183 pre-splicing)."""
        return num_samples // self.hop_length + 1

    def out_frames(self, num_samples: int) -> int:
        """Frames after x frame_splicing downsampling."""
        return -(-self.num_frames(num_samples) // self.frame_splicing)


def load_featurizer_config(toml_path: str, section: str = "input_eval") -> FeaturizerConfig:
    """Build a FeaturizerConfig from an rnnt.toml-style file
    (reference: configs/rnnt.toml, models/pytorch_sut.py:25-35)."""
    import tomllib

    with open(toml_path, "rb") as f:
        cfg = tomllib.load(f)
    sec = cfg[section]
    return FeaturizerConfig(
        sample_rate=sec["sample_rate"],
        window_size=sec["window_size"],
        window_stride=sec["window_stride"],
        window=sec["window"],
        normalize=sec["normalize"],
        n_fft=sec["n_fft"],
        n_mels=sec["features"],
        dither=sec["dither"],
        frame_splicing=sec.get("frame_splicing", 1),
        max_duration=sec.get("max_duration", 16.7),
    )
