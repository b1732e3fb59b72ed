"""Query Sample Library: RAM-resident samples + static-shape batch assembly.

Reference behaviors reproduced (csrc/rnnt_qsl.cpp, models/rnnt_qsl.py):
  - whole sample set RAM-resident, Load/Unload are no-ops
  - descending length sort before Offline batching (rnnt_qsl.cpp:104-133)
  - batch assembly pads T to a *bucket* length instead of free-form batch max
    (rnnt_qsl.cpp:150-188): XLA compiles one program per static shape, so
    shapes are drawn from a small bucket ladder and compiled once at warmup.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

from rnnt_inference_tpu.config import FeaturizerConfig
from rnnt_inference_tpu.data.dataset import SampleStore

# Waveform bucket ladder (seconds): utterances are <=15 s
# (reference caps: convert_librispeech.py:77, metadata.hpp MAX_WAV_LEN 240000).
DEFAULT_WAV_BUCKETS_S = (2.0, 4.0, 6.0, 8.0, 10.0, 12.0, 15.0)


class QuerySampleLibrary:
    def __init__(
        self,
        store: SampleStore,
        cfg: FeaturizerConfig = FeaturizerConfig(),
        wav_buckets_s: Sequence[float] = DEFAULT_WAV_BUCKETS_S,
    ):
        self.store = store
        self.cfg = cfg
        self.feature_lens = store.feature_lengths(cfg)
        self.sample_rate = cfg.sample_rate
        self.wav_buckets = tuple(
            int(s * cfg.sample_rate) for s in sorted(wav_buckets_s)
        )
        # feature frames produced for each wav bucket length
        self.feat_buckets = tuple(cfg.out_frames(S) for S in self.wav_buckets)

    def __len__(self):
        return len(self.store)

    # -- loadgen-style no-ops ------------------------------------------------

    def load_samples(self, indices):  # whole set stays resident
        pass

    def unload_samples(self, indices):
        pass

    # -- sorting / bucketing -------------------------------------------------

    def sort_desc(self, indices: Sequence[int]) -> np.ndarray:
        """Descending feature-length sort (reference rnnt_qsl.cpp:104-133)."""
        idx = np.asarray(indices)
        order = np.argsort(-self.feature_lens[idx], kind="stable")
        return idx[order]

    def wav_bucket_for(self, max_len: int) -> int:
        """Smallest wav bucket >= max_len (clamps to largest)."""
        for b in self.wav_buckets:
            if b >= max_len:
                return b
        return self.wav_buckets[-1]

    def feat_bucket_for(self, max_len: int) -> int:
        for b in self.feat_buckets:
            if b >= max_len:
                return b
        return self.feat_buckets[-1]

    # -- batch assembly ------------------------------------------------------

    def assemble_waveforms(
        self, indices: Sequence[int], pad_n: Optional[int] = None
    ) -> Tuple[np.ndarray, np.ndarray, int]:
        """Gather+pad waveforms -> ({N, S_bucket} f32, lens {N}, S_bucket).

        Lengths are clamped to the largest bucket (over-long samples are
        truncated — cannot occur with <=15 s prep).
        """
        samples = [self.store.samples[i] for i in indices]
        lens = np.array([min(s.shape[0], self.wav_buckets[-1]) for s in samples], np.int32)
        S = self.wav_bucket_for(int(lens.max()) if len(lens) else 1)
        N = pad_n or len(samples)
        wav = np.zeros((N, S), np.float32)
        for r, s in enumerate(samples):
            wav[r, : lens[r]] = s[: lens[r]]
        out_lens = np.zeros((N,), np.int32)
        out_lens[: len(samples)] = lens
        return wav, out_lens, S

    # -- device-resident staging (MLPerf LoadSamplesToRam analog) ------------

    def load_to_device(
        self, batch_size: int, indices: Optional[Sequence[int]] = None
    ) -> "DeviceQSL":
        """Stage the sample set into device HBM, bucketed and length-sorted.

        The reference QSL preloads every sample into host RAM before the
        timed portion (csrc/rnnt_qsl.hpp:42-46, loadgen LoadSamplesToRam);
        the TPU-native equivalent stages into HBM so the timed Offline loop
        reads batches with on-device slices instead of 100 MB/s-class host
        transfers.  Audio is staged as int16 PCM (half the bytes; it IS the
        natural wire format) and converted to f32 on device.
        """
        return DeviceQSL(self, batch_size, indices)

    def assemble_features(
        self,
        indices: Sequence[int],
        pad_t: Optional[int] = None,
        pad_n: Optional[int] = None,
    ) -> Tuple[np.ndarray, np.ndarray, int]:
        """Gather+pad precomputed features -> ({T_bucket, N, C} f32, lens, T)."""
        assert self.store.kind == "features"
        samples = [self.store.samples[i] for i in indices]
        lens = np.array([s.shape[0] for s in samples], np.int32)
        T = pad_t or self.feat_bucket_for(int(lens.max()) if len(lens) else 1)
        N = pad_n or len(samples)
        C = samples[0].shape[1] if samples else self.cfg.out_feat
        feats = np.zeros((T, N, C), np.float32)
        for r, s in enumerate(samples):
            L = min(s.shape[0], T)
            feats[:L, r, :] = s[:L]
            lens[r] = L
        out_lens = np.zeros((N,), np.int32)
        out_lens[: len(samples)] = lens
        return feats, out_lens, T


def batch_plan(
    qsl: QuerySampleLibrary, batch_size: int, indices=None, min_tile: int = 32
):
    """Deterministic Offline batch plan: length-sort desc, group by wav
    bucket, split each bucket into full batches then cascaded power-of-two
    tail tiles.  Yields (S_bucket, rows) where rows is a list of sample
    indices (the batch is padded up to the tile size with dead rows).

    Shared by DeviceQSL (staging) and bench iteration-statistics (which
    need the grouping without re-staging to HBM).
    """
    if indices is None:
        indices = np.arange(len(qsl))
    order = qsl.sort_desc(indices)
    by_bucket = {}
    for i in order:
        s = qsl.store.samples[int(i)]
        S = qsl.wav_bucket_for(min(s.shape[0], qsl.wav_buckets[-1]))
        by_bucket.setdefault(S, []).append(int(i))

    tile = min(min_tile, batch_size)
    plan = []
    for S, rows in sorted(by_bucket.items(), reverse=True):
        n = -(-len(rows) // tile) * tile
        start = 0
        g = batch_size
        while start < n:
            # clamp the cascade to the tile floor: for batch sizes that are
            # not power-of-two multiples of the tile (e.g. 96 with tile 32)
            # naive halving would land below the tile and mint odd compiled
            # shapes (each a multi-minute uncached compile on this backend)
            while g > tile and g > n - start:
                g = max(tile, g // 2)
            plan.append((S, rows[start : start + g], g))
            start += g
    return plan


class DeviceQSL:
    """Device-HBM-resident, bucketed sample set for the Offline hot loop.

    For each wav bucket S_b: one int16 device array {n_b, S_b} (rows length-
    sorted desc, count padded to a multiple of batch_size) + lens {n_b} +
    the original sample index per row (-1 for padding rows).
    """

    # tails cascade down power-of-two batch shapes to this floor: dead
    # (zero-length) padding rows per bucket drop from <=tail-1 at a fixed
    # tail size to <=MIN_TILE-1, at the cost of a few extra compiled
    # shapes (each is persistent-cached)
    MIN_TILE = 32

    def __init__(self, qsl: QuerySampleLibrary, batch_size: int, indices=None):
        import jax

        self.batch_size = batch_size
        # batches are PRE-SPLIT at staging time: the timed Offline loop then
        # dispatches exactly one program per batch instead of paying two
        # extra device-slice dispatches (each a host->relay RPC) per batch
        self._batches = []  # (wav_dev {g,S} int16, lens_dev {g}, row_index {g})
        for S, rows, g in batch_plan(qsl, batch_size, indices, self.MIN_TILE):
            wav = np.zeros((g, S), np.int16)
            lens = np.zeros((g,), np.int32)
            row_index = np.full((g,), -1, np.int64)
            for r, i in enumerate(rows):
                s = qsl.store.samples[i][:S]
                # round-to-nearest with the same 32768 scale load_wav divides
                # by, so 16-bit source audio round-trips bit-exactly through
                # the int16 staging path (dequant constant is 1/32768)
                wav[r, : s.shape[0]] = np.clip(
                    np.round(s * 32768.0), -32768, 32767
                ).astype(np.int16)
                lens[r] = s.shape[0]
                row_index[r] = i
            self._batches.append(
                (jax.device_put(wav), jax.device_put(lens), row_index)
            )
        # force staging to complete (untimed)
        for _w, l, _ri in self._batches:
            np.asarray(l[:1])

    def batches(self):
        """Yield (wav_i16 {g,S} device, lens {g} device, row_index {g}).

        Full batch_size batches first, then each bucket's remainder cascades
        down power-of-two tiles (B/2, B/4, ..., MIN_TILE): dead padding rows
        are confined to the final <=MIN_TILE tile of each bucket."""
        yield from self._batches
