"""Sample store: the RAM-resident utterance set served by the QSL.

Replaces the reference's torch-serialized dataset dicts
(dev-clean-npy.pt / dev-clean-input.pt, reference:
datasets/convert_librispeech.py:150-163) with an .npz container holding
either raw waveforms or precomputed features, plus transcripts.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import List

import numpy as np

from rnnt_inference_tpu.config import FeaturizerConfig


@dataclass
class SampleStore:
    """In-memory utterance set.

    kind == "waveform": samples[i] is float32 (S_i,) audio at 16 kHz.
    kind == "features": samples[i] is float32 (T_i, 240) log-mel features.
    """

    kind: str
    samples: List[np.ndarray]
    transcripts: List[str] = field(default_factory=list)
    # utterance file names (e.g. "103-1240-0010.wav"); used by calibration
    # file lists (reference: configs/calibration_files.txt)
    names: List[str] = field(default_factory=list)

    def __len__(self):
        return len(self.samples)

    @property
    def lengths(self) -> np.ndarray:
        return np.array([s.shape[0] for s in self.samples], dtype=np.int32)

    def feature_lengths(self, cfg: FeaturizerConfig = FeaturizerConfig()) -> np.ndarray:
        """Post-frontend frame count per sample (used for length sorting)."""
        if self.kind == "features":
            return self.lengths
        return np.array([cfg.out_frames(int(s.shape[0])) for s in self.samples], np.int32)

    @property
    def audio_seconds(self) -> float:
        if self.kind == "waveform":
            return float(sum(s.shape[0] for s in self.samples)) / 16000.0
        # features: frames * splicing * hop / sr = frames * 0.03 s
        return float(sum(s.shape[0] for s in self.samples)) * 0.03

    # -- persistence ---------------------------------------------------------

    def save(self, path: str) -> None:
        arrays = {f"s{i}": s for i, s in enumerate(self.samples)}
        np.savez_compressed(
            path,
            __meta__=np.frombuffer(
                json.dumps(
                    {
                        "kind": self.kind,
                        "n": len(self.samples),
                        "transcripts": self.transcripts,
                        "names": self.names,
                    }
                ).encode(),
                dtype=np.uint8,
            ),
            **arrays,
        )

    @classmethod
    def load(cls, path: str) -> "SampleStore":
        z = np.load(path)
        meta = json.loads(bytes(z["__meta__"]).decode())
        samples = [z[f"s{i}"] for i in range(meta["n"])]
        return cls(
            kind=meta["kind"],
            samples=samples,
            transcripts=meta["transcripts"],
            names=meta.get("names", []),
        )

    def select(self, indices) -> "SampleStore":
        """Subset view (copying lists, sharing arrays)."""
        return SampleStore(
            kind=self.kind,
            samples=[self.samples[i] for i in indices],
            transcripts=[self.transcripts[i] for i in indices]
            if self.transcripts
            else [],
            names=[self.names[i] for i in indices] if self.names else [],
        )

    def filter_by_list(self, list_path: str) -> "SampleStore":
        """Keep only utterances whose file name appears in a calibration
        file list (reference: configs/calibration_files.txt — one relative
        wav path per line; matching is by basename)."""
        import os

        with open(list_path) as f:
            wanted = {os.path.basename(line.strip()) for line in f if line.strip()}
        if not self.names:
            raise ValueError(
                "store has no utterance names; rebuild it with a converter "
                "that records them (scripts/convert_librispeech.py)"
            )
        keep = [i for i, n in enumerate(self.names) if os.path.basename(n) in wanted]
        return self.select(keep)

    # -- constructors --------------------------------------------------------

    @classmethod
    def from_manifest(cls, manifest, target_sr: int = 16000) -> "SampleStore":
        """Load waveforms for every manifest entry (LibriSpeech-as-wav)."""
        import os

        from rnnt_inference_tpu.data.audio import load_audio

        samples = [load_audio(e["audio_filepath"], target_sr) for e in manifest]
        return cls(
            kind="waveform",
            samples=samples,
            transcripts=[e["transcript"] for e in manifest],
            names=[os.path.basename(e["audio_filepath"]) for e in manifest],
        )

    @classmethod
    def synthetic(
        cls,
        n: int = 256,
        seed: int = 0,
        min_seconds: float = 1.0,
        max_seconds: float = 15.0,
        mean_seconds: float = 7.8,
        sample_rate: int = 16000,
    ) -> "SampleStore":
        """Random utterances with a dev-clean-like duration distribution
        (dev-clean: 2513 utts, ~7.8 s mean, <=15 s cap) for benchmarks and
        tests when real audio is unavailable."""
        rng = np.random.RandomState(seed)
        # gamma-ish distribution clipped to [min, max]
        durs = np.clip(rng.gamma(4.0, mean_seconds / 4.0, size=n), min_seconds, max_seconds)
        samples = [
            speechlike_noise(rng, int(d * sample_rate)) for d in durs
        ]
        # names let synthetic stores exercise name-keyed flows end-to-end
        # (--calib_list filtering, manifest joins) in corpus-less CI drives
        return cls(
            kind="waveform", samples=samples, transcripts=[""] * n,
            names=[f"synthetic-{i:05d}.wav" for i in range(n)],
        )


def speechlike_noise(
    rng: np.random.RandomState, n_samples: int, rms: float = 0.1,
    segment_ms: float = 100.0, sample_rate: int = 16000,
) -> np.ndarray:
    """Amplitude-modulated Gaussian noise for synthetic benchmarks.

    iid noise gives the encoder almost no frame-to-frame variance (every
    log-mel frame has the same flat spectrum), which makes downstream
    emission statistics degenerate — every decode frame behaves alike and
    no global blank bias can reproduce real speech's ~0.8 symbols/frame
    (bench.py bias_joint_toward_blank).  Real speech has ~syllable-rate
    energy modulation; a log-normal envelope piece-wise linear over ~100 ms
    segments restores per-frame variance end-to-end while keeping the
    workload synthetic and seedable.  Overall RMS is normalized to `rms`.
    """
    x = rng.randn(n_samples)
    seg = max(int(segment_ms * sample_rate / 1000.0), 1)
    n_seg = n_samples // seg + 2
    knots = np.exp(rng.randn(n_seg))  # log-normal envelope knots
    env = np.interp(
        np.arange(n_samples) / seg, np.arange(n_seg), knots
    )
    x = x * env
    x *= rms / max(float(np.sqrt(np.mean(x**2))), 1e-12)
    return x.astype(np.float32)


def _load_and_perturb(job):
    """(path, [factors]) -> [waveforms]; one decode feeds every speed factor
    (FLAC decode is the expensive part).  Module-level for Pool pickling."""
    from rnnt_inference_tpu.data.audio import load_audio, speed_perturb

    path, factors = job
    wav = load_audio(path)
    return [speed_perturb(wav, s) for s in factors]


def convert_librispeech(
    data_dir: str,
    manifest_path: str,
    output_path: str,
    max_duration: float = 15.0,
    file_list: str = None,
    speeds=None,
    workers: int = 0,
) -> SampleStore:
    """Offline one-shot conversion: manifest + wav files -> SampleStore npz
    (the reference's convert_librispeech.py equivalent, minus sox).

    file_list restricts conversion to the listed utterances (the reference's
    --output_list / calibration_files.txt mechanism).

    speeds adds speed-perturbed copies of each utterance (the reference's
    `--speed` calibration augmentation, process_librispeech.py:51-68):
    factor s produces a copy named `{stem}-{s}.wav` with ~1/s the duration;
    factor 1.0 (the original) is always included.  When both file_list and
    speeds are given, matching is against the perturbed output names, so a
    calibration list naming `...-0.9.wav` selects that copy only."""
    import os

    from rnnt_inference_tpu.data.manifest import Manifest

    manifest = Manifest([manifest_path], data_dir=data_dir, max_duration=max_duration)
    entries = list(manifest)
    factors = sorted({float(s) for s in (speeds or [])} | {1.0})
    wanted = None
    if file_list:
        with open(file_list) as f:
            wanted = {os.path.basename(line.strip()) for line in f if line.strip()}

    # one decode job per FILE (feeding every selected speed factor — FLAC
    # decode at ~1 s per audio-minute is the expensive part); fan the
    # one-shot conversion over worker processes when asked
    jobs = []  # (path, [factors], [transcripts], [out_names])
    for e in entries:
        base = os.path.basename(e["audio_filepath"])
        stem, ext = os.path.splitext(base)
        fs, ts, ns = [], [], []
        for s in factors:
            out_name = base if s == 1.0 else f"{stem}-{s}{ext}"
            if wanted is not None and out_name not in wanted:
                continue
            fs.append(s)
            ts.append(e["transcript"])
            ns.append(out_name)
        if fs:
            jobs.append((e["audio_filepath"], fs, ts, ns))

    if workers and workers > 1 and len(jobs) > 1:
        from multiprocessing import get_context

        with get_context("spawn").Pool(workers) as pool:
            decoded = pool.map(_load_and_perturb, [(j[0], j[1]) for j in jobs])
    else:
        decoded = [_load_and_perturb((j[0], j[1])) for j in jobs]
    samples = [w for ws in decoded for w in ws]
    transcripts = [t for j in jobs for t in j[2]]
    names = [n for j in jobs for n in j[3]]
    store = SampleStore(
        kind="waveform", samples=samples, transcripts=transcripts, names=names
    )
    if output_path:
        store.save(output_path)
    return store


def compute_features_store(
    store: SampleStore,
    cfg: FeaturizerConfig = FeaturizerConfig(),
    batch_size: int = 32,
) -> SampleStore:
    """Precompute log-mel features for a waveform store -> features store
    (the reference's `{name}-input.pt` artifact,
    datasets/convert_librispeech.py:150-163: per-utterance {T, C} tensors).

    Batches through the wav bucket ladder so only a handful of featurizer
    shapes compile; per-utterance outputs are trimmed to their true frame
    counts, so the result is identical to per-utterance featurization under
    the default zero-pad framing.
    """
    import jax.numpy as jnp

    from rnnt_inference_tpu.ops.features import log_mel_features
    from rnnt_inference_tpu.runtime.qsl import QuerySampleLibrary

    assert store.kind == "waveform"
    import jax

    qsl = QuerySampleLibrary(store, cfg)
    feat_fn = jax.jit(lambda a, b: log_mel_features(a, b, cfg))
    order = qsl.sort_desc(np.arange(len(store)))
    feats_by_idx: dict = {}
    for s in range(0, len(order), batch_size):
        batch_idx = order[s : s + batch_size]
        wav, lens, _ = qsl.assemble_waveforms(batch_idx, pad_n=batch_size)
        feats, out_lens = feat_fn(jnp.asarray(wav), jnp.asarray(lens))
        feats = np.asarray(feats)  # {T, N, C}
        out_lens = np.asarray(out_lens)
        for r, i in enumerate(batch_idx):
            feats_by_idx[int(i)] = feats[: out_lens[r], r, :].copy()
    return SampleStore(
        kind="features",
        samples=[feats_by_idx[i] for i in range(len(store))],
        transcripts=list(store.transcripts),
        names=list(store.names),
    )
