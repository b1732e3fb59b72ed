"""Converter coverage: manifest+wav -> SampleStore, calibration-list
filtering, and speed-perturbation augmentation (reference:
datasets/convert_librispeech.py + process_librispeech.py:51-68)."""

import json
import os
import wave

import numpy as np

from rnnt_inference_tpu.data.audio import speed_perturb
from rnnt_inference_tpu.data.dataset import convert_librispeech

SR = 16000


def _write_wav(path, x):
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(SR)
        w.writeframes(
            np.clip(np.round(x * 32768.0), -32768, 32767).astype("<i2").tobytes()
        )


def _make_corpus(tmp_path, n=3):
    rng = np.random.RandomState(0)
    entries = []
    for i in range(n):
        dur = 1.0 + 0.5 * i
        x = (rng.randn(int(SR * dur)) * 0.1).astype(np.float32)
        name = f"utt{i}.wav"
        _write_wav(tmp_path / name, x)
        entries.append(
            dict(
                audio_filepath=name,
                duration=dur,
                transcript=f"hello world {i}",
            )
        )
    manifest = tmp_path / "manifest.json"
    manifest.write_text(json.dumps(entries))
    return manifest


def test_convert_basic_roundtrip(tmp_path):
    manifest = _make_corpus(tmp_path)
    out = tmp_path / "store.npz"
    store = convert_librispeech(str(tmp_path), str(manifest), str(out))
    assert len(store) == 3
    assert store.kind == "waveform"
    assert store.names == ["utt0.wav", "utt1.wav", "utt2.wav"]
    assert out.exists()
    # 1.0 s utterance at 16 kHz
    assert len(store.samples[0]) == SR


def test_convert_flac_corpus_matches_wav(tmp_path):
    """LibriSpeech-style FLAC input (decoded by the pure-Python codec) must
    produce the same store as the wav copy of the corpus, incl. workers>1."""
    from rnnt_inference_tpu.data.flac import encode_flac

    rng = np.random.RandomState(1)
    entries = []
    for i in range(3):
        dur = 0.5 + 0.25 * i
        x = (rng.randn(int(SR * dur)) * 0.1).astype(np.float32)
        pcm = np.clip(np.round(x * 32768.0), -32768, 32767).astype(np.int32)
        _write_wav(tmp_path / f"utt{i}.wav", x)
        (tmp_path / f"utt{i}.flac").write_bytes(encode_flac(pcm, SR))
        entries.append(dict(audio_filepath=f"utt{i}.flac", duration=dur,
                            transcript=f"t {i}"))
    man_flac = tmp_path / "man_flac.json"
    man_flac.write_text(json.dumps(entries))
    man_wav = tmp_path / "man_wav.json"
    man_wav.write_text(json.dumps(
        [dict(e, audio_filepath=e["audio_filepath"].replace(".flac", ".wav"))
         for e in entries]
    ))

    s_flac = convert_librispeech(str(tmp_path), str(man_flac), "")
    s_wav = convert_librispeech(str(tmp_path), str(man_wav), "")
    assert len(s_flac) == len(s_wav) == 3
    for a, b in zip(s_flac.samples, s_wav.samples):
        np.testing.assert_array_equal(a, b)

    s_par = convert_librispeech(str(tmp_path), str(man_flac), "", workers=2)
    for a, b in zip(s_par.samples, s_flac.samples):
        np.testing.assert_array_equal(a, b)


def test_convert_calib_list_filters(tmp_path):
    manifest = _make_corpus(tmp_path)
    calib = tmp_path / "calib.txt"
    calib.write_text("some/rel/path/utt1.wav\n")
    store = convert_librispeech(
        str(tmp_path), str(manifest), "", file_list=str(calib)
    )
    assert store.names == ["utt1.wav"]


def test_convert_speed_perturbation(tmp_path):
    manifest = _make_corpus(tmp_path, n=2)
    store = convert_librispeech(
        str(tmp_path), str(manifest), "", speeds=[0.9, 1.1]
    )
    # 3 copies per utterance, reference naming: {stem}-{s}.wav for s != 1
    assert store.names == [
        "utt0-0.9.wav", "utt0.wav", "utt0-1.1.wav",
        "utt1-0.9.wav", "utt1.wav", "utt1-1.1.wav",
    ]
    n0 = len(store.samples[1])  # the unperturbed copy
    slow = len(store.samples[0])  # 0.9x speed -> ~1/0.9 the samples
    fast = len(store.samples[2])  # 1.1x speed -> ~1/1.1 the samples
    assert abs(slow - n0 / 0.9) / n0 < 0.01
    assert abs(fast - n0 / 1.1) / n0 < 0.01
    # transcripts are shared across perturbed copies
    assert store.transcripts[0] == store.transcripts[1] == store.transcripts[2]


def test_convert_calib_list_selects_perturbed_copy(tmp_path):
    manifest = _make_corpus(tmp_path, n=2)
    calib = tmp_path / "calib.txt"
    calib.write_text("utt0-0.9.wav\nutt1.wav\n")
    store = convert_librispeech(
        str(tmp_path), str(manifest), "", file_list=str(calib),
        speeds=[0.9, 1.1],
    )
    assert store.names == ["utt0-0.9.wav", "utt1.wav"]


def test_speed_perturb_identity_and_tone():
    t = np.arange(SR, dtype=np.float64) / SR
    x = (0.1 * np.sin(2 * np.pi * 1000.0 * t)).astype(np.float32)
    assert speed_perturb(x, 1.0) is x
    y = speed_perturb(x, 1.1)
    # a 1 kHz tone is far below the anti-alias cutoff: RMS preserved, and
    # the tone's frequency in the sped-up signal becomes 1.1 kHz
    rms = lambda v: float(np.sqrt(np.mean(v.astype(np.float64) ** 2)))
    assert abs(rms(y) - rms(x)) / rms(x) < 0.02
    spec = np.abs(np.fft.rfft(y[SR // 10 : -SR // 10]))
    peak_hz = np.argmax(spec) * SR / len(y[SR // 10 : -SR // 10])
    assert abs(peak_hz - 1100.0) < 10.0
