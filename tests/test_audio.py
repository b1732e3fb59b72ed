"""Segment-op coverage: the functional analogs of the reference's
AudioSegment (datasets/parts/segment.py: trim, pad, subsegment, gain)."""

import numpy as np
import pytest

from rnnt_inference_tpu.data.audio import (
    gain_db,
    pad,
    rms_db,
    subsegment,
    trim_silence,
)


def test_trim_silence_strips_leading_and_trailing():
    sr = 16000
    rng = np.random.RandomState(0)
    quiet = rng.randn(sr).astype(np.float32) * 1e-5
    loud = rng.randn(sr).astype(np.float32) * 0.5
    x = np.concatenate([quiet, loud, quiet])
    y = trim_silence(x, top_db=60.0)
    assert len(y) < len(x)
    # the loud second must survive intact: its energy is preserved
    assert np.sum(y.astype(np.float64) ** 2) >= 0.99 * np.sum(
        loud.astype(np.float64) ** 2
    )
    # trimmed length is within edge-frame slack of the loud region (a frame
    # overlapping the boundary at either end keeps up to frame_length extra)
    assert abs(len(y) - len(loud)) <= 2 * 2048


def test_trim_silence_keeps_all_loud_signal():
    rng = np.random.RandomState(1)
    x = rng.randn(8000).astype(np.float32) * 0.3
    y = trim_silence(x, top_db=60.0)
    # uniform loudness: nothing (or at most edge partial frames) removed
    assert len(y) >= len(x) - 512


def test_trim_silence_empty_and_all_silent():
    assert trim_silence(np.zeros(0, np.float32)).size == 0
    # everything equally "silent" relative to max -> whole signal kept
    # (rms_db.max() - top_db < rms_db everywhere when flat)
    x = np.full(4096, 1e-6, np.float32)
    assert trim_silence(x, top_db=60.0).size > 0


def test_pad_end_and_symmetric():
    x = np.ones(10, np.float32)
    y = pad(x, 5)
    assert len(y) == 15 and np.all(y[10:] == 0) and np.all(y[:10] == 1)
    z = pad(x, 5, symmetric=True)
    assert len(z) == 20 and np.all(z[:5] == 0) and np.all(z[15:] == 0)


def test_subsegment_times_and_negative_indexing():
    sr = 100
    x = np.arange(500, dtype=np.float32)  # 5 s at 100 Hz
    y = subsegment(x, sr, 1.0, 3.0)
    np.testing.assert_array_equal(y, x[100:300])
    # negative times count from the end (reference segment.py semantics)
    z = subsegment(x, sr, -2.0, -1.0)
    np.testing.assert_array_equal(z, x[300:400])
    # default bounds = whole segment
    np.testing.assert_array_equal(subsegment(x, sr), x)


def test_subsegment_rejects_out_of_range():
    x = np.zeros(100, np.float32)
    with pytest.raises(ValueError):
        subsegment(x, 100, 0.5, 2.0)
    with pytest.raises(ValueError):
        subsegment(x, 100, 0.8, 0.2)


def test_gain_and_rms_db():
    rng = np.random.RandomState(2)
    x = rng.randn(16000).astype(np.float32) * 0.1
    before = rms_db(x)
    y = gain_db(x, 6.0)
    assert y.dtype == x.dtype
    assert rms_db(y) == pytest.approx(before + 6.0, abs=1e-3)
    np.testing.assert_allclose(gain_db(x, 0.0), x, rtol=1e-6)
