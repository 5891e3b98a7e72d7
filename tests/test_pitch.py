"""Pitch estimator tests on synthetic signals (pyworld is unavailable
in this image; correctness = known-F0 synthetic audio)."""

import numpy as np
import pytest

from asr_model_tpu.ops.pitch import dio, pitch_track, stonemask


def _tone(f0, dur=0.5, sr=16000, harmonics=3):
    t = np.arange(int(sr * dur)) / sr
    x = sum((0.6 ** k) * np.sin(2 * np.pi * f0 * (k + 1) * t)
            for k in range(harmonics))
    return (x / np.abs(x).max()).astype(np.float32)


@pytest.mark.parametrize("f0", [110.0, 220.0, 440.0])
def test_dio_recovers_tone_f0(f0):
    x = _tone(f0)
    est, t = dio(x, 16000, 10.0)
    voiced = est[est > 0]
    assert len(voiced) > 0.6 * len(est)
    # median within 3% of the true F0
    med = np.median(voiced)
    assert abs(med - f0) / f0 < 0.03, (med, f0)
    # frame times at 10ms hops
    np.testing.assert_allclose(np.diff(t), 0.01, atol=1e-6)


def test_silence_is_unvoiced():
    x = np.zeros(8000, np.float32)
    f0, _ = dio(x, 16000, 10.0)
    assert (f0 == 0).all()


def test_noise_is_mostly_unvoiced():
    x = np.random.RandomState(0).randn(8000).astype(np.float32)
    f0, _ = dio(x, 16000, 10.0)
    assert (f0 > 0).mean() < 0.35


def test_stonemask_refines_not_degrades():
    x = _tone(200.0)
    f0, t = dio(x, 16000, 10.0)
    ref = stonemask(x, f0, t, 16000)
    v = f0 > 0
    err0 = np.abs(f0[v] - 200).mean()
    err1 = np.abs(ref[v] - 200).mean()
    assert err1 <= err0 + 1e-6


def test_pitch_track_shape_matches_mel_frames():
    sr, hop = 16000, 160
    x = _tone(150.0, dur=1.0)
    p = pitch_track(x, sr, hop)
    assert p.shape == (1, 1 + len(x) // hop)
