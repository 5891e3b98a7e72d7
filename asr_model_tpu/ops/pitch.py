"""F0 (pitch) estimation, on-device.

Parity role: the reference extracts a 10 ms F0 track with pyworld's
DIO + StoneMask (essentials.py:451-455) and pools it per token
(essentials.py:378-414).  Two implementations:

* **Host path** (the reference-parity path, used by the feature
  frontend): ``dio``/``stonemask`` route to the native C++
  implementation of the actual DIO and StoneMask algorithms
  (native/world.cpp — band-filtered four-interval candidates with
  stability scoring and contour fixing; instantaneous-frequency
  harmonic refinement), same API as pyworld.  Validated with
  algorithm-level tests (tests/test_pitch.py): known-F0 tones MAE
  < 1 Hz, chirp tracking MAE < 2 Hz, octave-error resistance on
  harmonic-rich signals with weak fundamentals, silence unvoiced.
* **On-device path**: ``yin_f0``, a jit-compilable YIN estimator
  (de Cheveigné & Kawahara 2002) — the lag-difference matrix is one
  batched matmul + elementwise ops, used where pitch must be computed
  inside the jitted pipeline (transcribe/long-form).

Unvoiced frames are 0.0, voiced frames are in [f0_floor, f0_ceil],
matching WORLD's conventions (f0_floor=71 Hz, f0_ceil=800 Hz).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

F0_FLOOR = 71.0
F0_CEIL = 800.0


def _frame(x: jnp.ndarray, frame_len: int, hop: int) -> jnp.ndarray:
    n = x.shape[-1]
    n_frames = max(1 + (n - frame_len) // hop, 1)
    idx = jnp.arange(n_frames)[:, None] * hop + jnp.arange(frame_len)[None, :]
    return jnp.take(x, idx, axis=-1)


def _yin_difference(frames: jnp.ndarray, max_lag: int) -> jnp.ndarray:
    """d[t, tau] = sum_{j<W} (x_j - x_{j+tau})^2 for tau in [0, max_lag),
    W = frame_len - max_lag, as e0 + e_tau - 2*acf.

    TPU formulation: the lag cross-correlation acf[t, tau] =
    sum_j x_j x_{j+tau} runs as one batched FFT correlation (O(N log N),
    HBM-light) instead of materializing the (T, max_lag, W) shifted-
    window tensor (~200 MB per 10 s utterance) a gather formulation
    needs; the sliding energy e_tau is a cumulative-sum difference.
    With the FFT size >= frame_len, circular correlation equals linear
    correlation for all tau < max_lag (no wraparound: j + tau <
    W + max_lag = frame_len)."""
    W = frames.shape[-1] - max_lag
    base = frames[..., :W]
    n_fft = 1
    while n_fft < frames.shape[-1]:
        n_fft *= 2
    fr = jnp.fft.rfft(frames, n=n_fft, axis=-1)
    ba = jnp.fft.rfft(base, n=n_fft, axis=-1)
    acf = jnp.fft.irfft(jnp.conj(ba) * fr, n=n_fft,
                        axis=-1)[..., :max_lag]              # (T, max_lag)
    sq = jnp.cumsum(frames * frames, axis=-1)
    zero = jnp.zeros_like(sq[..., :1])
    sq = jnp.concatenate([zero, sq], axis=-1)                # prefix sums
    tau = jnp.arange(max_lag)
    e_tau = sq[..., tau + W] - sq[..., tau]                  # (T, max_lag)
    e0 = e_tau[..., :1]
    return e0 + e_tau - 2 * acf


def _cmnd(d: jnp.ndarray) -> jnp.ndarray:
    """Cumulative mean normalized difference (YIN eq. 8)."""
    tau = jnp.arange(1, d.shape[-1])
    csum = jnp.cumsum(d[..., 1:], axis=-1)
    cmnd = d[..., 1:] * tau / jnp.maximum(csum, 1e-12)
    return jnp.concatenate([jnp.ones_like(d[..., :1]), cmnd], axis=-1)


@functools.partial(jax.jit, static_argnames=("fs", "frame_period",
                                             "f0_floor", "f0_ceil",
                                             "threshold"))
def yin_f0(x: jnp.ndarray, fs: int = 16000, frame_period: float = 10.0,
           f0_floor: float = F0_FLOOR, f0_ceil: float = F0_CEIL,
           threshold: float = 0.15):
    """Returns (f0, t): per-frame F0 in Hz (0 = unvoiced) and frame
    times in seconds, hop = frame_period ms."""
    x = x.astype(jnp.float32)
    hop = int(fs * frame_period / 1000.0)
    max_lag = int(fs / f0_floor) + 2
    min_lag = max(int(fs / f0_ceil) - 1, 2)
    frame_len = 2 * max_lag

    n = x.shape[-1]
    pad = frame_len
    xp = jnp.pad(x, (0, pad))
    # number of output frames matches WORLD: 1 + floor(n / hop)
    n_frames = 1 + n // hop
    idx = jnp.arange(n_frames)[:, None] * hop + jnp.arange(frame_len)[None, :]
    frames = jnp.take(xp, jnp.minimum(idx, xp.shape[-1] - 1), axis=-1)
    frames = frames - jnp.mean(frames, axis=-1, keepdims=True)

    d = _yin_difference(frames, max_lag)
    c = _cmnd(d)

    lag_valid = (jnp.arange(max_lag) >= min_lag)
    c_masked = jnp.where(lag_valid[None, :], c, jnp.inf)

    # YIN step 4: first lag under threshold, then descend to the local
    # minimum that follows it; fall back to the global minimum
    under = c_masked < threshold
    first_under = jnp.argmax(under, axis=-1)
    any_under = jnp.any(under, axis=-1)
    global_min = jnp.argmin(c_masked, axis=-1)
    c_prev = jnp.concatenate([c_masked[..., :1], c_masked[..., :-1]], -1)
    c_next = jnp.concatenate([c_masked[..., 1:],
                              jnp.full_like(c_masked[..., :1], jnp.inf)], -1)
    is_lmin = (c_masked <= c_prev) & (c_masked <= c_next) \
        & lag_valid[None, :]
    after = jnp.arange(max_lag)[None, :] >= first_under[:, None]
    cand = is_lmin & after
    first_lmin = jnp.argmax(cand, axis=-1)
    has_lmin = jnp.any(cand, axis=-1)
    tau = jnp.where(any_under & has_lmin, first_lmin, global_min)

    # parabolic interpolation around tau
    tm1 = jnp.clip(tau - 1, 0, max_lag - 1)
    tp1 = jnp.clip(tau + 1, 0, max_lag - 1)
    rows = jnp.arange(c.shape[0])
    y0, y1, y2 = c[rows, tm1], c[rows, tau], c[rows, tp1]
    denom = y0 - 2 * y1 + y2
    offset = jnp.where(jnp.abs(denom) > 1e-12,
                       0.5 * (y0 - y2) / denom, 0.0)
    offset = jnp.clip(offset, -1.0, 1.0)
    tau_f = tau.astype(jnp.float32) + offset

    f0 = fs / jnp.maximum(tau_f, 1.0)
    cmin = c[rows, tau]
    # voicing: periodicity strong enough and enough signal energy
    energy = jnp.mean(frames * frames, axis=-1)
    voiced = (cmin < 0.45) & (energy > 1e-7) \
        & (f0 >= f0_floor) & (f0 <= f0_ceil)
    f0 = jnp.where(voiced, f0, 0.0)
    t = jnp.arange(n_frames, dtype=jnp.float32) * (frame_period / 1000.0)
    return f0, t


def _world_lib():
    try:
        from asr_model_tpu import native
        return native if native.load("world") is not None else None
    except Exception:                                # pragma: no cover
        return None


def dio(x, fs: int = 16000, frame_period: float = 10.0,
        f0_floor: float = F0_FLOOR, f0_ceil: float = F0_CEIL):
    """pyworld.dio-compatible API (essentials.py:453).

    Host path: the native C++ DIO (band-filtered four-interval
    candidates + stability scoring + contour fixing — the published
    algorithm, native/world.cpp).  Falls back to the on-device YIN
    estimator when the native toolchain is unavailable."""
    nat = _world_lib()
    if nat is not None:
        return nat.world_dio(np.asarray(x), fs, frame_period=frame_period,
                             f0_floor=f0_floor, f0_ceil=f0_ceil)
    f0, t = yin_f0(jnp.asarray(x), fs=fs, frame_period=frame_period,
                   f0_floor=f0_floor, f0_ceil=f0_ceil)
    return np.asarray(f0, dtype=np.float64), np.asarray(t, dtype=np.float64)


def stonemask(x, f0, t, fs: int = 16000):
    """pyworld.stonemask-compatible refinement (essentials.py:454).

    Host path: the native C++ StoneMask (instantaneous-frequency
    harmonic refinement, native/world.cpp).  YIN fallback: re-search
    the normalized difference minimum within +-12% of each voiced
    frame's estimate."""
    nat = _world_lib()
    if nat is not None:
        return nat.world_stonemask(np.asarray(x), np.asarray(f0),
                                   np.asarray(t), fs)
    f0 = jnp.asarray(f0, jnp.float32)
    fp = round(float((t[1] - t[0]) * 1000.0), 6) if len(t) > 1 else 10.0
    refined, _ = yin_f0(jnp.asarray(x), fs=fs, frame_period=fp)
    n = min(f0.shape[-1], refined.shape[-1])
    f0n, rn = f0[:n], refined[:n]
    close = jnp.abs(rn - f0n) <= 0.12 * jnp.maximum(f0n, 1.0)
    out = jnp.where((f0n > 0) & (rn > 0) & close, rn, f0n)
    return np.asarray(out, dtype=np.float64)


def pitch_track(audio, sample_rate: int = 16000, hop_length: int = 160,
                estimator: str = "dio"):
    """The reference's live pitch feature (essentials.py:451-455):
    DIO + StoneMask at frame_period = hop/sr*1000 ms; returns (1, T).

    ``estimator`` selects the F0 algorithm — ``"dio"`` (native C++
    DIO+StoneMask, the reference's pyworld pair) or ``"yin"`` (the
    jittable on-device estimator).  Both train-time features
    (data/features.py) and the serving frontends (transcribe.py,
    models/longform.py) consume ``DataConfig.pitch_estimator``, so a
    model is served the same pitch features it trained on."""
    frame_period = hop_length / sample_rate * 1000.0
    if estimator == "yin":
        import jax.numpy as jnp
        f0, _t = yin_f0(jnp.asarray(audio, jnp.float32), fs=sample_rate,
                        frame_period=frame_period)
        return np.asarray(f0, dtype=np.float32)[None, :]
    # "dio_host" is an explicit alias for the native host path (the
    # serving surfaces use "dio" for the jittable ops/dio.py estimator)
    if estimator not in ("dio", "dio_host"):
        raise ValueError(f"unknown pitch estimator {estimator!r}")
    f0, t = dio(audio, sample_rate, frame_period)
    f0 = stonemask(audio, f0, t, sample_rate)
    return np.asarray(f0, dtype=np.float32)[None, :]
