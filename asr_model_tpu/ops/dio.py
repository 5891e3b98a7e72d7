"""On-device DIO + StoneMask (jittable JAX implementation).

The reference's live pitch feature is pyworld DIO+StoneMask on the
host CPU (essentials.py:451-455).  This framework ships a from-scratch
host C++ implementation (native/world.cpp) for train-parity feature
extraction — but on a 1-core host the serial C++ DIO is the long-form
serving floor (~0.57-2 s of host work per 30 s chunk, docs/
BENCH_NOTES.md).  This module is the same published algorithm
(Morise's DIO band-filtered four-interval candidate search +
StoneMask instantaneous-frequency refinement) expressed as fixed-shape
JAX so the whole frontend rides the TPU; parity vs native/world.cpp is
asserted by tests/test_pitch.py (voiced MAE < 2 Hz).

Algorithm (mirrors native/world.cpp:149-375):

1. FFT the mean-removed signal once; raised-cosine low-cut 25-50 Hz.
2. Per band b (boundary = floor * 2^((b+1)/channels)): low-pass with a
   zero-phase Nuttall FIR (built in numpy at trace time — band count,
   kernel lengths and the FFT size are static), then extract FOUR
   event tracks: negative-/positive-going zero crossings of y and of
   its first difference (peaks/dips at sub-sample positions).
3. Events -> interval tracks (f0 = fs/interval at interval midpoints),
   packed into fixed-size arrays by a cumsum scatter; per frame time
   the four tracks are linearly interpolated (C++ interp1 semantics:
   clamped segment index, linear extrapolation outside).  A band's
   candidate is their mean; its score the relative std; candidates
   outside [floor, ceil] or [boundary/2, boundary] are rejected.
4. Best (min-score) candidate per frame, stability threshold 0.12;
   contour fixing: kill jumps > allowed_range, drop voiced runs
   shorter than voice_range_minimum, and extend section edges with
   the nearest candidate from the band x frame matrix (one forward
   and one backward lax.scan; backward overwrites forward in shared
   gaps, matching the C++ section order).
5. StoneMask: two instantaneous-frequency passes per voiced frame
   over an f0-adaptive Blackman window (fixed max-size buffer, masked
   to the per-frame window length; fixed FFT size — the C++ uses the
   per-frame next_pow2, a bin-grid difference absorbed by the parity
   tolerance); refinements drifting > 18% keep the DIO value.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

F0_FLOOR = 71.0
F0_CEIL = 800.0
BAD_SCORE = 100000.0


def _next_pow2(v: int) -> int:
    n = 1
    while n < v:
        n *= 2
    return n


def _nuttall(t):
    # native/world.cpp nuttall(): 4-term Blackman-Nuttall on [0, 1]
    return (0.355768 - 0.487396 * np.cos(2 * np.pi * t)
            + 0.144232 * np.cos(4 * np.pi * t)
            - 0.012604 * np.cos(6 * np.pi * t))


@functools.lru_cache(maxsize=8)
def _band_kernels(n: int, fs: int, f0_floor: float, f0_ceil: float,
                  channels_in_octave: float):
    """Static per-band LPF kernel spectra: (num_bands, fft_n//2+1)
    complex64, plus the low-cut gain and fft_n.  Pure numpy at trace
    time (everything depends only on static shapes/config)."""
    num_bands = int(np.ceil(channels_in_octave
                            * np.log2(f0_ceil / f0_floor)))
    fft_n = _next_pow2(int(n + 4.0 * fs / f0_floor + 2))
    kspec = np.zeros((num_bands, fft_n // 2 + 1), np.complex128)
    for b in range(num_bands):
        boundary = f0_floor * 2.0 ** ((b + 1) / channels_in_octave)
        half_avg = int(round(fs / boundary / 2.0))
        klen = max(4 * half_avg, 4)
        w = _nuttall(np.arange(klen) / (klen - 1))
        w = w / w.sum()
        ker = np.zeros(fft_n)
        pos = (np.arange(klen) - klen // 2) % fft_n
        np.add.at(ker, pos, w)
        kspec[b] = np.fft.rfft(ker)
    freqs = np.arange(fft_n // 2 + 1) * fs / fft_n
    lowcut = np.where(
        freqs >= 50.0, 1.0,
        np.where(freqs <= 25.0, 0.0,
                 0.5 - 0.5 * np.cos(np.pi * (freqs - 25.0) / 25.0)))
    boundaries = f0_floor * 2.0 ** ((np.arange(num_bands) + 1)
                                    / channels_in_octave)
    # numpy out (converted at the use site): caching jnp arrays that
    # were first materialized inside one jit trace leaks tracers into
    # later traces with the same cache key
    return (kspec.astype(np.complex64), lowcut.astype(np.float32),
            boundaries.astype(np.float32), fft_n)


def _interval_track(y, sign, fs, e_max):
    """One event kind -> interval track: (loc_sec, f0_hz, n_intervals).

    Event positions are kept as (int sample, f32 fraction) pairs:
    a single f32 position has a 0.03-sample ulp at sample ~5e5 (30 s
    audio), which after interval differencing would cost up to ~0.3%
    of f0 — the integer parts difference exactly instead."""
    a = y[:-1] * sign
    b = y[1:] * sign
    mask = (a > 0.0) & (b <= 0.0)
    frac = jnp.where(mask, a / jnp.where(mask, a - b, 1.0), 0.0)
    k = jnp.arange(y.shape[0] - 1, dtype=jnp.int32)

    idx = jnp.cumsum(mask) - 1
    idx = jnp.where(mask, jnp.minimum(idx, e_max - 1), e_max)
    ev_k = jnp.full((e_max + 1,), -1, jnp.int32).at[idx].set(
        k, mode="drop")[:e_max]
    ev_f = jnp.zeros((e_max + 1,), y.dtype).at[idx].set(
        frac, mode="drop")[:e_max]
    cnt = jnp.minimum(jnp.sum(mask), e_max)

    valid = (ev_k[1:] >= 0) & (ev_k[:-1] >= 0)
    interval = (ev_k[1:] - ev_k[:-1]).astype(y.dtype) \
        + (ev_f[1:] - ev_f[:-1])
    f0 = jnp.where(valid & (interval > 0), fs / jnp.where(
        interval > 0, interval, 1.0), 0.0)
    mid = 0.5 * (ev_k[1:] + ev_k[:-1]).astype(y.dtype) \
        + 0.5 * (ev_f[1:] + ev_f[:-1])
    loc = jnp.where(valid, mid / fs, jnp.inf)
    return loc, f0, jnp.maximum(cnt - 1, 0)


def _interp1(loc, val, cnt, tq):
    """C++ interp1 (world.cpp:94-105): segment search with clamped
    index, linear inter/extrapolation.  loc has +inf past cnt."""
    j = jnp.searchsorted(loc, tq, side="right") - 1
    j = jnp.clip(j, 0, jnp.maximum(cnt - 2, 0))
    x0 = loc[j]
    x1 = loc[j + 1]
    w = (tq - x0) / jnp.where(x1 > x0, x1 - x0, 1.0)
    return val[j] + w * (val[j + 1] - val[j])


def _dio_candidates(x, fs: int, tpos, f0_floor: float, f0_ceil: float,
                    channels_in_octave: float):
    """(num_bands, nf) candidate f0 + score arrays."""
    n = x.shape[0]
    kspec_np, lowcut_np, boundaries_np, fft_n = _band_kernels(
        n, fs, f0_floor, f0_ceil, channels_in_octave)
    kspec = jnp.asarray(kspec_np)
    lowcut = jnp.asarray(lowcut_np)
    boundaries = jnp.asarray(boundaries_np)
    e_max = max(n // 8, 16)

    x0 = (x - jnp.mean(x)).astype(jnp.float32)
    X = jnp.fft.rfft(x0, fft_n) * lowcut

    def band(bspec, boundary):
        y = jnp.fft.irfft(X * bspec, fft_n)[:n]
        dy = y[1:] - y[:-1]
        tracks = [_interval_track(y, 1.0, fs, e_max),
                  _interval_track(y, -1.0, fs, e_max),
                  _interval_track(dy, 1.0, fs, e_max),
                  _interval_track(dy, -1.0, fs, e_max)]
        usable = jnp.all(jnp.stack([t[2] >= 2 for t in tracks]))
        vs = jnp.stack([
            jax.vmap(lambda q, t=t: _interp1(t[0], t[1], t[2], q))(tpos)
            for t in tracks])                       # (4, nf)
        avg = jnp.mean(vs, axis=0)
        ok = usable & (avg >= f0_floor) & (avg <= f0_ceil) \
            & (avg >= boundary * 0.5) & (avg <= boundary)
        dev = jnp.sqrt(jnp.sum((vs - avg) ** 2, axis=0) / 3.0) \
            / jnp.where(avg > 0, avg, 1.0)
        return (jnp.where(ok, avg, 0.0),
                jnp.where(ok, dev, BAD_SCORE))

    return jax.vmap(band)(kspec, boundaries)        # (B, nf) x 2


def _fix_contour(cand_f0, cand_score, f0, frame_period: float,
                 f0_floor: float, allowed_range: float):
    """world.cpp:270-323 — jump kill, short-run drop, edge extension."""
    nf = f0.shape[0]

    # step 1: kill jumps > allowed_range (vs the ORIGINAL neighbor)
    prev = jnp.concatenate([f0[:1], f0[:-1]])
    jump = jnp.abs(f0 - prev) / jnp.where(f0 > 0, f0, 1.0)
    s1 = jnp.where((f0 > 0) & (prev > 0) & (jump > allowed_range),
                   0.0, f0)

    # step 2: drop voiced runs shorter than voice_range_minimum
    vrm = int(0.5 + 1000.0 / frame_period / f0_floor) * 2 + 1
    voiced = s1 > 0
    start = voiced & ~jnp.concatenate(
        [jnp.zeros(1, bool), voiced[:-1]])
    seg = jnp.cumsum(start)                         # 1-based segment id
    seg_id = jnp.where(voiced, seg, 0)
    run_len = jax.ops.segment_sum(voiced.astype(jnp.int32), seg_id,
                                  num_segments=nf + 1)[seg_id]
    s2 = jnp.where(voiced & (run_len >= vrm), s1, 0.0)

    # select_near: best candidate within allowed_range of ref
    def near(i, ref):
        v = cand_f0[:, i]
        err = jnp.where(v > 0, jnp.abs(v - ref) / jnp.maximum(ref, 1e-9),
                        jnp.inf)
        b = jnp.argmin(err)
        return jnp.where(err[b] < allowed_range, v[b], 0.0)

    # steps 3+4: forward then backward extension; the backward pass
    # overwrites the forward one where it succeeds (C++ section order)
    def ext(carry, i):
        ref, active = carry
        v2 = s2[i]
        cand = near(i, jnp.maximum(ref, 1e-9))
        extend = (v2 <= 0) & active & (cand > 0)
        out = jnp.where(v2 > 0, v2, jnp.where(extend, cand, 0.0))
        new_ref = jnp.where(v2 > 0, v2, jnp.where(extend, cand, ref))
        new_active = jnp.where(v2 > 0, True,
                               jnp.where(extend, active, False))
        return (new_ref, new_active), out

    _, fwd = jax.lax.scan(ext, (jnp.asarray(0.0, f0.dtype), False),
                          jnp.arange(nf))
    _, bwd = jax.lax.scan(ext, (jnp.asarray(0.0, f0.dtype), False),
                          jnp.arange(nf - 1, -1, -1))
    bwd = bwd[::-1]
    out = jnp.where(s2 > 0, s2,
                    jnp.where(bwd > 0, bwd, fwd))
    return out


def dio_f0(x, fs: int = 16000, frame_period: float = 10.0,
           f0_floor: float = F0_FLOOR, f0_ceil: float = F0_CEIL,
           channels_in_octave: float = 2.0,
           allowed_range: float = 0.1):
    """Jittable DIO: returns (f0, t) float32 arrays of
    1 + floor(1000*n/fs/frame_period) frames (world_dio contract)."""
    x = jnp.asarray(x, jnp.float32).reshape(-1)
    n = x.shape[0]
    nf = int(1000.0 * n / fs / frame_period) + 1
    tpos = jnp.arange(nf, dtype=jnp.float32) * (frame_period / 1000.0)
    cand_f0, cand_score = _dio_candidates(
        x, fs, tpos, f0_floor, f0_ceil, channels_in_octave)
    best = jnp.argmin(cand_score, axis=0)
    bscore = jnp.take_along_axis(cand_score, best[None], axis=0)[0]
    bf0 = jnp.take_along_axis(cand_f0, best[None], axis=0)[0]
    f0 = jnp.where(bscore < 0.12, bf0, 0.0)
    f0 = _fix_contour(cand_f0, cand_score, f0, frame_period, f0_floor,
                      allowed_range)
    return f0, tpos


def _refine_once(x, fs: int, tpos, f0, max_half: int, fft_n: int):
    """One instantaneous-frequency pass (world.cpp:335-375) on a fixed
    (2*max_half+1) buffer masked to the f0-adaptive window."""
    n = x.shape[0]
    half = jnp.round(1.5 * fs / jnp.maximum(f0, 1e-9)).astype(jnp.int32)
    half = jnp.minimum(half, max_half)
    center = jnp.round(tpos * fs).astype(jnp.int32)
    fits = (center - half >= 0) & (center + half < n) & (f0 > 0)

    j = jnp.arange(-max_half, max_half + 1)
    mask = jnp.abs(j) <= half
    t = j.astype(jnp.float32) * f0 / (1.5 * fs)
    win = jnp.where(mask, 0.42 + 0.5 * jnp.cos(jnp.pi * t)
                    + 0.08 * jnp.cos(2 * jnp.pi * t), 0.0)
    dwin = -(jnp.concatenate([win[1:], jnp.zeros(1)])
             - jnp.concatenate([jnp.zeros(1), win[:-1]])) / 2.0

    seg = jax.lax.dynamic_slice(
        jnp.pad(x, (max_half, max_half)),
        (jnp.maximum(center, 0),), (2 * max_half + 1,))
    seg = jnp.where(mask, seg, 0.0)

    W = jnp.fft.rfft(seg * win, fft_n)
    D = jnp.fft.rfft(seg * dwin, fft_n)

    h = jnp.arange(1, 7)                      # harmonics: min(fs/2f0, 6)
    n_h = jnp.minimum((0.5 * fs / jnp.maximum(f0, 1e-9)).astype(jnp.int32),
                      6)
    k = jnp.round(h * f0 / fs * fft_n).astype(jnp.int32)
    ok = (h <= n_h) & (k < fft_n // 2)
    Wk = W[jnp.clip(k, 0, fft_n // 2)]
    Dk = D[jnp.clip(k, 0, fft_n // 2)]
    power = jnp.abs(Wk) ** 2
    ok = ok & (power > 1e-30)
    fk = k.astype(jnp.float32) * fs / fft_n
    cross = jnp.real(Dk) * (-jnp.imag(Wk)) + jnp.imag(Dk) * jnp.real(Wk)
    inst = fk + cross / jnp.maximum(power, 1e-30) * fs / (2.0 * jnp.pi)
    amp = jnp.sqrt(power)
    num = jnp.sum(jnp.where(ok, inst * amp, 0.0))
    den = jnp.sum(jnp.where(ok, amp * h, 0.0))
    refined = jnp.where(den > 0, num / jnp.maximum(den, 1e-30), 0.0)
    return jnp.where(fits & (n_h >= 1), refined, 0.0)


def stonemask_f0(x, f0, t, fs: int = 16000,
                 f0_floor: float = F0_FLOOR):
    """Jittable StoneMask (world_stonemask contract): two IF passes
    per voiced frame; > 18% drift keeps the DIO estimate."""
    x = jnp.asarray(x, jnp.float32).reshape(-1)
    f0 = jnp.asarray(f0, jnp.float32)
    t = jnp.asarray(t, jnp.float32)
    max_half = int(1.5 * fs / f0_floor) + 1
    fft_n = _next_pow2(2 * max_half + 1) * 2

    def frame(tp, cur):
        r1 = _refine_once(x, fs, tp, cur, max_half, fft_n)
        r2 = jnp.where(r1 > 0,
                       _refine_once(x, fs, tp, r1, max_half, fft_n), 0.0)
        refined = jnp.where(r2 > 0, r2, r1)
        keep = (refined <= 0) | (jnp.abs(refined - cur) > 0.18 * cur)
        return jnp.where(cur <= 0, 0.0,
                         jnp.where(keep, cur, refined))

    return jax.vmap(frame)(t, f0)


def dio_pitch_track(audio, fs: int = 16000, frame_period: float = 10.0,
                    f0_floor: float = F0_FLOOR, f0_ceil: float = F0_CEIL):
    """DIO + StoneMask, fully on device (the reference's live pitch
    pair, essentials.py:451-455, as one jittable program)."""
    f0, t = dio_f0(audio, fs, frame_period, f0_floor, f0_ceil)
    return stonemask_f0(audio, f0, t, fs, f0_floor), t
