"""Audio-domain helpers: sinusoidal PE and frame-rate waveform.

Parity targets: sinusoids essentials.py:354-358 (concat [sin|cos]
layout, NOT interleaved, theta=30000); waveform downsample
essentials.py:493-510 (adaptive average pooling to the mel frame rate,
or linear interpolation upsample).
"""

from __future__ import annotations

import jax.numpy as jnp

from asr_model_tpu.config import THETA


def sinusoids(ctx: int, dims: int, theta: float = THETA) -> jnp.ndarray:
    """Sin/cos positional embedding, concat layout ``[sin | cos]``.

    tscales = exp(-ln(theta)/(dims//2 - 1) * arange(dims//2)).
    Returns (ctx, dims), float32.
    """
    half = dims // 2
    tscales = jnp.exp(-jnp.log(theta) / (half - 1) * jnp.arange(half,
                                                                dtype=jnp.float32))
    scaled = jnp.arange(ctx, dtype=jnp.float32)[:, None] * tscales[None, :]
    return jnp.concatenate([jnp.sin(scaled), jnp.cos(scaled)], axis=1)


def adaptive_avg_pool1d(x: jnp.ndarray, target: int) -> jnp.ndarray:
    """torch F.adaptive_avg_pool1d semantics over the last axis:
    out[i] = mean(x[floor(i*L/T) : ceil((i+1)*L/T)]).

    Vectorized with a cumulative sum so every output bin is O(1).
    """
    L = x.shape[-1]
    i = jnp.arange(target)
    start = jnp.floor(i * L / target).astype(jnp.int32)
    end = jnp.ceil((i + 1) * L / target).astype(jnp.int32)
    csum = jnp.cumsum(x, axis=-1)
    csum = jnp.concatenate([jnp.zeros_like(csum[..., :1]), csum], axis=-1)
    total = jnp.take(csum, end, axis=-1) - jnp.take(csum, start, axis=-1)
    return total / (end - start).astype(x.dtype)


def linear_interpolate(x: jnp.ndarray, target: int) -> jnp.ndarray:
    """torch F.interpolate(mode='linear', align_corners=False) over the
    last axis (half-pixel-center convention, edges clamped)."""
    L = x.shape[-1]
    scale = L / target
    pos = (jnp.arange(target, dtype=jnp.float32) + 0.5) * scale - 0.5
    pos = jnp.clip(pos, 0.0, L - 1)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, L - 1)
    w = pos - lo.astype(jnp.float32)
    xlo = jnp.take(x, lo, axis=-1)
    xhi = jnp.take(x, hi, axis=-1)
    return xlo * (1 - w) + xhi * w


def frame_rate_waveform(audio: jnp.ndarray, sample_rate: int = 16000,
                        hop_length: int = 160) -> jnp.ndarray:
    """Downsample (or upsample) a waveform to the mel frame rate.

    target = floor(len/sr) * (sr/hop) — NOTE the reference computes
    ``int((len/sr) * (sr//hop))`` (essentials.py:495), i.e. duration in
    (float) seconds times frames-per-second, reproduced exactly.
    Returns shape (1, target).
    """
    n = audio.shape[-1]
    target = int((n / sample_rate) * (sample_rate // hop_length))
    target = max(target, 1)
    x = audio.reshape(1, -1)
    if n > target:
        out = adaptive_avg_pool1d(x, target)
    else:
        out = linear_interpolate(x, target)
    return out


def peak_normalize(w: jnp.ndarray) -> jnp.ndarray:
    """Peak normalization matching load_wave (essentials.py:301-319):
    divide by max(|w|) when positive."""
    m = jnp.max(jnp.abs(w))
    return jnp.where(m > 0, w / m, w)
