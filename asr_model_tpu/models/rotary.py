"""Signal-adaptive rotary embedding.

Parity target: ``rotary`` model.py:171-214.  Distinctive behavior: the
complex rotation's *magnitude* is the L2 norm of a conditioning tensor
(``m = ||xa||; torch.polar(m, f)``, model.py:201-205), so this both
rotates and rescales q/k per position.  Frequency ladders:

* cross-attention (no causal mask): acoustic gammatone scale —
  ``200 * gammatone(dims, head) / 1000`` where gammatone returns
  log-spaced 200..8000 Hz divided by 1000 (model.py:180-183,193-194).
* causal self-attention: theta-log spacing
  ``arange(0, hd, 2)/hd * ln(theta)`` (model.py:196).

Only the first ``2*(head_dim//2)`` channels are rotated; the remainder
passes through (model.py:207-214).

The reference's magnitude broadcast (``(b,t,hd/2)`` against
``(b,h,t,hd/2)``) only works at batch size 1; here the magnitude is
shaped ``(b,1,t,1)`` — identical numerics at B=1, correct for any B.
The unused ``n.lin`` projection (model.py:178) is reproduced as an
optional parameter for checkpoint parity and never applied.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from asr_model_tpu.config import THETA


def gammatone_freqs(dims: int, head: int, min_freq: float = 200.0,
                    max_freq: float = 8000.0) -> np.ndarray:
    """Log-spaced acoustic frequencies in kHz (essentials.py:237-240)."""
    head_dim = dims // head
    lin = np.linspace(0, 1, head_dim // 2, dtype=np.float32)
    f = (max_freq / min_freq) ** lin * min_freq
    return (f / 1000.0).astype(np.float32)


def wideband_freqs(dims: int, head: int, max_freq: float = 8000.0) -> np.ndarray:
    """Mel-derived frequency ladder in kHz (essentials.py:242-246)."""
    head_dim = dims // head
    mel_max = 2595.0 * np.log10(1.0 + max_freq / 700.0)
    mel_scale = 10.0 ** (np.linspace(0, mel_max, head_dim // 2) / 2595.0) - 1.0
    return (700.0 * mel_scale / 1000.0).astype(np.float32)


def compute_freqs(dims: int, head: int, causal: bool,
                  theta: float = THETA,
                  dtype=np.float32) -> np.ndarray:
    """Per-channel angular frequency ladder, shape (head_dim//2,).

    ``dtype=np.float64`` reproduces the reference's float64 arithmetic
    exactly (used by the float64 parity golden, which pins the torch
    quirk of taking ``log`` of an f32 theta tensor, model.py:196); the
    default float32 path is the production ladder."""
    head_dim = dims // head
    if np.dtype(dtype) == np.float64:
        if not causal:
            lin = np.linspace(0.0, 1.0, head_dim // 2)
            g = (8000.0 / 200.0) ** lin * 200.0 / 1000.0
            return 200.0 * g / 1000.0
        idx = np.arange(0, head_dim, 2, dtype=np.float64)
        log_theta = float(np.log(np.float32(theta), dtype=np.float32))
        return idx / head_dim * log_theta
    if not causal:
        return (200.0 * gammatone_freqs(dims, head) / 1000.0).astype(np.float32)
    idx = np.arange(0, head_dim, 2, dtype=np.float32)
    return (idx / head_dim * math.log(theta)).astype(np.float32)


class Rotary(nn.Module):
    """Rotate (and rescale) the first 2*(hd//2) channels of (B,H,T,hd)."""

    dims: int
    head: int
    theta: float = THETA

    @nn.compact
    def __call__(self, x: jnp.ndarray, cond: jnp.ndarray,
                 causal: bool, offset=0) -> jnp.ndarray:
        """``offset`` shifts the position index of x's time axis — the
        incremental decode path feeds single-position tensors whose
        global position is the prefix length (models/generate.py)."""
        head_dim = self.dims // self.head
        half = head_dim // 2
        # checkpoint-parity placeholder (model.py:178, never applied)
        self.param("lin_kernel", nn.initializers.zeros, (self.dims, half))
        self.param("lin_bias", nn.initializers.zeros, (half,))

        # float64 inputs (x64 parity mode) keep the angle computation in
        # float64 like the reference's global-dtype torch path does
        f64 = x.dtype == jnp.float64
        t = jnp.arange(x.shape[2],
                       dtype=jnp.float64 if f64 else jnp.float32)
        t = t + jnp.asarray(offset, t.dtype)
        freqs = jnp.asarray(compute_freqs(
            self.dims, self.head, causal, self.theta,
            dtype=np.float64 if f64 else np.float32))
        f = t[:, None] * freqs[None, :]                      # (T, half)

        # magnitude from the conditioning tensor: (B, T, 1) -> (B,1,T,1)
        # safe norm: ||c|| has a 0/0 = NaN gradient at c == 0, and a
        # masked-out all-zero row (e.g. a pipeline bubble tick,
        # parallel/pipeline.py) would leak that NaN into the weight
        # grads through the zero-cotangent chain rule.  Identical
        # values to jnp.linalg.norm for nonzero rows; subgradient 0 at
        # the (non-differentiable) origin.
        sq = jnp.sum(cond * cond, axis=-1, keepdims=True)[:, None]
        nz = sq > 0
        m = jnp.where(nz, jnp.sqrt(jnp.where(nz, sq, 1.0)), 0.0)

        cos = m * jnp.cos(f)                                 # (B,1,T,half)
        sin = m * jnp.sin(f)

        x1 = x[..., : 2 * half]
        x2 = x[..., 2 * half:]
        xr = x1.reshape(*x1.shape[:-1], half, 2)
        a, b = xr[..., 0], xr[..., 1]
        # (a + ib) * (cos + i sin)
        ra = a * cos - b * sin
        rb = a * sin + b * cos
        rot = jnp.stack([ra, rb], axis=-1).reshape(x1.shape)
        return jnp.concatenate([rot.astype(x.dtype), x2], axis=-1)
