"""Stochastic routing primitives with explicit PRNG keys.

The reference uses torch's global-RNG ``F.gumbel_softmax`` (model.py:70,
476).  TPU-native determinism requires explicit keys: modules draw from
the flax rng collection ``"gumbel"`` when present and fall back to a
deterministic hard argmax otherwise (eval/determinism mode).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gumbel_softmax(rng, logits, tau: float = 1.0, hard: bool = True):
    """Straight-through gumbel-softmax (parity with F.gumbel_softmax).

    With ``rng=None`` no noise is added (deterministic argmax routing).
    """
    if rng is not None:
        g = jax.random.gumbel(rng, logits.shape, logits.dtype)
        y = (logits + g) / tau
    else:
        y = logits / tau
    y_soft = jax.nn.softmax(y, axis=-1)
    if not hard:
        return y_soft
    idx = jnp.argmax(y_soft, axis=-1)
    y_hard = jax.nn.one_hot(idx, logits.shape[-1], dtype=logits.dtype)
    # straight-through: forward=hard, backward=soft
    return y_hard + y_soft - jax.lax.stop_gradient(y_soft)


def ste_threshold(x, threshold):
    """Straight-through binary threshold (parity: STthreshold,
    model.py:319-334 — forward ``(x > t).float()``, backward identity)."""
    hard = (x > threshold).astype(x.dtype)
    return hard + x - jax.lax.stop_gradient(x)
