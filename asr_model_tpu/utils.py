"""Small shared helpers.

Parity: the null-coalescing helper family at essentials.py:19-39
(``have``/``aorb``/``aborc``/``abcord``/``no_none``/``l2norm``/
``exact_div``) used for modality-priority selection in Model.forward
(model.py:656-662).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def have(a):
    return a is not None


def aorb(a, b):
    return a if have(a) else b


def aborc(a, b, c):
    return aorb(a, aorb(b, c))


def abcord(a, b, c, d):
    return aorb(a, aborc(b, c, d))


def no_none(x: dict) -> dict:
    """Drop None-valued entries from a feature dict (essentials.py:31-32)."""
    return {k: v for k, v in x.items() if v is not None}


def l2norm(t, axis=-1, eps=1e-12):
    """F.normalize(t, dim=-1) equivalent (essentials.py:34-35).

    torch.nn.functional.normalize divides by max(||t||, eps).  The
    norm carries a defined (zero) subgradient at t == 0:
    jnp.linalg.norm's backward is 0/0 there even though the forward
    clamps — same safe-norm pattern as rotary.py / norms.AbbyNormal
    (zero rows occur legitimately: MoE capacity drops, pipeline
    bubble ticks).  Forward values are identical."""
    sq = jnp.sum(t * t, axis=axis, keepdims=True)
    nz = sq > 0
    n = jnp.where(nz, jnp.sqrt(jnp.where(nz, sq, 1.0)), 0.0)
    return t / jnp.maximum(n, eps)


def exact_div(x: int, y: int) -> int:
    assert x % y == 0
    return x // y


def default_platform() -> str:
    """Platform computations will actually land on: honors an active
    ``jax.default_device(...)`` context / config (host-pinned feature
    extraction inside a TPU process), falling back to the default
    backend.  All Pallas kernel gates route through this — gating on
    ``jax.default_backend()`` alone would launch TPU kernels on a
    CPU-pinned computation."""
    dd = jax.config.jax_default_device
    if dd is not None:
        try:
            return dd.platform
        except AttributeError:      # a string like "cpu"
            return str(dd)
    return jax.default_backend()


# --------------------------------------------------------------------------
# decode-tracing context: the greedy-decode builders (models/generate.py)
# trace their step bodies inside this context, so shape-gated Pallas
# kernels can tell "a decode prefix buffer at large batch" (row-tiled
# kernel still wins — the decode loop is dispatch-bound) from "an
# encoder-length activation" (XLA's fused tail wins, measured in round
# 2: 402.9x -> 303.0x with encoder calls through the kernel).  Trace-
# time only — like parallel/seq.py's seq-sharding context, the flag is
# consulted while tracing and baked into the compiled program.

import contextlib as _contextlib

_DECODE_TRACING = False


def in_decode_tracing() -> bool:
    return _DECODE_TRACING


@_contextlib.contextmanager
def decode_tracing():
    global _DECODE_TRACING
    prev = _DECODE_TRACING
    _DECODE_TRACING = True
    try:
        yield
    finally:
        _DECODE_TRACING = prev
