"""Fused AbbyNormal tail — the second decode-hot-path Pallas kernel.

Parity target: models/norms.py:AbbyNormal.__call__ (the reference's
learned-mode local response norm).  The decoder instantiates ~18
AbbyNormal norms per decode step; after the two router matmuls (left
in XLA — their flax params stay where checkpoints expect them) each
instance runs ~12 more XLA ops: squared activations, mean/std
coefficient-of-variation, hard routing, two sliding-window channel
reductions (`lax.reduce_window` mean and max), the peak-adaptive
select, and the `(alpha*div + k)^beta` normalizer.  This kernel fuses
that tail into one program.

The sliding windows run along the LANE (channel) axis as `size`
unrolled `pltpu.roll` steps with edge masks — torch semantics
reproduced exactly: avg_pool1d with count_include_pad=True (divide by
the full window), max_pool1d padded with -inf.

Eval-only scope (gated in models/norms.py): no gumbel rng, so the
hard routing is the deterministic one-hot argmax of (logits + cv).
Arithmetic is f32 internally; the output is cast back to the input
dtype.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, logits_ref, out_ref, *, size: int, alpha: float,
            k: float, beta: float):
    D = x_ref.shape[1]
    x = x_ref[:].astype(jnp.float32)                       # (N, D)
    logits = logits_ref[:].astype(jnp.float32)             # (N, 3)

    div = x * x
    mean_val = jnp.mean(jnp.abs(x), axis=-1, keepdims=True)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.sum((x - mu) * (x - mu), axis=-1,
                  keepdims=True) / (D - 1)
    cv = jnp.sqrt(var) / (mean_val + 1e-6)

    choice = jnp.argmax(logits + cv, axis=-1, keepdims=True)  # (N, 1)

    # sliding windows along the lane axis: a fori_loop (not a Python
    # unroll — Mosaic stack-allocates every unrolled temp and a
    # size-25 unroll overflows the 16 MB VMEM budget) of dynamic
    # rolls with edge masks
    pad = size // 2
    col = jax.lax.broadcasted_iota(jnp.int32, (1, D), 1)

    def win_body(j, carry):
        acc_s, acc_m = carry
        s = j - pad
        rolled = pltpu.roll(div, jnp.mod(-s, D), axis=1)
        mask = (col + s >= 0) & (col + s < D)
        return (acc_s + jnp.where(mask, rolled, 0.0),
                jnp.maximum(acc_m, jnp.where(mask, rolled, -jnp.inf)))

    acc_s, acc_m = jax.lax.fori_loop(
        0, size, win_body,
        (jnp.zeros_like(div), jnp.full_like(div, -jnp.inf)))
    avg_d = acc_s / size

    div2 = jnp.where(acc_m > 2.0 * avg_d, acc_m, avg_d)
    # decisions 0 and 2 both resolve to avg_d (confidence=None)
    mix = jnp.where(choice == 1, div2, avg_d)
    denom = jnp.exp(beta * jnp.log(mix * alpha + k))
    out_ref[:] = (x / denom).astype(out_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("size", "alpha", "k", "beta",
                                    "interpret"))
def fused_abby_tail(x2, logits2, size: int, alpha: float, k: float,
                    beta: float, interpret: bool = False):
    """``x2`` (N, D), ``logits2`` (N, 3) from the router MLP; returns
    the normalized (N, D) output in x2's dtype.

    Every op is row-independent (all reductions run along D), so the
    program CAN tile N over a grid; partial edge blocks are safe
    (Mosaic masks the stores, and garbage rows never mix into other
    rows' lane-axis reductions).  In production the norms.py call site
    gates engagement to decode-prefix sizes (x.size <= 400k — encoder-
    length calls measured faster on XLA, which fuses the tail into the
    surrounding ops), so gated callers always take the single-block
    whole-array path — the round-2-measured configuration.  The grid
    path serves forced large-N use (PALLAS_ABBY=on, direct calls)."""
    N, D = x2.shape
    kernel = functools.partial(_kernel, size=size, alpha=float(alpha),
                               k=float(k), beta=float(beta))
    # single block for anything the production gate admits; beyond
    # that, TN=256 keeps ~6 (TN, D) f32 live temps under ~4 MB VMEM
    # at the flagship D=512
    tn = N if N * D <= 400_000 else 256
    return pl.pallas_call(
        kernel,
        grid=(pl.cdiv(N, tn),),
        out_shape=jax.ShapeDtypeStruct((N, D), x2.dtype),
        in_specs=[
            pl.BlockSpec((tn, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tn, D), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x2, logits2)
