"""Fused AbbyNormal tail — the second decode-hot-path Pallas kernel.

Parity target: models/norms.py:AbbyNormal.__call__ (the reference's
learned-mode local response norm).  The decoder runs ~45 AbbyNormal
applications per decode step; each eval application is the router MLP
(two matmuls + silu) followed by ~12 more ops: squared activations,
mean/std coefficient-of-variation, hard routing, two sliding-window
channel reductions (`lax.reduce_window` mean and max), the peak-
adaptive select, and the `(alpha*div + k)^beta` normalizer.
``fused_abby`` fuses the WHOLE program (router included — the flax
params stay under router_in/router_out where checkpoints expect them,
declared by norms._DenseParams and passed in as operands);
``fused_abby_tail`` is the logits-precomputed variant kept for direct
callers and parity tests.

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


def abby_tail_compute(x, logits, *, size: int, alpha: float, k: float,
                      beta: float):
    """Eval-mode AbbyNormal tail on VALUES: ``x`` (N, D) f32, ``logits``
    (N, 3) f32 -> normalized (N, D) f32.  Reused by other fused kernels
    (the cross-attention step kernel inlines two of these)."""
    D = x.shape[1]

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
    return x / denom


def abby_full_compute(x, w1, b1, w2, b2, *, size: int, alpha: float,
                      k: float, beta: float):
    """The whole eval-mode AbbyNormal on VALUES: router MLP + tail.
    ``x`` (N, D) in storage dtype; weights in storage dtype; biases as
    (1, features) rows.  Matmuls run on the MXU in the storage dtype
    with f32 accumulation (the same contraction XLA performs for the
    nn.Dense pair); everything after is f32.  Returns (N, D) f32."""
    h = (jnp.dot(x, w1, preferred_element_type=jnp.float32)
         + b1.astype(jnp.float32))                          # (N, D) f32
    h = jax.nn.silu(h)
    logits = (jnp.dot(h.astype(x.dtype), w2,
                      preferred_element_type=jnp.float32)
              + b2.astype(jnp.float32))                     # (N, 3)
    return abby_tail_compute(x.astype(jnp.float32), logits, size=size,
                             alpha=alpha, k=k, beta=beta)


def _kernel(x_ref, logits_ref, out_ref, *, size: int, alpha: float,
            k: float, beta: float):
    out = abby_tail_compute(x_ref[:].astype(jnp.float32),
                            logits_ref[:].astype(jnp.float32),
                            size=size, alpha=alpha, k=k, beta=beta)
    out_ref[:] = out.astype(out_ref.dtype)


def _full_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref, *,
                 size: int, alpha: float, k: float, beta: float):
    """Router MLP (Dense -> silu -> Dense) + the tail, one program."""
    out = abby_full_compute(x_ref[:], w1_ref[:], b1_ref[:], w2_ref[:],
                            b2_ref[:], size=size, alpha=alpha, k=k,
                            beta=beta)
    out_ref[:] = out.astype(out_ref.dtype)


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
    rows' lane-axis reductions).  norms.py routes through ``fused_abby``
    (router matmuls included) since round 4; this logits-precomputed
    variant serves direct callers and the parity tests."""
    N, D = x2.shape
    kernel = functools.partial(_kernel, size=size, alpha=float(alpha),
                               k=float(k), beta=float(beta))
    # single block for anything the production gate admits; beyond
    # that, TN=256 keeps ~6 (TN, D) f32 live temps under ~4 MB VMEM
    # at the flagship D=512.  MEASURED (round 5, B=64 headline):
    # TN=648 (7 blocks instead of 17 for a width-65 buffer) is 3.7%
    # SLOWER end-to-end (589.5x -> 567.8x) — the sequential grid
    # overlaps each block's DMA with the previous block's compute, so
    # fewer/bigger blocks lose pipelining and raise VMEM pressure;
    # block-count overhead is not the cost.  min(N, .): a short-but-
    # wide array (N < 256 with N*D > 400k, e.g. D=2048) must not
    # request a block taller than the array.
    tn = N if N * D <= 400_000 else min(N, 256)
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


@functools.partial(jax.jit,
                   static_argnames=("size", "alpha", "k", "beta",
                                    "interpret"))
def fused_abby(x2, w1, b1, w2, b2, size: int, alpha: float, k: float,
               beta: float, interpret: bool = False):
    """The WHOLE AbbyNormal eval program in one kernel: router MLP
    (``w1``/``b1`` (D, D)/(D,), ``w2``/``b2`` (D, 3)/(3,)) + stats +
    hard routing + windowed channel reductions + normalizer.

    The decoder runs ~45 AbbyNormal applications per decode step (the
    shared block ``ln``, every attention's q/kv/head norms, the MLP
    norms); at decode sizes each XLA-routed application costs 3-4
    kernel dispatches (two router matmuls + the fused tail).  Fusing
    the router in cuts that to ONE dispatch per application — the
    decode step is dispatch-latency-bound (BENCH_NOTES), so this is
    the direct lever.  Weights are replicated across row-grid blocks
    (index_map pins block 0)."""
    N, D = x2.shape
    kernel = functools.partial(_full_kernel, size=size,
                               alpha=float(alpha), k=float(k),
                               beta=float(beta))
    tn = N if N * D <= 400_000 else min(N, 256)  # see fused_abby_tail
    return pl.pallas_call(
        kernel,
        grid=(pl.cdiv(N, tn),),
        out_shape=jax.ShapeDtypeStruct((N, D), x2.dtype),
        in_specs=[
            pl.BlockSpec((tn, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, D), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, 3), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tn, D), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x2, w1, b1.reshape(1, D), w2, b2.reshape(1, 3))
