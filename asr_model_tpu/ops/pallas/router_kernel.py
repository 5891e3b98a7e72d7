"""Fused modality Router for identical inputs — one dispatch.

Parity target: models/gates.py:Router (reference ``router``
model.py:537-557) for the case every call site in the decoder actually
uses: ``router(*[x] * n)`` — the SAME tensor stacked n times
(models/decoder.py).  With identical modalities the math collapses:

  flat = [x | x | x]            ->  flat @ W == x @ (sum of W's D-row
                                    slices)  (done in-kernel)
  out  = sum_i stack_i * w_i    ->  x * sum_i(w_i)

so the whole call is two tiny matmuls, the alpha-blended
top-k(2)-hard + soft selection, and one elementwise scale.  The XLA
path costs ~8 dispatches per call x 6 calls per decode step; this is
ONE (the decode step is dispatch-latency-bound, BENCH_NOTES).

The top-k(2) scatter(softmax(top-k values)) is reproduced exactly for
k=2 with first-occurrence argmax tie-breaking (jax.lax.top_k order).
Eval-only scope like the other decode kernels; the call site gates in
models/gates.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _topk2_hard(scores):
    """scatter(softmax(top-2 values)) for (N, nt) scores with
    jax.lax.top_k's first-occurrence tie-breaking."""
    nt = scores.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    v1 = jnp.max(scores, axis=1, keepdims=True)
    # first column attaining the max
    i1 = jnp.min(jnp.where(scores == v1, col, nt), axis=1, keepdims=True)
    masked = jnp.where(col == i1, NEG_INF, scores)
    v2 = jnp.max(masked, axis=1, keepdims=True)
    i2 = jnp.min(jnp.where(masked == v2, col, nt), axis=1, keepdims=True)
    # softmax over the two selected values
    m = jnp.maximum(v1, v2)
    e1 = jnp.exp(v1 - m)
    e2 = jnp.exp(v2 - m)
    z = e1 + e2
    hot1 = (col == i1).astype(scores.dtype)
    hot2 = (col == i2).astype(scores.dtype)
    return hot1 * (e1 / z) + hot2 * (e2 / z)


def _kernel(x_ref, top_w, top_b, soft_w, soft_b, alpha_ref, out_ref, *,
            num_types: int, n_mod: int):
    x = x_ref[:]                                    # (TN, D)
    D = x.shape[1]
    dt = x.dtype

    def eff(w_ref):
        """(n_mod*D, nt) weight -> (D, nt) sum of D-row slices
        (identical stacked inputs collapse the concat contraction)."""
        w = w_ref[:].astype(jnp.float32)
        s = w[0:D]
        for i in range(1, n_mod):
            s = s + w[i * D:(i + 1) * D]
        return s.astype(dt)

    top = (jnp.dot(x, eff(top_w), preferred_element_type=jnp.float32)
           + top_b[:].astype(jnp.float32))          # (TN, nt)
    soft_logits = (jnp.dot(x, eff(soft_w),
                           preferred_element_type=jnp.float32)
                   + soft_b[:].astype(jnp.float32))
    soft = jax.nn.softmax(soft_logits, axis=-1)
    alpha = jax.nn.sigmoid(alpha_ref[0, 0])
    w = alpha * _topk2_hard(top) + (1.0 - alpha) * soft
    scale = jnp.sum(w, axis=1, keepdims=True)       # identical inputs
    out_ref[:] = (x.astype(jnp.float32) * scale).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_types", "n_mod",
                                             "interpret"))
def fused_router_same(x2, top_w, top_b, soft_w, soft_b, alpha,
                      num_types: int, n_mod: int,
                      interpret: bool = False):
    """``x2`` (N, D) routed as ``Router(*[x] * n_mod)`` in one
    dispatch.  ``top_w``/``soft_w``: (n_mod*D, num_types);
    ``alpha``: the raw () parameter (sigmoid applied in-kernel)."""
    N, D = x2.shape
    nt = num_types
    kernel = functools.partial(_kernel, num_types=nt, n_mod=n_mod)
    tn = N if N * D <= 400_000 else min(N, 256)
    pinned = lambda s: pl.BlockSpec(s, lambda i, n=len(s): (0,) * n,
                                    memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(pl.cdiv(N, tn),),
        out_shape=jax.ShapeDtypeStruct((N, D), x2.dtype),
        in_specs=[pl.BlockSpec((tn, D), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pinned((n_mod * D, nt)), pinned((1, nt)),
                  pinned((n_mod * D, nt)), pinned((1, nt)),
                  pl.BlockSpec((1, 1), lambda i: (0, 0),
                               memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((tn, D), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x2, top_w, top_b.reshape(1, nt), soft_w, soft_b.reshape(1, nt),
      jnp.asarray(alpha, jnp.float32).reshape(1, 1))
