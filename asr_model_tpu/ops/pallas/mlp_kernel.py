"""Fused residual-MLP tail — one kernel for ``x + Residual._mlp(x)``.

Parity target: models/decoder.py:Residual._mlp (the reference's
residual MLP, model.py:573-574,583): shared-AbbyNormal ``ln`` ->
TGate (num_types sigmoid gates mixed by a softmax classifier,
model.py:525-535) -> Dense(d, 3d) -> exact-erf GELU -> Dense(3d, d) ->
``ln`` again, plus the caller's residual add.  At decode the XLA path
costs ~12 dispatches per Residual call x 5 calls per step; this kernel
is ONE dispatch per call (the decode step is dispatch-latency-bound,
BENCH_NOTES).

Rows are independent (every reduction runs along channels), so the
program tiles N over a TN=256 grid with the weights pinned to block 0
— the (N, 3d) GELU hidden is the VMEM governor.  AbbyNormal
applications reuse ``abby_kernel.abby_full_compute`` (router matmuls
included; the SAME ln instance serves both positions — one weight
set, the reference's sharing quirk).  f32 arithmetic internally;
matmuls contract in the storage dtype with f32 accumulation.
Eval-only, no VJP — gated at the call site like the other decode
kernels (models/decoder.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from asr_model_tpu.ops.pallas.abby_kernel import abby_full_compute


def _erf(x):
    """Abramowitz & Stegun 7.1.26 rational erf (max abs error 1.5e-7 —
    below f32 rounding for the gelu use).  Mosaic registers no lowering
    for lax.erf/erfc, so the exact-erf gelu is built from exp."""
    p = 0.3275911
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    y = 1.0 - poly * jnp.exp(-ax * ax)
    return jnp.where(x >= 0, y, -y)


def _gelu_exact(x):
    """torch nn.GELU() / flax nn.gelu(approximate=False) to ~1e-7."""
    return 0.5 * x * (1.0 + _erf(x * 0.7071067811865476))


def _kernel(*refs, num_types: int, size_d: int, abby_kw: dict):
    (x_ref, ln_w1, ln_b1, ln_w2, ln_b2, cs_w, cs_b,
     in_w, in_b, out_w, out_b) = refs[:11]
    gate_refs = refs[11:11 + 2 * num_types]
    out_ref = refs[-1]
    x = x_ref[:]                                   # (TN, D)
    dt = x.dtype
    ln = {"w1": ln_w1[:], "b1": ln_b1[:], "w2": ln_w2[:], "b2": ln_b2[:]}

    h0 = abby_full_compute(x, ln["w1"], ln["b1"], ln["w2"], ln["b2"],
                           size=size_d, **abby_kw)          # (TN, D) f32
    h0d = h0.astype(dt)

    # TGate: softmax classifier weights x sigmoid gates, accumulated
    # gate-by-gate (no (TN, D, nt) stack in VMEM)
    types = jax.nn.softmax(
        jnp.dot(h0d, cs_w[:], preferred_element_type=jnp.float32)
        + cs_b[:].astype(jnp.float32), axis=-1)             # (TN, nt)
    h1 = jnp.zeros_like(h0)
    for i in range(num_types):
        gw, gb = gate_refs[2 * i], gate_refs[2 * i + 1]
        ga = jax.nn.sigmoid(
            jnp.dot(h0d, gw[:], preferred_element_type=jnp.float32)
            + gb[:].astype(jnp.float32))
        h1 = h1 + ga * types[:, i:i + 1]

    h2 = (jnp.dot(h1.astype(dt), in_w[:],
                  preferred_element_type=jnp.float32)
          + in_b[:].astype(jnp.float32))                    # (TN, 3D)
    h2 = _gelu_exact(h2)                                    # torch-exact
    h3 = (jnp.dot(h2.astype(dt), out_w[:],
                  preferred_element_type=jnp.float32)
          + out_b[:].astype(jnp.float32))                   # (TN, D)
    h4 = abby_full_compute(h3.astype(dt), ln["w1"], ln["b1"], ln["w2"],
                           ln["b2"], size=size_d, **abby_kw)
    out_ref[:] = (x.astype(jnp.float32) + h4).astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("num_types", "size_d", "alpha", "k",
                              "beta", "interpret"))
def fused_mlp_residual(x2, ln_w, cs_w, cs_b, gates, in_w, in_b,
                       out_w, out_b, num_types: int, size_d: int,
                       alpha: float, k: float, beta: float,
                       interpret: bool = False):
    """``x2`` (N, D) -> ``x2 + _mlp(x2)`` in one dispatch.

    ``ln_w``: (w1 (D,D), b1 (D,), w2 (D,3), b2 (3,)) AbbyNormal router
    weights of the shared ``ln``; ``gates``: [(w (D,D), b (D,)), ...]
    per TGate gate; ``cs_w``/``cs_b``: (D, nt)/(nt,) classifier;
    ``in_w``/``out_w``: (D, nt*D)/(nt*D, D) MLP pair."""
    N, D = x2.shape
    H = in_w.shape[1]
    abby_kw = dict(alpha=float(alpha), k=float(k), beta=float(beta))
    kernel = functools.partial(_kernel, num_types=num_types,
                               size_d=size_d, abby_kw=abby_kw)
    tn = N if N * D <= 150_000 else min(N, 256)
    row = lambda b: b.reshape(1, -1)
    pinned = lambda s: pl.BlockSpec(s, lambda i, n=len(s): (0,) * n,
                                    memory_space=pltpu.VMEM)
    operands = [x2, ln_w[0], row(ln_w[1]), ln_w[2], row(ln_w[3]),
                cs_w, row(cs_b), in_w, row(in_b), out_w, row(out_b)]
    in_specs = [pl.BlockSpec((tn, D), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pinned((D, D)), pinned((1, D)), pinned((D, 3)),
                pinned((1, 3)), pinned((D, num_types)),
                pinned((1, num_types)), pinned((D, H)), pinned((1, H)),
                pinned((H, D)), pinned((1, D))]
    for gw, gb in gates:
        operands += [gw, row(gb)]
        in_specs += [pinned((D, D)), pinned((1, D))]
    return pl.pallas_call(
        kernel,
        grid=(pl.cdiv(N, tn),),
        out_shape=jax.ShapeDtypeStruct((N, D), x2.dtype),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tn, D), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*operands)
