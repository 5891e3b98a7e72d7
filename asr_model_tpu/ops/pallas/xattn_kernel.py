"""Fused decode attention step — whole Attention calls as ONE kernel.

Parity target: models/attention.py:Attention.__call__ (reference
``attention`` model.py:234-317) at decode shapes.  A parity-model
decode step runs NINE attention calls (5 self + 3 cached-KV cross + 1
full cross, models/decoder.py:run_block); each XLA-routed call costs
~10-15 dispatches (AbbyNormal q/kv norms, projections, the
signal-adaptive rotary chain, per-head norms, the softmax pair, the
output projection) and the decode step is dispatch-latency-bound
(BENCH_NOTES).  These kernels run an entire call as one program:

``fused_attn_cached``: q-side (AbbyNormal q_norm -> q_proj -> scale ->
rotary(cond=x) -> AbbyNormal head_norm) + online attention over a
PRECOMPUTED K/V buffer + out_proj — the b/c/d cross-attention calls
against the per-utterance audio KV cache.

``fused_attn_full``: the same q-side plus the kv side (AbbyNormal
kv_norm -> kv_proj -> scale -> rotary(cond=xa) -> head_norm) — the
self-attention calls (xa == x) and the g-block's full cross call.

Design notes:
* The signal-adaptive rotary (models/rotary.py) rotates lane PAIRS
  (2i, 2i+1) with per-pair frequencies and a per-position magnitude
  ``||cond_row||``.  In lane terms: out = x*(m*cos_rep) +
  swap(x)*(m*sin_signed) where swap exchanges adjacent lanes (two
  ``pltpu.roll``s + a parity select) — pairs never cross a head
  boundary (head_dim is even), so the whole (T, D) tensor rotates in
  one shot with the frequency ladder tiled per head.
* AbbyNormal applications reuse ``abby_kernel.abby_full_compute`` —
  same math as the standalone fused_abby dispatch.
* Heads are processed by a static Python loop over lane-aligned
  slices; the per-head window of head_norm must not cross heads, so
  slicing is REQUIRED for correctness, not just layout.
* f32 arithmetic internally; matmuls contract in the storage dtype
  with f32 accumulation (what XLA does for the nn.Dense/einsum chain).
* Eval-only, no VJP: call sites gate on the absence of the gumbel rng
  (models/attention.py), the same proxy the AbbyNormal gate uses.

Weight operands are passed explicitly (their flax params stay under
q_norm/q_proj/kv_norm/kv_proj/head_norm/out_proj where checkpoints
expect them; models/attention.py fetches the bound submodule
variables).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from asr_model_tpu.ops.pallas.abby_kernel import abby_full_compute

NEG_INF = -1e30


def tiled_freqs(freqs: np.ndarray, head: int) -> np.ndarray:
    """(half,) per-pair frequency ladder -> (1, head*2*half) lane row:
    freqs_rep[l] = freqs[(l % (2*half)) // 2]."""
    rep = np.repeat(freqs, 2)                      # (hd,) pairwise
    return np.tile(rep, head)[None, :].astype(np.float32)


def _safe_row_norm(x32):
    """(N, D) f32 -> (N, 1) ||row||, 0 at all-zero rows (rotary.py)."""
    sq = jnp.sum(x32 * x32, axis=-1, keepdims=True)
    nz = sq > 0
    return jnp.where(nz, jnp.sqrt(jnp.where(nz, sq, 1.0)), 0.0)


def _rotate(x32, m, cos_rep, sin_rep, even_mask):
    """Signal-adaptive rotary on (N, D) f32 lanes (module docstring)."""
    D = x32.shape[1]
    swap = jnp.where(even_mask, pltpu.roll(x32, D - 1, axis=1),
                     pltpu.roll(x32, 1, axis=1))
    sin_signed = jnp.where(even_mask, -sin_rep, sin_rep)
    return x32 * (m * cos_rep) + swap * (m * sin_signed)


def _q_side(x, freqs_ref, *, wq, size_d: int, size_h: int, hd: int,
            abby_kw: dict, dt):
    """AbbyNormal q_norm -> q_proj -> scale -> rotary(cond=x); returns
    the rotated (T, D) f32 query (head_norm still pending per head)."""
    T, D = x.shape
    qn_in = abby_full_compute(x, wq["n_w1"], wq["n_b1"], wq["n_w2"],
                              wq["n_b2"], size=size_d, **abby_kw)
    q = (jnp.dot(qn_in.astype(dt), wq["proj_w"],
                 preferred_element_type=jnp.float32)
         + wq["proj_b"].astype(jnp.float32))
    q = q * (hd ** -0.25)
    # tpu.iota is integer-only — build the position column as i32
    t = jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0).astype(jnp.float32)
    f = t * freqs_ref[:].astype(jnp.float32)       # (T, D) tiled ladder
    m = _safe_row_norm(x.astype(jnp.float32))
    even = jax.lax.broadcasted_iota(jnp.int32, (1, D), 1) % 2 == 0
    return _rotate(q, m, jnp.cos(f), jnp.sin(f), even)


def _head_norm_heads(q, *, head: int, hd: int, wh, size_h: int,
                     abby_kw: dict, dt):
    """Per-head AbbyNormal over lane-aligned (T, hd) slices."""
    outs = []
    for h in range(head):
        qh = q[:, h * hd:(h + 1) * hd].astype(dt)
        outs.append(abby_full_compute(qh, wh["n_w1"], wh["n_b1"],
                                      wh["n_w2"], wh["n_b2"],
                                      size=size_h, **abby_kw))
    return outs                                    # list of (T, hd) f32


def _attend(qhn, khn, vh, *, hd: int, causal: bool, valid_row, dt):
    """Masked softmax attention for one head: (T,hd)x(Tk,hd)->(T,hd)."""
    T = qhn.shape[0]
    Tk = khn.shape[0]
    logits = jax.lax.dot_general(
        qhn.astype(dt), khn.astype(dt), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * (1.0 / (hd ** 0.5))
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, (T, Tk), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (T, Tk), 1)
        logits = jnp.where(col <= row + (Tk - T), logits, NEG_INF)
    if valid_row is not None:
        logits = jnp.where(valid_row > 0, logits, NEG_INF)
    w = jax.nn.softmax(logits, axis=-1)
    return jax.lax.dot_general(
        w.astype(dt), vh.astype(dt), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)        # (T, hd)


def _out_proj(heads, wo, out_ref, dt):
    o = jnp.concatenate(heads, axis=-1).astype(dt)  # (T, D)
    out = (jnp.dot(o, wo["proj_w"], preferred_element_type=jnp.float32)
           + wo["proj_b"].astype(jnp.float32))
    out_ref[0] = out.astype(out_ref.dtype)


def _cached_kernel(x_ref, kn_ref, v_ref, valid_ref, freqs_ref,
                   qn_w1, qn_b1, qn_w2, qn_b2, qp_w, qp_b,
                   hn_w1, hn_b1, hn_w2, hn_b2, op_w, op_b,
                   out_ref, *, head: int, size_d: int, size_h: int,
                   abby_kw: dict, has_mask: bool):
    x = x_ref[0]                                   # (T, D)
    D = x.shape[1]
    hd = D // head
    dt = x.dtype
    wq = {"n_w1": qn_w1[:], "n_b1": qn_b1[:], "n_w2": qn_w2[:],
          "n_b2": qn_b2[:], "proj_w": qp_w[:], "proj_b": qp_b[:]}
    wh = {"n_w1": hn_w1[:], "n_b1": hn_b1[:], "n_w2": hn_w2[:],
          "n_b2": hn_b2[:]}
    q = _q_side(x, freqs_ref, wq=wq, size_d=size_d, size_h=size_h,
                hd=hd, abby_kw=abby_kw, dt=dt)
    qhn = _head_norm_heads(q, head=head, hd=hd, wh=wh, size_h=size_h,
                           abby_kw=abby_kw, dt=dt)
    # mask comes sublane-padded (1, 8, Tk) — Mosaic requires the
    # second-to-last block dim to be 8-divisible; row 0 is the mask
    valid = valid_ref[0, 0:1] if has_mask else None    # (1, Tk) | None
    heads = []
    for h in range(head):
        kh = kn_ref[0, h]                          # (Tk, hd) processed
        vh = v_ref[0, h]
        heads.append(_attend(qhn[h], kh, vh, hd=hd, causal=False,
                             valid_row=valid, dt=dt))
    _out_proj(heads, {"proj_w": op_w[:], "proj_b": op_b[:]}, out_ref, dt)


def _full_kernel(x_ref, xa_ref, valid_ref, qfreqs_ref, kfreqs_ref,
                 qn_w1, qn_b1, qn_w2, qn_b2, qp_w, qp_b,
                 kn_w1, kn_b1, kn_w2, kn_b2, kp_w, kp_b,
                 hn_w1, hn_b1, hn_w2, hn_b2, op_w, op_b,
                 out_ref, *, head: int, size_d: int, size_h: int,
                 abby_kw: dict, causal: bool, has_mask: bool):
    x = x_ref[0]                                   # (T, D)
    xa = xa_ref[0]                                 # (Ta, D)
    D = x.shape[1]
    hd = D // head
    dt = x.dtype
    wq = {"n_w1": qn_w1[:], "n_b1": qn_b1[:], "n_w2": qn_w2[:],
          "n_b2": qn_b2[:], "proj_w": qp_w[:], "proj_b": qp_b[:]}
    wh = {"n_w1": hn_w1[:], "n_b1": hn_b1[:], "n_w2": hn_w2[:],
          "n_b2": hn_b2[:]}
    q = _q_side(x, qfreqs_ref, wq=wq, size_d=size_d, size_h=size_h,
                hd=hd, abby_kw=abby_kw, dt=dt)
    qhn = _head_norm_heads(q, head=head, hd=hd, wh=wh, size_h=size_h,
                           abby_kw=abby_kw, dt=dt)

    # kv side: AbbyNormal kv_norm -> kv_proj -> split -> scale+rotary
    # on k (cond=xa) -> per-head norm; v stays raw (attention.py:_kv)
    Ta = xa.shape[0]
    kvn_in = abby_full_compute(xa, kn_w1[:], kn_b1[:], kn_w2[:],
                               kn_b2[:], size=size_d, **abby_kw)
    kv = (jnp.dot(kvn_in.astype(dt), kp_w[:],
                  preferred_element_type=jnp.float32)
          + kp_b[:].astype(jnp.float32))           # (Ta, 2D)
    k, v = kv[:, :D], kv[:, D:]
    k = k * (hd ** -0.25)
    t = jax.lax.broadcasted_iota(jnp.int32, (Ta, 1), 0).astype(jnp.float32)
    f = t * kfreqs_ref[:].astype(jnp.float32)
    m = _safe_row_norm(xa.astype(jnp.float32))
    even = jax.lax.broadcasted_iota(jnp.int32, (1, D), 1) % 2 == 0
    k = _rotate(k, m, jnp.cos(f), jnp.sin(f), even)
    khn = _head_norm_heads(k, head=head, hd=hd, wh=wh, size_h=size_h,
                           abby_kw=abby_kw, dt=dt)

    valid = valid_ref[0, 0:1] if has_mask else None    # (see cached)
    heads = []
    for h in range(head):
        vh = v[:, h * hd:(h + 1) * hd]
        heads.append(_attend(qhn[h], khn[h], vh, hd=hd, causal=causal,
                             valid_row=valid, dt=dt))
    _out_proj(heads, {"proj_w": op_w[:], "proj_b": op_b[:]}, out_ref, dt)


def _row(b):
    """(features,) bias -> (1, features) VMEM row."""
    return b.reshape(1, -1)


def _wspecs(shapes):
    return [pl.BlockSpec(s, lambda i, n=len(s): (0,) * n,
                         memory_space=pltpu.VMEM) for s in shapes]


@functools.partial(
    jax.jit, static_argnames=("head", "size_d", "size_h", "alpha", "k",
                              "beta", "interpret"))
def fused_attn_cached(x, kn, v, kv_valid, freqs_rep, wq, wh, wo,
                      head: int, size_d: int, size_h: int,
                      alpha: float, k: float, beta: float,
                      interpret: bool = False):
    """One dispatch per batch row for a cached-KV cross-attention call.

    ``x`` (B, T, D); ``kn``/``v`` (B, H, Tk, hd) — the per-utterance
    processed K/V cache (attention.py:precompute_kv); ``kv_valid``
    (B, Tk) f32 0/1 or None; ``freqs_rep`` (1, D) tiled ladder
    (``tiled_freqs``); ``wq``/``wh``/``wo``: weight dicts (see
    models/attention.py call site).  Returns (B, T, D) in x.dtype."""
    B, T, D = x.shape
    Tk = kn.shape[2]
    hd = D // head
    has_mask = kv_valid is not None
    abby_kw = dict(alpha=float(alpha), k=float(k), beta=float(beta))
    kernel = functools.partial(_cached_kernel, head=head, size_d=size_d,
                               size_h=size_h, abby_kw=abby_kw,
                               has_mask=has_mask)
    # sublane-pad the mask to (B, 8, Tk): Mosaic requires the block's
    # second-to-last dim to be 8-divisible (or equal the array dim)
    if has_mask:
        kv_valid = jnp.broadcast_to(
            kv_valid.astype(jnp.float32)[:, None, :], (B, 8, Tk))
    else:
        kv_valid = jnp.ones((B, 8, 8), jnp.float32)    # placeholder
    Tv = kv_valid.shape[2]
    operands = [
        x, kn, v, kv_valid, freqs_rep,
        wq["n_w1"], _row(wq["n_b1"]), wq["n_w2"], _row(wq["n_b2"]),
        wq["proj_w"], _row(wq["proj_b"]),
        wh["n_w1"], _row(wh["n_b1"]), wh["n_w2"], _row(wh["n_b2"]),
        wo["proj_w"], _row(wo["proj_b"]),
    ]
    in_specs = [
        pl.BlockSpec((1, T, D), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, head, Tk, hd), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, head, Tk, hd), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 8, Tv), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ] + _wspecs([(D, D), (1, D), (D, 3), (1, 3), (D, D), (1, D),
                 (hd, hd), (1, hd), (hd, 3), (1, 3), (D, D), (1, D)])
    return pl.pallas_call(
        kernel,
        grid=(B,),
        out_shape=jax.ShapeDtypeStruct((B, T, D), x.dtype),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, T, D), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*operands)


@functools.partial(
    jax.jit, static_argnames=("head", "size_d", "size_h", "alpha", "k",
                              "beta", "causal", "interpret"))
def fused_attn_full(x, xa, kv_valid, qfreqs_rep, kfreqs_rep,
                    wq, wkv, wh, wo, head: int, size_d: int,
                    size_h: int, alpha: float, k: float, beta: float,
                    causal: bool, interpret: bool = False):
    """One dispatch per batch row for a FULL attention call (kv side
    computed from ``xa``; pass xa=x for self-attention).  Shapes as in
    fused_attn_cached plus ``xa`` (B, Ta, D) and ``wkv`` (kv_norm +
    kv_proj weights)."""
    B, T, D = x.shape
    Ta = xa.shape[1]
    hd = D // head
    has_mask = kv_valid is not None
    abby_kw = dict(alpha=float(alpha), k=float(k), beta=float(beta))
    kernel = functools.partial(_full_kernel, head=head, size_d=size_d,
                               size_h=size_h, abby_kw=abby_kw,
                               causal=causal, has_mask=has_mask)
    # sublane-pad the mask (see fused_attn_cached)
    if has_mask:
        kv_valid = jnp.broadcast_to(
            kv_valid.astype(jnp.float32)[:, None, :], (B, 8, Ta))
    else:
        kv_valid = jnp.ones((B, 8, 8), jnp.float32)
    Tv = kv_valid.shape[2]
    operands = [
        x, xa, kv_valid, qfreqs_rep, kfreqs_rep,
        wq["n_w1"], _row(wq["n_b1"]), wq["n_w2"], _row(wq["n_b2"]),
        wq["proj_w"], _row(wq["proj_b"]),
        wkv["n_w1"], _row(wkv["n_b1"]), wkv["n_w2"], _row(wkv["n_b2"]),
        wkv["proj_w"], _row(wkv["proj_b"]),
        wh["n_w1"], _row(wh["n_b1"]), wh["n_w2"], _row(wh["n_b2"]),
        wo["proj_w"], _row(wo["proj_b"]),
    ]
    in_specs = [
        pl.BlockSpec((1, T, D), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Ta, D), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 8, Tv), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ] + _wspecs([(D, D), (1, D), (D, 3), (1, 3), (D, D), (1, D),
                 (D, D), (1, D), (D, 3), (1, 3), (D, 2 * D), (1, 2 * D),
                 (hd, hd), (1, hd), (hd, 3), (1, 3), (D, D), (1, D)])
    return pl.pallas_call(
        kernel,
        grid=(B,),
        out_shape=jax.ShapeDtypeStruct((B, T, D), x.dtype),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, T, D), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*operands)
