"""Multi-head attention with per-component norms and signal-adaptive
rotary.

Parity target: ``attention`` model.py:234-317.

* q/kv projections each behind an ``n_type`` norm; einops-style head
  split (model.py:242-245).
* scale ``(dims//head)**-0.25`` applied to BOTH q and k before rotary
  (model.py:239,303-304); the softmax then applies the standard
  ``1/sqrt(head_dim)`` (torch SDPA internal scale) — total ``hd^-1``
  times the rotary magnitudes.
* rotary applied to q conditioned on the query source and to k
  conditioned on the kv source (model.py:306), then per-head-dim norms
  ``n.ln`` on q and k (model.py:307).
* self-attention when ``xa is None``; cross-attention reads k/v from
  ``xa`` (model.py:261).  Causality follows the reference's
  ``is_causal=have(mask)`` convention: the caller passes ``causal``.
* ``modal=True`` adds the bidirectional x<->xa path through a 1x1
  head-mixing conv (model.py:309-315).

Reference paths that are latent/broken upstream are reproduced as
*working* implementations of their documented intent, off by default:
``pitch_bias`` (RBF-scored attention, model.py:264-283 references
undefined attributes upstream) and the pitch-context triangle scoring
``pt`` (model.py:285-299 has a shape bug and a shadowed variable) —
here the triangle score is a (B,H,Tq,Tk) additive bias on the logits.

TPU notes: masks are additive f32 logits biases; static shapes; the
decode path supplies a kv validity mask so a fixed-size buffer attends
only to the live prefix (numerics identical to the reference's
variable-length prefix).
"""

from __future__ import annotations

import math
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from asr_model_tpu.models import tlayers
from asr_model_tpu.models.registry import get_norm
from asr_model_tpu.models.rotary import Rotary
from asr_model_tpu.utils import default_platform

NEG_INF = -1e30


def _split_heads(x: jnp.ndarray, head: int) -> jnp.ndarray:
    b, t, d = x.shape
    return x.reshape(b, t, head, d // head).transpose(0, 2, 1, 3)


def _merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    b, h, t, hd = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, t, h * hd)


def taylor_softmax(x: jnp.ndarray, order: int = 2) -> jnp.ndarray:
    """Taylor-series softmax surrogate (parity: model.py:251-256, which
    the reference defines but never calls): 1 + sum_i x^i/i!, normalized
    over the last axis."""
    ta = jnp.ones_like(x)
    for i in range(1, order + 1):
        ta = ta + x ** i / float(math.factorial(i))
    return ta / jnp.sum(ta, axis=-1, keepdims=True)


def rbf_scores(q: jnp.ndarray, k: jnp.ndarray, rbf_sigma: float = 1.0,
               rbf_ratio: float = 0.3) -> jnp.ndarray:
    """Blended dot-product + RBF attention logits (working
    implementation of the reference's dead ``pitch_bias`` path,
    model.py:264-283, which references undefined attributes upstream):
    (1-r) * q.k^T + r * exp(-||q-k||^2 / (2 sigma^2))."""
    dot = jnp.einsum("bhqd,bhkd->bhqk", q, k)
    q2 = jnp.sum(q * q, axis=-1)[..., :, None]
    k2 = jnp.sum(k * k, axis=-1)[..., None, :]
    d2 = q2 + k2 - 2 * dot
    rbf = jnp.exp(-d2 / (2 * rbf_sigma ** 2))
    return (1 - rbf_ratio) * dot + rbf_ratio * rbf


# Pallas flash-attention routing: "auto" routes tile-friendly shapes on
# TPU to ops/pallas/attention_kernel.flash_attention; "on" forces it
# (interpret mode off-TPU, for tests); "off" disables.
FLASH = "auto"

# Fused whole-call decode attention (ops/pallas/xattn_kernel).
# Default "off" — MEASURED regression on the headline decode (bench.py
# B=8: 396.9x -> 363.4x with the whole-call kernels engaged): the
# kernel serializes the per-batch/per-head attention matmuls that XLA
# runs as one batched contraction, and its f32 internal windows cost
# more VPU time than the dispatches it saves.  "on" forces (interpret
# off-TPU — how the parity tests run it); "auto" routes eligible
# eval-mode calls on TPU.
_PALLAS_XATTN = os.environ.get("PALLAS_XATTN", "off").lower()

# below these, the (Tq, Tk) score tile fits comfortably and the plain
# XLA path (one fused softmax) is faster than paying kernel dispatch
_FLASH_MIN_TQ = 128
_FLASH_MIN_TK = 128


def _sdpa_xla(q, k, v, causal, kv_valid, bias, scale):
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    if bias is not None:
        logits = logits + bias
    if causal:
        tq, tk = logits.shape[-2], logits.shape[-1]
        cm = jnp.tril(jnp.ones((tq, tk), bool), k=tk - tq)
        logits = jnp.where(cm[None, None], logits, NEG_INF)
    if kv_valid is not None:
        logits = jnp.where(kv_valid[:, None, None, :], logits, NEG_INF)
    w = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", w, v)


def _flash_eligible(q, k, bias) -> bool:
    if FLASH == "off" or bias is not None:
        return False
    if q.shape[-1] % 128 != 0:         # head_dim must fill the lanes
        return False
    if q.shape[2] < _FLASH_MIN_TQ or k.shape[2] < _FLASH_MIN_TK:
        return False
    return FLASH == "on" or default_platform() == "tpu"


def _sdpa_flash(q, k, v, causal, kv_valid, scale):
    """Flash kernel forward; backward recomputes through the XLA math
    (the kernel defines no VJP — the backward materializes the score
    matrix like the plain path, while the forward stays fused)."""
    from asr_model_tpu.ops.pallas.attention_kernel import flash_attention

    @jax.custom_vjp
    def f(q, k, v):
        return flash_attention(q, k, v, causal=causal, kv_valid=kv_valid,
                               scale=scale)

    def fwd(q, k, v):
        return f(q, k, v), (q, k, v)

    def bwd(res, g):
        q, k, v = res
        _, vjp = jax.vjp(
            lambda q_, k_, v_: _sdpa_xla(q_, k_, v_, causal, kv_valid,
                                         None, scale), q, k, v)
        return vjp(g)

    f.defvjp(fwd, bwd)
    return f(q, k, v)


def sdpa(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
         causal: bool = False,
         kv_valid: Optional[jnp.ndarray] = None,
         bias: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Scaled dot-product attention over (B,H,T,hd) with the torch-SDPA
    internal scale 1/sqrt(head_dim).  ``kv_valid``: (B, Tk) bool.

    On TPU, tile-friendly shapes (head_dim a lane multiple, long enough
    Tq/Tk — the long-form encoder case) route to the fused Pallas flash
    kernel; everything else takes the plain XLA path."""
    hd = q.shape[-1]
    scale = 1.0 / math.sqrt(hd)
    if _flash_eligible(q, k, bias):
        return _sdpa_flash(q, k, v, causal, kv_valid, scale)
    return _sdpa_xla(q, k, v, causal, kv_valid, bias, scale)


class Attention(nn.Module):
    dims: int
    head: int
    layer: int
    n_type: Optional[str] = None
    modal: bool = False

    def setup(self):
        d, h = self.dims, self.head
        self.q_norm = get_norm(self.n_type, d)
        self.q_proj = tlayers.Dense(d, d, name="q_proj")
        self.kv_norm = get_norm(self.n_type, d)
        self.kv_proj = tlayers.Dense(2 * d, d, name="kv_proj")
        self.c_norm = get_norm(self.n_type, d)
        self.c_proj = tlayers.Dense(d, d, name="c_proj")
        self.out_proj = tlayers.Dense(d, d, name="out_proj")
        self.head_norm = get_norm(self.n_type, d // h)
        self.rot = Rotary(d, h)
        if self.modal:
            # 1x1 Conv2d over the head axis == head-mixing matrix
            self.head_mix = self.param(
                "head_mix", tlayers.torch_kernel_init(), (h, h))

    # ---- fused whole-call decode kernel plumbing (xattn_kernel) ----

    def _abby_size(self, d: int) -> int:
        return max(3, int(d * 0.05)) | 1          # odd, >= 3 (norms.py)

    def _fused_call_eligible(self, x, kv_elems_per_row: int,
                             kv_limit: int) -> bool:
        """Gate for the whole-call fused kernels: eval only (no gumbel
        rng — the same proxy the AbbyNormal gate uses; init runs the
        XLA path so every param is created), AbbyNormal norms,
        lane-aligned dims AND head_dim (the in-kernel window rolls),
        decode-prefix x sizes (encoder-length calls measured faster on
        XLA — the norms.py gate rationale), bounded per-row KV VMEM
        (``kv_limit``: the cached variant holds only processed K/V +
        the score row, the full variant materializes the whole kv-side
        chain in VMEM, so its bound is much tighter)."""
        from asr_model_tpu.models.norms import AbbyNormal

        if _PALLAS_XATTN == "off":
            return False
        if _PALLAS_XATTN != "on" and default_platform() != "tpu":
            return False
        if self.is_initializing() or self.has_rng("gumbel"):
            return False
        d = self.dims
        hd = d // self.head
        if d % 128 != 0 or hd % 128 != 0:
            return False
        if not isinstance(self.q_norm, AbbyNormal):
            return False
        if x.dtype not in (jnp.bfloat16, jnp.float32):
            return False
        if x.size > 400_000 or kv_elems_per_row > kv_limit:
            return False
        return True

    # cached: processed K/V tiles + one score row live in VMEM
    _KV_LIMIT_CACHED = 4096 * 512
    # full: the whole kv-side chain (abby + 2D-wide projection +
    # per-head norms) materializes in VMEM -> decode-prefix sources only
    _KV_LIMIT_FULL = 256 * 512

    def _norm_w(self, mod, dt):
        p = mod.variables["params"]
        return {"n_w1": p["router_in"]["kernel"].astype(dt),
                "n_b1": p["router_in"]["bias"].astype(dt),
                "n_w2": p["router_out"]["kernel"].astype(dt),
                "n_b2": p["router_out"]["bias"].astype(dt)}

    def _proj_w(self, mod, dt):
        p = mod.variables["params"]
        return {"proj_w": p["kernel"].astype(dt),
                "proj_b": p["bias"].astype(dt)}

    def _fused_freqs(self, causal: bool):
        from asr_model_tpu.models.rotary import compute_freqs
        from asr_model_tpu.ops.pallas.xattn_kernel import tiled_freqs
        return jnp.asarray(tiled_freqs(
            compute_freqs(self.dims, self.head, causal), self.head))

    def _fused_cached(self, x, kn, v, kv_valid):
        from asr_model_tpu.ops.pallas.xattn_kernel import fused_attn_cached

        dt = x.dtype
        n = self.q_norm
        return fused_attn_cached(
            x, kn.astype(dt), v.astype(dt), kv_valid,
            self._fused_freqs(causal=False),
            self._norm_w(self.q_norm, dt) | self._proj_w(self.q_proj, dt),
            self._norm_w(self.head_norm, dt),
            self._proj_w(self.out_proj, dt),
            head=self.head, size_d=self._abby_size(self.dims),
            size_h=self._abby_size(self.dims // self.head),
            alpha=n.alpha, k=n.k, beta=n.beta,
            interpret=default_platform() != "tpu")

    def _fused_full(self, x, xa, kv_valid, causal: bool):
        from asr_model_tpu.ops.pallas.xattn_kernel import fused_attn_full

        dt = x.dtype
        n = self.q_norm
        return fused_attn_full(
            x, xa.astype(dt), kv_valid,
            self._fused_freqs(causal), self._fused_freqs(causal),
            self._norm_w(self.q_norm, dt) | self._proj_w(self.q_proj, dt),
            self._norm_w(self.kv_norm, dt) | self._proj_w(self.kv_proj, dt),
            self._norm_w(self.head_norm, dt),
            self._proj_w(self.out_proj, dt),
            head=self.head, size_d=self._abby_size(self.dims),
            size_h=self._abby_size(self.dims // self.head),
            alpha=n.alpha, k=n.k, beta=n.beta, causal=causal,
            interpret=default_platform() != "tpu")

    def _q(self, x):
        return _split_heads(self.q_proj(self.q_norm(x)), self.head)

    def _kv(self, x):
        kv = self.kv_proj(self.kv_norm(x))
        k, v = jnp.split(kv, 2, axis=-1)
        return (_split_heads(k, self.head), _split_heads(v, self.head))

    def _mix(self, x):
        if not self.modal:
            return x
        return jnp.einsum("gh,bhtd->bgtd", self.head_mix, x)

    def precompute_kv(self, xa: jnp.ndarray):
        """Fully-processed cross-attention K/V for a FIXED source: the
        kv projection, (dims/head)^-0.25 scaling, signal-adaptive rotary
        (conditioned on the source itself, the non-causal ladder) and
        the per-head norm are all source-only — precompute once per
        utterance so the decode loop only computes the q side
        (this removes the dominant per-step FLOPs; SURVEY §3.3)."""
        scale = (self.dims // self.head) ** -0.25
        k, v = self._kv(xa)
        k = k * scale
        k = self.rot(k, cond=xa, causal=False)
        return self.head_norm(k), v

    # ---- incremental (one-position) pieces for the streaming decode
    # (models/generate.py:greedy_decode_stream).  Numerics match the
    # buffer path exactly: same projection -> scale -> rotary (with the
    # position offset) -> per-head norm order; ``v`` stays raw.

    def q_step(self, x_t: jnp.ndarray, pos, causal: bool) -> jnp.ndarray:
        """(B, 1, D) -> normalized rotated query heads (B, H, 1, hd)."""
        scale = (self.dims // self.head) ** -0.25
        q = self._q(x_t) * scale
        q = self.rot(q, cond=x_t, causal=causal, offset=pos)
        return self.head_norm(q)

    def kv_step(self, src_t: jnp.ndarray, pos, causal: bool):
        """(B, 1, D) -> (normalized rotated key (B,H,1,hd), value)."""
        scale = (self.dims // self.head) ** -0.25
        k, v = self._kv(src_t)
        k = self.rot(k * scale, cond=src_t, causal=causal, offset=pos)
        return self.head_norm(k), v

    def attend_cached(self, qn, kn, v, kv_valid=None) -> jnp.ndarray:
        """Attention over an already-processed K/V buffer + output
        projection (the incremental counterpart of the cached_kv branch
        of __call__, without the SP routing)."""
        a = sdpa(qn, kn, v, causal=False, kv_valid=kv_valid)
        return self.out_proj(_merge_heads(a))

    def __call__(self, x: jnp.ndarray, xa: Optional[jnp.ndarray] = None,
                 causal: bool = False, pt: Optional[jnp.ndarray] = None,
                 window: int = 3,
                 kv_valid: Optional[jnp.ndarray] = None,
                 return_modal: bool = False,
                 cached_kv=None):
        scale = (self.dims // self.head) ** -0.25
        if cached_kv is not None:
            kn, v = cached_kv
            # long-form SP: inside a parallel.seq.seq_sharding context
            # the per-step cross-attention over the (long) cached KV
            # runs as a distributed online-softmax over the 'seq' axis
            from asr_model_tpu.parallel.seq import (active_seq_sharding,
                                                    seq_sharded_attention)
            ctx = active_seq_sharding()
            if ctx is None and self._fused_call_eligible(
                    x, kn.shape[1] * kn.shape[2] * kn.shape[3],
                    self._KV_LIMIT_CACHED):
                return self._fused_cached(x, kn, v, kv_valid)
            q = self._q(x) * scale
            q = self.rot(q, cond=x, causal=False)
            qn = self.head_norm(q)
            if ctx is not None:
                mesh, ax = ctx
                a = seq_sharded_attention(qn, kn, v, mesh=mesh, axis=ax,
                                          kv_valid=kv_valid)
            else:
                a = sdpa(qn, kn, v, causal=False, kv_valid=kv_valid)
            return self.out_proj(_merge_heads(a))
        kv_src = xa if xa is not None else x
        if pt is None and not (self.modal and return_modal) \
                and self._fused_call_eligible(
                    x, kv_src.shape[1] * self.dims, self._KV_LIMIT_FULL):
            from asr_model_tpu.parallel.seq import active_seq_sharding
            if active_seq_sharding() is None:
                return self._fused_full(x, kv_src, kv_valid, causal)
        k, v = self._kv(kv_src)
        q = self._q(x)

        bias = None
        if pt is not None:
            # triangle pitch-context scoring (documented intent of
            # model.py:285-299): t[i,j] = sum_{w in window(i,j)}
            # <q_i * k_j, c_w>, added as an attention-logits bias.
            c = _split_heads(self.c_proj(self.c_norm(pt)), self.head)
            qk = jnp.einsum("bhid,bhjd->bhijd", q * scale, k * scale)
            tq, tk, tc = q.shape[2], k.shape[2], c.shape[2]
            pos = jnp.arange(tc)
            lo = jnp.maximum(0, jnp.minimum(jnp.arange(tq)[:, None],
                                            jnp.arange(tk)[None, :]) - window)
            hi = jnp.minimum(tc, jnp.maximum(jnp.arange(tq)[:, None],
                                             jnp.arange(tk)[None, :]) + window)
            wmask = ((pos[None, None, :] >= lo[..., None])
                     & (pos[None, None, :] < hi[..., None]))
            csum = jnp.einsum("bhijd,bhwd,ijw->bhij", qk, c,
                              wmask.astype(q.dtype))
            bias = csum

        q = q * scale
        k = k * scale
        q = self.rot(q, cond=x if pt is None else pt, causal=causal)
        k = self.rot(k, cond=kv_src, causal=causal)
        qn = self.head_norm(q)
        kn = self.head_norm(k)
        a = sdpa(qn, kn, v, causal=causal, kv_valid=kv_valid, bias=bias)
        out = self.out_proj(_merge_heads(a))

        if self.modal and xa is not None and return_modal:
            ka, va = self._kv(x)
            kb, vb = self._kv(xa)
            qa, qb = self._q(x), self._q(xa)
            qa = self.rot(qa, cond=x, causal=causal)
            qb = self.rot(qb, cond=xa, causal=causal)
            ka = self.rot(ka, cond=x, causal=causal)
            kb = self.rot(kb, cond=xa, causal=causal)
            b = sdpa(self.head_norm(qa), self.head_norm(kb), vb, causal=causal)
            c2 = sdpa(self.head_norm(qb), self.head_norm(ka), va, causal=causal)
            return (out, self.out_proj(_merge_heads(self._mix(b))),
                    self.out_proj(_merge_heads(self._mix(c2))))
        return out
