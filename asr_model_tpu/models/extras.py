"""Latent/auxiliary attention modules from the reference, implemented
working.

Parity targets (all latent in the default config but part of the API
surface, SURVEY §2.2): curiosity essentials.py:1118-1151 (dual-source
attention with per-head sigmoid-gated blend), create_attention_mask
essentials.py:1153-1162, calculate_attention essentials.py:1182-1204
(SDPA with temperature), AdaptiveSpan essentials.py:1219-1280
(learnable-span truncated attention with temperature sharpening),
MyelinatedLayer essentials.py:1282-1390 (the older adaptive-depth
ancestor of MSheath: node-importance predictors + stochastic jumps —
implemented as a fixed-length masked scan like MSheath, without the
debug prints).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from asr_model_tpu.models import tlayers
from asr_model_tpu.models.attention import NEG_INF, sdpa


def create_attention_mask(batch_size: int, ctx: int, is_causal: bool = True,
                          padding_mask: Optional[jnp.ndarray] = None):
    """(B, 1, T, T) bool mask; True = masked out (parity with
    essentials.py:1153-1162)."""
    if is_causal:
        m = jnp.triu(jnp.ones((ctx, ctx), bool), k=1)
        mask = jnp.broadcast_to(m[None, None], (batch_size, 1, ctx, ctx))
    else:
        mask = jnp.zeros((batch_size, 1, ctx, ctx), bool)
    if padding_mask is not None:
        pm = padding_mask[:, None, None, :].astype(bool)
        mask = mask | ~pm
    return mask


def calculate_attention(q, k, v, mask=None, temperature: float = 1.0,
                        is_causal: bool = True):
    """SDPA with q-temperature scaling (essentials.py:1196-1203):
    q *= (1/T)^0.5 then standard softmax attention.  Returns
    (B, Tq, H*hd) like the reference's flatten."""
    if temperature != 1.0 and temperature > 0:
        q = q * (1.0 / temperature) ** 0.5
    hd = q.shape[-1]
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) / math.sqrt(hd)
    if mask is not None:
        logits = jnp.where(mask, NEG_INF, logits)
        is_causal = False
    if is_causal:
        tq, tk = logits.shape[-2], logits.shape[-1]
        cm = jnp.tril(jnp.ones((tq, tk), bool), k=tk - tq)
        logits = jnp.where(cm[None, None], logits, NEG_INF)
    w = jax.nn.softmax(logits, axis=-1)
    a = jnp.einsum("bhqk,bhkd->bhqd", w, v)
    b, h, t, d = a.shape
    return a.transpose(0, 2, 1, 3).reshape(b, t, h * d), w


class Curiosity(nn.Module):
    """Dual-source attention: per-head sigmoid-gated blend of
    self-attention and aux-source attention (essentials.py:1118-1151)."""

    d: int
    h: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, xa, mask=None):
        dh = self.d // self.h

        def split(t):
            b, n, _ = t.shape
            return t.reshape(b, n, self.h, dh).transpose(0, 2, 1, 3)

        qkv = tlayers.Dense(self.d * 3, self.d, use_bias=self.use_bias,
                            name="qkv")(x)
        qkv_aux = tlayers.Dense(self.d * 3, self.d, use_bias=self.use_bias,
                                name="qkv_aux")(xa)
        q, k, v = map(split, jnp.split(qkv, 3, -1))
        qa, ka, va = map(split, jnp.split(qkv_aux, 3, -1))

        dots = jnp.einsum("bhqd,bhkd->bhqk", q, k) / dh ** 0.5
        dots_aux = jnp.einsum("bhqd,bhkd->bhqk", q, ka) / dh ** 0.5
        if mask is not None:
            dots = jnp.where(mask, -9e15, dots)
        p = jax.nn.softmax(dots, -1)
        pa = jax.nn.softmax(dots_aux, -1)
        h_main = jnp.einsum("bhqk,bhkd->bhqd", p, v)
        h_aux = jnp.einsum("bhqk,bhkd->bhqd", pa, va)
        g = nn.sigmoid(self.param("g", nn.initializers.zeros, (self.h,)))
        g = g.reshape(1, -1, 1, 1)
        out = h_main * (1 - g) + h_aux * g
        b, hh, t, dd = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, t, hh * dd)
        return tlayers.Dense(self.d, self.d, use_bias=self.use_bias,
                             name="o")(out)


class AdaptiveSpan(nn.Module):
    """Learnable-span attention (essentials.py:1219-1280): truncate
    q/k/v to span_scale * max_span (bounded by max_dist), sharpen the
    temperature as the span shrinks.

    The span length is data-independent (a learned scalar), so under
    jit it is resolved at trace time from the parameter's initial
    value unless ``span_len`` is passed explicitly — pass it when
    training the span end-to-end (the reference reads it with
    ``.item()``, essentials.py:1254, which is equally untraceable)."""

    dims: int
    head: int
    max_dist: int = 512
    sharpen: bool = True
    temp_scale: float = 0.01

    @nn.compact
    def __call__(self, x, span_len: Optional[int] = None):
        span_scale = self.param("span_scale", nn.initializers.ones, ())
        b, ctx = x.shape[:2]
        hd = self.dims // self.head
        if span_len is None:
            span_len = min(int(ctx * 1.0), ctx)
        eff = min(span_len, self.max_dist, ctx)
        if eff == 0:
            return jnp.zeros((b, 0, self.dims), x.dtype), None
        xs = x[:, :eff]
        q = xs.reshape(b, eff, self.head, hd).transpose(0, 2, 1, 3)
        k, v = q, q
        span_mean = span_scale
        temperature = jnp.where(
            self.sharpen, 1.0 + self.temp_scale * (1.0 - span_mean),
            0.5 + self.temp_scale * span_mean)
        qt = q * (1.0 / jnp.maximum(temperature, 1e-6)) ** 0.5
        out, w = calculate_attention(qt, k, v, None, 1.0, is_causal=True)
        return out, w


class MyelinatedLayer(nn.Module):
    """Adaptive-depth stack with per-layer node-importance gating
    (essentials.py:1282-1390) — the MSheath ancestor.  Rebuilt as a
    fixed-length masked scan: per slot, a node-importance predictor
    gates a self-attention update; a policy net drives stochastic layer
    jumps; working memory is an EMA of the pooled state."""

    dims: int
    head: int
    layerA: int = 3
    sparsity_threshold: float = 0.1
    max_dist: int = 512

    def setup(self):
        d, L = self.dims, self.layerA
        kinit = tlayers.torch_kernel_init()
        self.imp_ln_scale = self.param("imp_ln_scale",
                                       nn.initializers.ones, (L, d))
        self.imp_ln_bias = self.param("imp_ln_bias",
                                      nn.initializers.zeros, (L, d))
        self.imp_w = self.param("imp_w", kinit, (L, d, 1))
        self.imp_b = self.param("imp_b", tlayers.torch_bias_init(d), (L, 1))
        self.ln_scale = self.param("ln_scale", nn.initializers.ones, (L, d))
        self.ln_bias = self.param("ln_bias", nn.initializers.zeros, (L, d))
        self.gate_w = self.param("gate_w", kinit, (L, d, 1))
        self.gate_b = self.param("gate_b", tlayers.torch_bias_init(d), (L, 1))
        n_ad = (L + 1) // 2
        self.adapt_w = self.param("adapt_w", kinit, (n_ad, d, d))
        self.adapt_b = self.param("adapt_b", tlayers.torch_bias_init(d),
                                  (n_ad, d))
        self.policy1 = tlayers.Dense(128, d, name="policy1")
        self.policy2 = tlayers.Dense(3, 128, name="policy2")
        self.jump_weights = self.param(
            "jump_weights", lambda k, s: jnp.asarray([0.1, 0.05, 0.01]), (3,))
        self.mlp1 = tlayers.Dense(d * 4, d, name="mlp1")
        self.mlp2 = tlayers.Dense(d, d * 4, name="mlp2")
        self.mlp_gate_w = self.param("mlp_gate_w", kinit, (d, 1))
        self.mlp_gate_b = self.param("mlp_gate_b",
                                     tlayers.torch_bias_init(d), (1,))
        self.mlp_ln_scale = self.param("mlp_ln_scale",
                                       nn.initializers.ones, (d,))
        self.mlp_ln_bias = self.param("mlp_ln_bias",
                                      nn.initializers.zeros, (d,))
        self.working_memory = self.param("working_memory",
                                         nn.initializers.zeros, (1, 1, d))
        self.memgate_w = self.param("memgate_w", kinit, (d, 1))
        self.memgate_b = self.param("memgate_b",
                                    tlayers.torch_bias_init(d), (1,))

    def _ln(self, x, scale, bias, eps=1e-5):
        mu = jnp.mean(x, -1, keepdims=True)
        var = jnp.var(x, -1, keepdims=True)
        return (x - mu) * jax.lax.rsqrt(var + eps) * scale + bias

    def __call__(self, x, mask=None):
        L = self.layerA
        b, ctx, d = x.shape
        hd = d // self.head
        orig = x
        wm0 = jnp.broadcast_to(self.working_memory, (b, 1, d))
        pooled = x.mean(axis=1)
        policy = jax.nn.softmax(self.policy2(nn.relu(self.policy1(pooled))),
                                -1)
        if self.has_rng("jump"):
            keys = jax.random.split(self.make_rng("jump"), L)
        else:
            keys = None

        def body(carry, step):
            x, wm, i = carry
            active = i < L
            idx = jnp.minimum(i, L - 1)
            imp_in = self._ln(x, self.imp_ln_scale[idx],
                              self.imp_ln_bias[idx])
            importance = nn.sigmoid(imp_in @ self.imp_w[idx]
                                    + self.imp_b[idx])
            node = (importance > self.sparsity_threshold).astype(x.dtype)
            skip = (jnp.mean(importance) < 0.2) & (i > 0)

            norm_x = self._ln(x, self.ln_scale[idx], self.ln_bias[idx])
            q = norm_x.reshape(b, ctx, self.head, hd).transpose(0, 2, 1, 3)
            attn, _ = calculate_attention(q, q, q, None, 1.0,
                                          is_causal=True)
            a_idx = idx // 2
            adapted = attn @ self.adapt_w[a_idx] + self.adapt_b[a_idx]
            attn = jnp.where(idx % 2 == 0, adapted, attn)
            gate = nn.sigmoid(norm_x @ self.gate_w[idx] + self.gate_b[idx])
            strong = jnp.mean(importance) > 0.3
            x_upd = x + jnp.where(strong, gate * attn * node, 0.0)

            mem = x_upd.mean(axis=1, keepdims=True)
            mv = nn.sigmoid(mem @ self.memgate_w + self.memgate_b)
            wm_new = jnp.where(strong, mv * wm + (1 - mv) * mem, wm)

            if keys is not None:
                u = jax.random.uniform(keys[step], (b,))
            else:
                u = jnp.ones((b,))
            jump_prob = jnp.where(i < L - 1, policy[:, 1], 0.0)
            should_jump = jnp.any(u < jump_prob)
            jl = jnp.argmax(policy, axis=-1).max() + 1
            i_jump = jnp.minimum(i + jl, L - 1)
            sw = jnp.take(self.jump_weights, jnp.clip(jl - 1, 0, 2))
            x_jump = x_upd + sw * orig + (1 - sw) * wm_new
            x_next = jnp.where(should_jump, x_jump, x_upd)
            i_next = jnp.where(skip, i + 1,
                               jnp.where(should_jump, i_jump, i + 1))
            x_out = jnp.where(skip, x, x_next)

            x_c = jnp.where(active, x_out, x)
            wm_c = jnp.where(active, wm_new, wm)
            i_c = jnp.where(active, i_next, i)
            return (x_c, wm_c, i_c), i_c

        (x, wm, _), hist = jax.lax.scan(
            body, (x, wm0, jnp.asarray(0, jnp.int32)), jnp.arange(L))
        g = nn.sigmoid(x @ self.mlp_gate_w + self.mlp_gate_b)
        out = self.mlp2(nn.gelu(self.mlp1(
            self._ln(x, self.mlp_ln_scale, self.mlp_ln_bias)),
            approximate=False))
        return x + g * out
