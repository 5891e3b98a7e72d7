"""Gating and routing modules.

Parity targets: ``gate`` model.py:509-523 (top-k + soft mixture,
alpha-blended), ``tgate`` model.py:525-535 (soft mixture of sigmoid
gates weighted by a softmax classifier), ``router`` model.py:537-557
(modality router: stacked-input top-k hard + soft selection),
``OneShot`` model.py:216-232 (cross-modal attention-bias head whose
``scale`` is mutated by the training loop's grad-norm controller),
``MPNet`` model.py:375-385 (jump-policy network).
"""

from __future__ import annotations

import math
import os
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from asr_model_tpu.models import tlayers
from asr_model_tpu.utils import default_platform

# Fused identical-input Router (ops/pallas/router_kernel).  Default
# "off" — measured neutral-to-negative on the headline decode together
# with the MLP kernel (bench.py B=8: 411.3x -> 396.9x); see the
# PALLAS_MLP note in models/decoder.py.  "on" forces (interpret
# off-TPU — the parity tests); "auto" routes eligible eval-mode calls
# on TPU.
_PALLAS_ROUTER = os.environ.get("PALLAS_ROUTER", "off").lower()


def _topk_hard(scores: jnp.ndarray, num: int) -> jnp.ndarray:
    """scatter(softmax(top-k values)) at the top-k indices, zeros
    elsewhere (model.py:519-521,545-548)."""
    vals, idx = jax.lax.top_k(scores, num)
    soft_vals = jax.nn.softmax(vals, axis=-1)
    hot = jax.nn.one_hot(idx, scores.shape[-1], dtype=scores.dtype)
    return jnp.einsum("...k,...kn->...n", soft_vals, hot)


class Gate(nn.Module):
    """Top-k(2) + soft mixture over ``num_types`` sigmoid gates."""

    dims: int
    num_types: int

    @nn.compact
    def __call__(self, x, num: int = 2):
        d, nt = self.dims, self.num_types
        gates = jnp.stack(
            [nn.sigmoid(tlayers.Dense(d, d, name=f"gate{i}")(x))
             for i in range(nt)], axis=-1)                      # (..., d, nt)
        feats = jax.nn.softmax(tlayers.Dense(nt, d, name="features")(x), -1)
        top = tlayers.Dense(nt, d, name="top")(x)
        alpha = nn.sigmoid(self.param("alpha", nn.initializers.ones, (1,)))
        sel = alpha * _topk_hard(top, num) + (1 - alpha) * feats
        return jnp.sum(gates * sel[..., None, :], axis=-1)


class TGate(nn.Module):
    """Soft mixture of ``num_types`` sigmoid gates weighted by a
    softmax classifier (live inside the residual MLP, model.py:573)."""

    dims: int
    num_types: int = 2

    @nn.compact
    def __call__(self, x):
        d, nt = self.dims, self.num_types
        ga = jnp.stack(
            [nn.sigmoid(tlayers.Dense(d, d, name=f"ga{i}")(x))
             for i in range(nt)], axis=-1)                      # (..., d, nt)
        types = jax.nn.softmax(tlayers.Dense(nt, d, name="cs")(x), -1)
        return jnp.sum(ga * types[..., None, :], axis=-1)


class Router(nn.Module):
    """Modality router: stack inputs on a trailing axis, pick with
    alpha-blended top-k-hard + soft weights, weighted-sum."""

    dims: int
    num_types: int

    def _fused_eligible(self, modalities) -> bool:
        """One-dispatch kernel for the identical-input calls every
        decoder site makes (``router(*[x] * n)``): eval only (no
        gumbel rng — init runs the XLA path so the params exist),
        lane-aligned dims, decode-prefix sizes."""
        if _PALLAS_ROUTER == "off":
            return False
        if _PALLAS_ROUTER != "on" and default_platform() != "tpu":
            return False
        if self.is_initializing() or self.has_rng("gumbel"):
            return False
        x = modalities[0]
        if any(m is not x for m in modalities[1:]):
            return False
        if x.dtype not in (jnp.bfloat16, jnp.float32):
            return False
        return x.shape[-1] % 128 == 0 and x.size <= 400_000 \
            and x.shape[-1] == self.dims

    @nn.compact
    def __call__(self, *modalities):
        nt = self.num_types
        n_mod = len(modalities)
        from asr_model_tpu.models.norms import _DenseParams
        # the reference's Dense shapes its kernel lazily from the
        # STACKED input (dims * n_modalities) while its bias bound uses
        # the declared dims * num_types (model.py:541-543 semantics as
        # reproduced by tlayers.Dense) — preserved exactly
        w_top, b_top = _DenseParams(nt, self.dims * n_mod,
                                    bias_fan_in=self.dims * nt,
                                    name="top")()
        w_soft, b_soft = _DenseParams(nt, self.dims * n_mod,
                                      bias_fan_in=self.dims * nt,
                                      name="soft")()
        alpha_p = self.param("alpha", nn.initializers.ones, (1,))

        if self._fused_eligible(modalities):
            from asr_model_tpu.ops.pallas.router_kernel import \
                fused_router_same

            x = modalities[0]
            dt = x.dtype
            out = fused_router_same(
                x.reshape(-1, self.dims), w_top.astype(dt),
                b_top.astype(dt), w_soft.astype(dt), b_soft.astype(dt),
                alpha_p, num_types=nt, n_mod=n_mod,
                interpret=default_platform() != "tpu")
            return out.reshape(x.shape)

        stack = jnp.stack(modalities, axis=-1)                  # (b,c,d,nt)
        b, c = stack.shape[0], stack.shape[1]
        flat = stack.reshape(b, c, -1)                          # (b,c,d*nt)
        flat, w_t, b_t, w_s, b_s = nn.dtypes.promote_dtype(
            flat, w_top, b_top, w_soft, b_soft, dtype=None)
        top = flat @ w_t + b_t
        soft = jax.nn.softmax(flat @ w_s + b_s, -1)
        alpha = nn.sigmoid(alpha_p)
        weights = alpha * _topk_hard(top, 2) + (1 - alpha) * soft
        return jnp.sum(stack * weights[..., None, :], axis=-1)


class MPNet(nn.Module):
    """Jump-policy network: pooled state -> softmax over {0..jump}."""

    dims: int
    jump: int = 2

    @nn.compact
    def __call__(self, pooled):
        h = tlayers.Dense(128, self.dims, name="fc1")(pooled)
        logits = tlayers.Dense(self.jump + 1, 128, name="fc2")(nn.silu(h))
        return jax.nn.softmax(logits, axis=-1)


class OneShot(nn.Module):
    """Cross-modal attention-bias head: scaled q.k^T logits (B,H,L,K).

    The runtime-adaptive ``scale`` is NOT a traced constant — the
    grad-norm feedback controller (essentials.py:794-809) adjusts it
    between steps, so it is passed as an argument (a device scalar)
    to avoid recompilation; ``default_scale`` mirrors the ctor logic
    (1/len(features) if features else scale)."""

    dims: int
    head: int
    scale: float = 0.3
    num_features: Optional[int] = None

    @property
    def default_scale(self) -> float:
        return 1.0 / self.num_features if self.num_features else self.scale

    @nn.compact
    def __call__(self, x, xa, scale=None):
        hd = self.dims // self.head
        q = tlayers.Dense(self.dims, self.dims, name="q")(x)
        k = tlayers.Dense(self.dims, self.dims, name="k")(xa)
        B, L = x.shape[0], x.shape[1]
        K = xa.shape[1]
        q = q.reshape(B, L, self.head, hd).transpose(0, 2, 1, 3)
        k = k.reshape(B, K, self.head, hd).transpose(0, 2, 1, 3)
        s = self.default_scale if scale is None else scale
        return jnp.einsum("bhld,bhkd->bhlk", q, k) * s / math.sqrt(hd)
