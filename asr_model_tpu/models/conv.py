"""Convolutional audio feature encoder.

Parity targets: ConvLite model.py:93-118 (conformer-style conv block:
pointwise->GLU->depthwise(k=15)->BN->SiLU->pointwise->dropout, residual)
and AudioEncoder model.py:120-169 (per-modality conv stem + ``layer``x
[act, weight_norm conv k3, LayerNorm, ConvLite, act, depthwise conv k3,
act, dropout], then (B,T,D) + sinusoids(theta=30000)).

Layout: channel-last (B, T, C) throughout — the natural XLA layout; the
reference's (B, C, T) permutes (model.py:160) disappear.  Convs are
SAME-padded k=3/k=15 exactly as the reference.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from asr_model_tpu.config import THETA
from asr_model_tpu.models import tlayers
from asr_model_tpu.models.registry import get_activation, get_norm
from asr_model_tpu.ops.audio import sinusoids


class WeightNormConv1d(nn.Module):
    """Conv1d under weight-norm parametrization (torch
    ``weight_norm(nn.Conv1d(...))``, dim=0): w = g * v/||v|| with the
    norm over (kernel, in) per output channel; g initialized to ||v||
    so the initial function equals the raw conv."""

    features: int
    in_features: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x):
        shape = (self.kernel_size, self.in_features, self.features)
        v = self.param("v", tlayers.torch_kernel_init(), shape)
        fan_in = self.in_features * self.kernel_size

        def g_init(key, s, dtype=jnp.float32):
            # requires v; flax init order is deterministic, so re-derive
            # ||v|| lazily at first call instead
            return jnp.ones(s, dtype)

        g = self.param("g", g_init, (self.features,))
        if self.is_initializing():
            # match torch: g <- ||v|| at init (so w == v initially)
            vn0 = jnp.sqrt(jnp.sum(v * v, axis=(0, 1)))
            self.put_variable("params", "g", vn0)
            g = vn0
        vn = jnp.sqrt(jnp.sum(v * v, axis=(0, 1), keepdims=True))
        w = g[None, None, :] * v / jnp.maximum(vn, 1e-12)
        b = self.param("b", tlayers.torch_bias_init(fan_in), (self.features,))
        y = jax.lax.conv_general_dilated(
            x, w, window_strides=(1,), padding="SAME",
            dimension_numbers=("NWC", "WIO", "NWC"))
        return y + b


class GLU(nn.Module):
    """GLU over the channel (last) axis: a * sigmoid(b)."""

    @nn.compact
    def __call__(self, x):
        a, b = jnp.split(x, 2, axis=-1)
        return a * nn.sigmoid(b)


class ConvLite(nn.Module):
    dims: int
    kernel_size: int = 15
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool = False, valid=None):
        """``valid``: optional (B, T) time mask; out-of-bounds rows are
        re-zeroed before the padded depthwise conv so a halo-extended
        shard reproduces the unsharded SAME-pad numerics exactly
        (parallel/seq.py:sp_encode)."""
        residual = x
        x = tlayers.Conv1d(self.dims * 2, self.dims, 1, name="point1")(x)
        x = GLU()(x)
        if valid is not None:
            x = x * valid[..., None].astype(x.dtype)
        x = tlayers.Conv1d(self.dims, self.dims, self.kernel_size,
                           groups=self.dims, name="depth")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn")(x)
        x = nn.silu(x)
        x = tlayers.Conv1d(self.dims, self.dims, 1, name="point2")(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return residual + x


class TransformerEncoderLayer(nn.Module):
    """Optional post-encoder transformer layer (model.py:138, enc=True;
    torch nn.TransformerEncoderLayer defaults: post-norm, ReLU FFN 2048)."""

    dims: int
    head: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        a = nn.SelfAttention(num_heads=self.head, deterministic=True)(x)
        x = nn.LayerNorm(epsilon=1e-5)(x + a)
        h = tlayers.Dense(2048, self.dims)(x)
        h = tlayers.Dense(self.dims, 2048)(nn.relu(h))
        return nn.LayerNorm(epsilon=1e-5)(x + h)


class AudioEncoder(nn.Module):
    """Shared per-modality feature encoder.

    Input per modality: (B, C, T) with C=mels for spectrograms or C=1
    for pitch/waveform tracks (API parity with the collator); output
    (B, T, dims) with sinusoidal PE added.
    """

    mels: int
    dims: int
    head: int
    layer: int
    act: str
    n_type: str
    norm: bool = False
    enc: bool = False
    theta: float = THETA
    dropout: float = 0.1

    def setup(self):
        self.stem_multi = tlayers.Conv1d(self.dims, self.mels, 3,
                                         name="conv1")
        self.stem_mono = tlayers.Conv1d(self.dims, 1, 3, name="conv2")
        if self.norm:
            self.out_norm = get_norm(self.n_type, self.dims)
            self.local_norm = get_norm("localnorm", self.dims)
        blocks = []
        for i in range(self.layer):
            blocks.append({
                "wn": WeightNormConv1d(self.dims, self.dims, 3,
                                       name=f"enc{i}_wn"),
                # torch LayerNorm eps (essentials.py:102-113); flax
                # defaults to 1e-6, which is a measurable (~1e-3)
                # parity skew through the conv stack
                "ln": nn.LayerNorm(epsilon=1e-5, name=f"enc{i}_ln"),
                "convlite": ConvLite(self.dims, 15, self.dropout,
                                     name=f"enc{i}_convlite"),
                "dw": tlayers.Conv1d(self.dims, self.dims, 3,
                                     groups=self.dims, name=f"enc{i}_dw"),
            })
        self.blocks = blocks
        self.drop = nn.Dropout(self.dropout)
        if self.enc:
            self.encoder_layer = TransformerEncoderLayer(self.dims, self.head)

    def _stem(self, x: jnp.ndarray, train: bool = False,
              valid=None) -> jnp.ndarray:
        """Input stem: (B, C, T) -> (B, T, dims) via the multi- or
        mono-channel conv (+ optional input norm)."""
        if x.ndim == 2:
            x = x[None]

        def mask(t):
            if valid is None:
                return t
            return t * valid[..., None].astype(t.dtype)

        x = jnp.swapaxes(x, -1, -2)          # (B, C, T) -> (B, T, C)
        x = mask(x)
        if x.shape[-1] > 1:
            x = self.stem_multi(x)
            if self.norm:
                x = self.out_norm(x)
        else:
            x = self.stem_mono(x)
            if self.norm:
                x = self.local_norm(x)
        return x

    def _stack(self, x: jnp.ndarray, train: bool = False, pe: bool = True,
               valid=None, pe_override=None) -> jnp.ndarray:
        """The deep conv stack over stem outputs (B, T, dims) — every
        op is row-local at eval, so multiple modality slots batch into
        one pass (``__call__``)."""
        act = get_activation(self.act)

        def mask(t):
            if valid is None:
                return t
            return t * valid[..., None].astype(t.dtype)

        for blk in self.blocks:
            x = act(x)
            x = mask(x)                      # before the padded wn k3
            x = blk["wn"](x)
            x = blk["ln"](x)
            x = blk["convlite"](x, train=train, valid=valid)
            x = act(x)
            x = mask(x)                      # before the padded dw k3
            x = blk["dw"](x)
            x = act(x)
            x = self.drop(x, deterministic=not train)
        if pe:
            x = x + sinusoids(x.shape[1], x.shape[-1],
                              self.theta).astype(x.dtype)
        elif pe_override is not None:
            x = x + pe_override.astype(x.dtype)
        if self.norm:
            x = self.out_norm(x)
        if self.enc:
            x = self.encoder_layer(x, train=train)
        return x

    def _process_feature(self, x: jnp.ndarray, train: bool = False,
                         rng=None, pe: bool = True,
                         valid=None, pe_override=None) -> jnp.ndarray:
        """``pe=False`` skips the sinusoidal position add and ``valid``
        ((B, T) bool) re-zeroes out-of-bounds time rows before every
        padded conv — both used by the sequence-parallel encoder
        (parallel/seq.py:sp_encode), which processes halo-extended time
        shards.  ``pe_override`` (rows, dims) supplies globally-offset
        positions to add in place of the standard sinusoids — INSIDE
        this function, so the optional ``out_norm`` (norm=True,
        model.py:161-162) still runs after the position add exactly as
        in the unsharded path (ADVICE r2).  With ``valid`` all-True
        (or None) and no override the math is unchanged."""
        return self._stack(self._stem(x, train=train, valid=valid),
                           train=train, pe=pe, valid=valid,
                           pe_override=pe_override)

    def __call__(self, x, train: bool = False):
        if not isinstance(x, dict):
            return self._process_feature(x, train=train)

        keys = [k for k in ("a", "b", "c") if x.get(k) is not None]
        out = {k: v for k, v in x.items() if k not in keys}

        if train:
            # train mode: encode each slot separately — BatchNorm batch
            # stats / running-stat updates must match the reference's
            # one-call-per-modality behavior (model.py:165-169)
            for k in keys:
                out[k] = self._process_feature(x[k], train=True)
            return out

        # eval/decode: (1) identical slot tensors (single-modality runs
        # put the same array in a/b/c, model.py:656-662) encode ONCE;
        # (2) stems run per unique tensor, then ALL stem outputs with
        # the same time length batch-concatenate into ONE deep-stack
        # pass — the stack is (B, T, dims) regardless of input channel
        # count, and every op in it is row-local at eval (BN running
        # stats, no dropout), so this is numerics-exact.  Measured
        # motivation (docs/MFU.md): encode+precompute runs at 9% MFU —
        # three sequential slot passes underfill the chip; one 3B-row
        # pass cuts the dispatch count and widens every matmul.
        uniq: dict = {}
        for k in keys:
            uniq.setdefault(id(x[k]), []).append(k)
        groups = list(uniq.values())

        by_t: dict = {}
        for g in groups:
            t = x[g[0]]
            t = t if t.ndim == 3 else t[None]
            by_t.setdefault(t.shape[-1], []).append((g, t))

        for _t, gs in by_t.items():
            stems = [self._stem(t, train=False) for _g, t in gs]
            sizes = [s.shape[0] for s in stems]
            enc_all = self._stack(jnp.concatenate(stems, axis=0),
                                  train=False)
            ofs = 0
            for (g, _t2), s in zip(gs, sizes):
                e = enc_all[ofs:ofs + s]
                ofs += s
                for k in g:
                    out[k] = e
        return out
