"""Decoder: residual block and the multi-modal ``processor``.

Parity targets: ``residual`` model.py:559-583 and ``processor``
model.py:585-629.

residual (per call):
  x, _ = MSheath(ln(x));  x = router(x ×(layer-1)) + attn(ln(x), causal)
  if xa: xa += sinusoids; xa, _ = MSheath(ln(xa));
         x = x + attn(ln(x), xa=router(xa ×(layer-1)))
  return x + mlp(x)   where mlp = [ln, tgate, Dense(d,3d), act,
                                   Dense(3d,d), ln]
The single ``ln`` instance is SHARED between both mlp positions and the
pre-attention norms (one module in the reference, model.py:564,573) —
reproduced via a single submodule.

processor forward (model.py:602-629): token embedding + optional
pitch-token embedding (the reference's ``n.quantize_pitch`` call is a
missing-method crash, SURVEY note C — implemented working here) +
learned ones-initialized position embedding; then per block:
  a = blk(x, causal);  b = blk(a, xa=blk(xa.a));  c = blk(b, xa=blk(xa.b))
  d = blk(c, xa=blk(xa.c));  e = a+b+c;  f = cat(d, e, time)
  g = blk(f[:, :T], xa=f[:, T:])
Reference quirk reproduced: ``x`` is never fed back between blocks, so
only the LAST block reaches the output (earlier blocks are dead code
with zero gradients).  ``chained=False`` (default, parity) therefore
runs only the last block — identical math, 1/layer the compute;
``chained=True`` feeds g back (the "fixed" variant).
Causality: only the ``a`` call is causal (the reference passes a mask
only there) — b/c/d/g self-attentions are non-causal, which is why
decode recomputes the prefix (see generate.py).

Output: ``g`` if seq else ``sigmoid(blend)*d + (1-sigmoid(blend))*g``;
logits are weight-tied with the token embedding (model.py:628-629).

Masking (TPU decode): ``text_valid`` (B,T) restricts attention,
MSheath pooling and router inputs to the live prefix so a fixed-size
buffer reproduces the reference's variable-length numerics exactly.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

import os

from asr_model_tpu.config import THETA
from asr_model_tpu.models import tlayers
from asr_model_tpu.models.attention import Attention
from asr_model_tpu.models.gates import Router, TGate
from asr_model_tpu.models.registry import get_activation, get_norm
from asr_model_tpu.models.moe import MoEMLP
from asr_model_tpu.models.sheath import MSheath
from asr_model_tpu.ops.audio import sinusoids
from asr_model_tpu.utils import default_platform

# Fused residual-MLP tail (ops/pallas/mlp_kernel).  Default "off" —
# MEASURED neutral-to-negative on the headline decode (bench.py B=8:
# 411.3x abby-only -> 396.9x with mlp+router kernels added): XLA's
# fused elementwise chains around the two big matmuls beat the
# kernel's f32 internal arithmetic + per-block weight residency.
# "on" forces (interpret off-TPU — the parity tests); "auto" routes
# eligible eval-mode calls on TPU.
_PALLAS_MLP = os.environ.get("PALLAS_MLP", "off").lower()


def quantize_pitch(pt: jnp.ndarray, num_bins: int = 256,
                   v_min: float = -2.0, v_max: float = 2.0) -> jnp.ndarray:
    """Linear-bin pitch quantizer (essentials.py:416-421): round
    normalized pitch into [0, num_bins-1]."""
    idx = jnp.round((pt - v_min) / (v_max - v_min) * (num_bins - 1))
    return jnp.clip(idx, 0, num_bins - 1).astype(jnp.int32)


class Residual(nn.Module):
    dims: int
    head: int
    layer: int
    act: str
    n_type: str
    num_types: int = 3
    theta: float = THETA
    # >0: replace the dense MLP pair with a routed mixture of experts
    # of the same per-expert shape (models/moe.py); experts shard over
    # the 'expert' mesh axis (EP)
    moe_experts: int = 0
    moe_top_k: int = 2
    moe_capacity_factor: float = 1.25

    def setup(self):
        d = self.dims
        self.ln = get_norm(self.n_type, d)        # shared instance
        self.attn = Attention(d, self.head, self.layer, n_type=self.n_type)
        self.router = Router(d, num_types=self.num_types)
        self.jump = MSheath(d, self.head, self.layer)
        self.tgate = TGate(d, num_types=self.num_types)
        if self.moe_experts > 0:
            self.moe = MoEMLP(d, d * self.num_types, self.moe_experts,
                              top_k=self.moe_top_k,
                              capacity_factor=self.moe_capacity_factor,
                              act=self.act, name="moe")
        else:
            self.mlp_in = tlayers.Dense(d * self.num_types, d,
                                        name="mlp_in")
            self.mlp_out = tlayers.Dense(d, d * self.num_types,
                                         name="mlp_out")

    def _mlp_fused_eligible(self, x) -> bool:
        """Gate for the one-dispatch residual-MLP tail: eval only (no
        gumbel rng — init runs the XLA path so every param exists),
        AbbyNormal ln, exact-erf gelu, dense MLP (no MoE),
        lane-aligned dims, decode-prefix sizes (the norms.py gate
        rationale)."""
        from asr_model_tpu.models.norms import AbbyNormal

        if _PALLAS_MLP == "off":
            return False
        if _PALLAS_MLP != "on" and default_platform() != "tpu":
            return False
        if self.is_initializing() or self.has_rng("gumbel"):
            return False
        if self.moe_experts > 0 or self.act != "gelu":
            return False
        if not isinstance(self.ln, AbbyNormal):
            return False
        if x.dtype not in (jnp.bfloat16, jnp.float32):
            return False
        return self.dims % 128 == 0 and x.size <= 400_000

    def _mlp_residual_fused(self, x):
        """x + _mlp(x) in one Pallas dispatch (ops/pallas/mlp_kernel)."""
        from asr_model_tpu.ops.pallas.mlp_kernel import fused_mlp_residual

        dt = x.dtype
        d = self.dims
        lp = self.ln.variables["params"]
        tp = self.tgate.variables["params"]
        ln_w = tuple(a.astype(dt) for a in (
            lp["router_in"]["kernel"], lp["router_in"]["bias"],
            lp["router_out"]["kernel"], lp["router_out"]["bias"]))
        gates = [(tp[f"ga{i}"]["kernel"].astype(dt),
                  tp[f"ga{i}"]["bias"].astype(dt))
                 for i in range(self.num_types)]
        ip = self.mlp_in.variables["params"]
        op = self.mlp_out.variables["params"]
        size_d = max(3, int(d * 0.05)) | 1
        out = fused_mlp_residual(
            x.reshape(-1, d), ln_w,
            tp["cs"]["kernel"].astype(dt), tp["cs"]["bias"].astype(dt),
            gates, ip["kernel"].astype(dt), ip["bias"].astype(dt),
            op["kernel"].astype(dt), op["bias"].astype(dt),
            num_types=self.num_types, size_d=size_d,
            alpha=self.ln.alpha, k=self.ln.k, beta=self.ln.beta,
            interpret=default_platform() != "tpu")
        return out.reshape(x.shape)

    def _mlp(self, x):
        h = self.ln(x)
        h = self.tgate(h)
        if self.moe_experts > 0:
            h = self.moe(h)
        else:
            act = get_activation(self.act)
            h = self.mlp_out(act(self.mlp_in(h)))
        return self.ln(h)

    def precompute_cross(self, xa, xa_valid=None):
        """The per-utterance half of the cross branch: +PE, MSheath,
        router mix, and the attention K/V processing — everything that
        does not depend on the decoder state (all of which the
        reference recomputes per emitted token, model.py:579-582)."""
        n_router = self.layer - 1
        xa = xa + sinusoids(xa.shape[1], xa.shape[-1],
                            self.theta).astype(xa.dtype)
        xa, _ = self.jump(self.ln(xa), valid=xa_valid)
        mixed = self.router(*[xa] * n_router)
        return self.attn.precompute_kv(mixed)

    def __call__(self, x, xa=None, causal: bool = False, pt=None,
                 x_valid: Optional[jnp.ndarray] = None,
                 xa_valid: Optional[jnp.ndarray] = None,
                 cached_kv=None, streaming: bool = False,
                 cross_causal: bool = False, xa_streaming: bool = False):
        """``streaming``: prefix-causal MSheath pooling on the x side.
        ``cross_causal``: causal mask on the cross-attention (only valid
        when x and xa are position-aligned, the d‖e case).
        ``xa_streaming``: prefix-causal MSheath on the xa side (for
        text-derived xa; audio xa is fully available and stays global)."""
        n_router = self.layer - 1
        x, jmp = self.jump(self.ln(x), valid=x_valid, streaming=streaming)
        x = (self.router(*[x] * n_router)
             + self.attn(self.ln(x), causal=causal, pt=pt,
                         kv_valid=x_valid))
        if cached_kv is not None:
            x = x + self.attn(self.ln(x), cached_kv=cached_kv,
                              kv_valid=xa_valid)
        elif xa is not None:
            xa = xa + sinusoids(xa.shape[1], xa.shape[-1],
                                self.theta).astype(xa.dtype)
            xa, jmp = self.jump(self.ln(xa), valid=xa_valid,
                                streaming=xa_streaming)
            x = x + self.attn(self.ln(x),
                              xa=self.router(*[xa] * n_router), pt=pt,
                              causal=cross_causal,
                              kv_valid=xa_valid)
        if self._mlp_fused_eligible(x):
            return self._mlp_residual_fused(x)
        return x + self._mlp(x)


def encode_xa(blk: "Residual", xa: Dict[str, jnp.ndarray], pt=None,
              masks: Optional[Dict[str, jnp.ndarray]] = None
              ) -> Dict[str, jnp.ndarray]:
    """The per-block modality re-encodings i(xa[k]) (model.py:619-621),
    as a standalone function of a bound ``Residual`` so the pipeline-
    parallel schedule (parallel/pipeline.py) runs the exact same flow
    as ``Processor._encode_xa``.

    At EVAL (no gumbel rng), distinct same-shaped slots run as ONE
    ``jax.vmap`` over a stacked slot axis instead of three sequential
    block passes: every batch-pooled statistic (MSheath's jump-control
    means) reduces over the mapped-in batch axis, i.e. PER SLOT —
    numerics-exact vs the loop (tested) — while XLA batches the three
    slots' matmuls/attentions into single wider contractions.
    Measured motivation (docs/MFU.md): encode+precompute is the
    largest single block of decode wall time at 6.6-9.2% MFU.
    Identical slot tensors (single-modality runs) encode once either
    way.  No Pallas kernel engages at encoder sizes, so the vmap
    needs no pallas batching rules."""
    masks = masks or {}
    keys = [k for k in ("a", "b", "c") if xa.get(k) is not None]
    try:
        eval_mode = not (blk.is_initializing() or blk.has_rng("gumbel"))
    except Exception:                                # unbound module
        eval_mode = False
    uniq: Dict[int, list] = {}
    for k in keys:
        uniq.setdefault(id(xa[k]), []).append(k)
    groups = list(uniq.values())
    same_shape = len({xa[g[0]].shape for g in groups}) == 1
    no_masks = all(masks.get(k) is None for k in keys)
    if eval_mode and no_masks and len(groups) > 1 and same_shape:
        stacked = jnp.stack([xa[g[0]] for g in groups])
        enc = jax.vmap(lambda t: blk(t, pt=pt))(stacked)
        out = {}
        for i, g in enumerate(groups):
            for k in g:
                out[k] = enc[i]
        return out
    return {k: blk(xa[k], pt=pt, x_valid=masks.get(k)) for k in keys}


def run_block(blk: "Residual", x, xa_enc, *, streaming: bool,
              causal_all: bool, pt=None, text_valid=None,
              xa_masks: Optional[Dict[str, jnp.ndarray]] = None,
              xa_kv: Optional[Dict] = None):
    """One block's a/b/c/d/e/(d||e->g) flow (model.py:617-626), shared
    by ``Processor._run_block`` and the pipeline-parallel stage.

    Reference parity: only the ``a`` call is causal (model.py:618);
    ``causal_all`` masks every decoder self-attention; ``streaming``
    additionally makes MSheath pooling prefix-causal and masks the d‖e
    cross — the full causal-consistency mode.  Returns (d, g)."""
    T = x.shape[1]
    xa_masks = xa_masks or {}
    st = streaming
    ca = causal_all or st
    if xa_kv is not None:
        a = blk(x, causal=True, pt=pt, x_valid=text_valid, streaming=st)
        b = blk(a, causal=ca, cached_kv=xa_kv.get("a"),
                x_valid=text_valid, streaming=st,
                xa_valid=xa_masks.get("a")) if "a" in xa_kv else a
        c = blk(b, causal=ca, cached_kv=xa_kv.get("b"),
                x_valid=text_valid, streaming=st,
                xa_valid=xa_masks.get("b")) if "b" in xa_kv else b
        d = blk(c, causal=ca, cached_kv=xa_kv.get("c"),
                x_valid=text_valid, streaming=st,
                xa_valid=xa_masks.get("c")) if "c" in xa_kv else c
        e = a + b + c
        f = jnp.concatenate([d, e], axis=1)
        g = blk(f[:, :T], causal=ca, xa=f[:, T:], x_valid=text_valid,
                xa_valid=text_valid, streaming=st,
                cross_causal=st, xa_streaming=st)
        return d, g
    a = blk(x, causal=True, pt=pt, x_valid=text_valid, streaming=st)
    b = blk(a, causal=ca, xa=xa_enc.get("a"), pt=pt,
            x_valid=text_valid, streaming=st,
            xa_valid=xa_masks.get("a")) if "a" in xa_enc else a
    c = blk(b, causal=ca, xa=xa_enc.get("b"), pt=pt,
            x_valid=text_valid, streaming=st,
            xa_valid=xa_masks.get("b")) if "b" in xa_enc else b
    d = blk(c, causal=ca, xa=xa_enc.get("c"), pt=pt,
            x_valid=text_valid, streaming=st,
            xa_valid=xa_masks.get("c")) if "c" in xa_enc else c
    e = a + b + c
    f = jnp.concatenate([d, e], axis=1)
    g = blk(f[:, :T], causal=ca, xa=f[:, T:], x_valid=text_valid,
            xa_valid=text_valid, streaming=st,
            cross_causal=st, xa_streaming=st)
    return d, g


def _update_cache(cache, new, pos):
    """Write a (B, H, 1, hd) slice at time index ``pos`` of a fixed
    (B, H, Tmax, hd) cache buffer."""
    return jax.lax.dynamic_update_slice_in_dim(cache, new.astype(
        cache.dtype), pos, axis=2)


class StreamingResidual:
    """Incremental one-position execution of ``Residual`` for the
    streaming-causal variant (every text-side path is prefix-causal,
    config.py:67), used by generate.greedy_decode_stream.

    Per call site the state is {jump: MSheath running-mean state,
    k/v: (B, H, Tmax, hd) self-attention caches}; the g-block site adds
    {xa_jump, xa_k, xa_v} for its growing (causal) cross source.  The
    numerics per position equal the buffer path's newest position —
    KV entries are written post scale+rotary+head-norm, exactly what
    the buffer recomputes for every prefix position each step."""

    @staticmethod
    def init_state(blk, batch: int, t_max: int, dtype,
                   with_xa: bool = False):
        h = blk.head
        hd = blk.dims // h
        st = {"jump": blk.jump.init_stream_state(batch),
              "k": jnp.zeros((batch, h, t_max, hd), dtype),
              "v": jnp.zeros((batch, h, t_max, hd), dtype)}
        if with_xa:
            st["xa_jump"] = blk.jump.init_stream_state(batch)
            st["xa_k"] = jnp.zeros((batch, h, t_max, hd), dtype)
            st["xa_v"] = jnp.zeros((batch, h, t_max, hd), dtype)
        return st

    @staticmethod
    def step(blk, x_t, pos, state, prefix_valid, cached_kv=None,
             xa_t=None, pe_row=None, audio_valid=None):
        """x_t: (B, 1, D) at global position ``pos``; prefix_valid:
        (B, Tmax) mask of positions <= pos.  Returns (y_t, state)."""
        st = dict(state)
        n_router = blk.layer - 1
        x1, st["jump"] = blk.jump.stream_step(blk.ln(x_t), st["jump"])
        ax = blk.ln(x1)
        qn = blk.attn.q_step(ax, pos, causal=True)
        kn, v = blk.attn.kv_step(ax, pos, causal=True)
        st["k"] = _update_cache(st["k"], kn, pos)
        st["v"] = _update_cache(st["v"], v, pos)
        x2 = blk.router(*[x1] * n_router) + blk.attn.attend_cached(
            qn, st["k"], st["v"], kv_valid=prefix_valid)
        if cached_kv is not None:
            # fixed audio cross source (precomputed K/V, non-causal)
            q2 = blk.attn.q_step(blk.ln(x2), pos, causal=False)
            kc, vc = cached_kv
            x2 = x2 + blk.attn.attend_cached(q2, kc, vc,
                                             kv_valid=audio_valid)
        elif xa_t is not None:
            # growing text-derived cross source (the d||e block):
            # prefix-causal on both sides (cross_causal/xa_streaming)
            xa = xa_t + pe_row.astype(xa_t.dtype)
            xa1, st["xa_jump"] = blk.jump.stream_step(blk.ln(xa),
                                                      st["xa_jump"])
            mixed = blk.router(*[xa1] * n_router)
            kx, vx = blk.attn.kv_step(mixed, pos, causal=True)
            st["xa_k"] = _update_cache(st["xa_k"], kx, pos)
            st["xa_v"] = _update_cache(st["xa_v"], vx, pos)
            q3 = blk.attn.q_step(blk.ln(x2), pos, causal=True)
            x2 = x2 + blk.attn.attend_cached(q3, st["xa_k"], st["xa_v"],
                                             kv_valid=prefix_valid)
        if blk._mlp_fused_eligible(x2):
            return blk._mlp_residual_fused(x2), st
        return x2 + blk._mlp(x2), st


class Processor(nn.Module):
    tokens: int
    mels: int
    dims: int
    head: int
    layer: int
    act: str
    n_type: str
    ctx: int = 2048
    chained: bool = False
    causal_all: bool = False
    streaming: bool = False
    pitch_token_vocab: int = 1024
    pitch_token_bins: int = 256
    moe_experts: int = 0
    moe_top_k: int = 2
    moe_capacity_factor: float = 1.25

    def setup(self):
        d = self.dims
        self.ln = get_norm(self.n_type, d)
        self.token = tlayers.Embed(self.tokens, d, name="token")
        self.pitch_tokens = tlayers.Embed(self.pitch_token_vocab, d,
                                          name="pitch_tokens")
        # learned position embedding initialized to ONES (model.py:594)
        self.position = self.param("position", nn.initializers.ones,
                                   (self.ctx, d))
        # strong-typed scalar: a weak-typed init loses its weak type on
        # the first optimizer update, forcing a full step recompile
        self.blend = self.param("blend",
                                lambda k, s: jnp.asarray(0.5, jnp.float32),
                                ())
        self.block = [Residual(d, self.head, self.layer, self.act,
                               self.n_type,
                               moe_experts=self.moe_experts,
                               moe_top_k=self.moe_top_k,
                               moe_capacity_factor=self.moe_capacity_factor,
                               name=f"block{i}")
                      for i in range(self.layer)]

    def _encode_xa(self, blk, xa: Dict[str, jnp.ndarray], pt=None,
                   masks: Optional[Dict[str, jnp.ndarray]] = None):
        """The per-block modality re-encodings i(xa[k]) (model.py:619-621).
        Exposed separately so decode can compute them once per utterance
        instead of once per emitted token."""
        return encode_xa(blk, xa, pt=pt, masks=masks)

    def _precompute_cross(self, blk, xa_enc,
                          masks: Optional[Dict[str, jnp.ndarray]] = None):
        """Per-slot cross-attention K/V cache for decode (see
        Residual.precompute_cross)."""
        masks = masks or {}
        return {k: blk.precompute_cross(xa_enc[k],
                                        xa_valid=masks.get(k))
                for k in ("a", "b", "c") if xa_enc.get(k) is not None}

    def _run_block(self, blk, x, xa_enc, mask_bits, pt=None,
                   text_valid=None, xa_masks=None, xa_kv=None):
        del mask_bits
        return run_block(blk, x, xa_enc, streaming=self.streaming,
                         causal_all=self.causal_all, pt=pt,
                         text_valid=text_valid, xa_masks=xa_masks,
                         xa_kv=xa_kv)

    def embed(self, ids: jnp.ndarray, pt_raw: Optional[jnp.ndarray] = None):
        """The pre-block part of ``__call__``: token + (optional) pitch-
        token + learned position embeddings.  Returns (x, pt_emb) —
        split out so the pipeline-parallel schedule can run it outside
        the sharded block loop (parallel/pipeline.py)."""
        T = ids.shape[1]
        x1 = self.token(ids)
        if pt_raw is not None:
            pt_ids = quantize_pitch(pt_raw, self.pitch_token_bins)
            pt_emb = self.pitch_tokens(pt_ids)
            x1 = x1 + pt_emb
        else:
            pt_emb = None
        return x1 + self.position[:T], pt_emb

    def logits_head(self, d: jnp.ndarray, g: jnp.ndarray, seq: bool = False,
                    logits_position: Optional[jnp.ndarray] = None
                    ) -> jnp.ndarray:
        """The post-block part of ``__call__``: blend + final norm +
        weight-tied vocab projection (model.py:628-629)."""
        blend = nn.sigmoid(self.blend)
        out = g if seq else blend * d + (1 - blend) * g
        if logits_position is not None:
            out = jax.lax.dynamic_slice_in_dim(
                out, logits_position, 1, axis=1)
        logits = self.ln(out) @ self.token.embedding.T
        return logits.astype(jnp.float32)

    def init_stream_state(self, batch: int, t_max: int, dtype):
        """Per-site incremental state for decode_stream_step: the five
        Residual call sites a/b/c/d/g of the LAST block (chained=False
        parity — earlier blocks are dead code, see class docstring)."""
        if self.chained:
            raise NotImplementedError(
                "incremental streaming decode supports chained=False")
        blk = self.block[-1]
        S = StreamingResidual
        return {k: S.init_state(blk, batch, t_max, dtype)
                for k in ("a", "b", "c", "d")} | {
            "g": S.init_state(blk, batch, t_max, dtype, with_xa=True)}

    def decode_stream_step(self, token_t: jnp.ndarray, pos, state: dict,
                           xa_kv: Dict, pe_table: jnp.ndarray,
                           xa_masks: Optional[Dict] = None):
        """One streaming-causal decode step: embed the newest token,
        run the a/b/c/d/e/(d||e->g) flow for ONE position against the
        incremental state, and return (logits (B, vocab), new state).
        O(1) work per token (plus O(t) attention reads) instead of the
        buffer path's full-prefix recompute — valid ONLY for
        streaming=True, where every text-side path is prefix-causal."""
        assert self.streaming, "incremental decode requires streaming"
        blend = nn.sigmoid(self.blend)
        blk = self.block[-1]
        t_max = state["a"]["k"].shape[2]
        batch = token_t.shape[0]
        prefix_valid = jnp.broadcast_to(
            jnp.arange(t_max)[None, :] <= pos, (batch, t_max))
        xa_masks = xa_masks or {}

        x = self.token(token_t[:, None]) \
            + jax.lax.dynamic_slice_in_dim(self.position, pos, 1, axis=0)
        pe_row = jax.lax.dynamic_slice_in_dim(pe_table, pos, 1, axis=0)

        S = StreamingResidual
        st = dict(state)
        a, st["a"] = S.step(blk, x, pos, st["a"], prefix_valid)
        b, st["b"] = (S.step(blk, a, pos, st["b"], prefix_valid,
                             cached_kv=xa_kv["a"],
                             audio_valid=xa_masks.get("a"))
                      if "a" in xa_kv else (a, st["b"]))
        c, st["c"] = (S.step(blk, b, pos, st["c"], prefix_valid,
                             cached_kv=xa_kv["b"],
                             audio_valid=xa_masks.get("b"))
                      if "b" in xa_kv else (b, st["c"]))
        d, st["d"] = (S.step(blk, c, pos, st["d"], prefix_valid,
                             cached_kv=xa_kv["c"],
                             audio_valid=xa_masks.get("c"))
                      if "c" in xa_kv else (c, st["d"]))
        e = a + b + c
        g, st["g"] = S.step(blk, d, pos, st["g"], prefix_valid,
                            xa_t=e, pe_row=pe_row)
        out = blend * d + (1 - blend) * g           # seq=False head
        logits = self.ln(out) @ self.token.embedding.T
        return logits[:, 0].astype(jnp.float32), st

    def __call__(self, ids: jnp.ndarray, xa: Dict[str, jnp.ndarray],
                 seq: bool = False,
                 text_valid: Optional[jnp.ndarray] = None,
                 xa_masks: Optional[Dict[str, jnp.ndarray]] = None,
                 xa_preencoded: bool = False,
                 logits_position: Optional[jnp.ndarray] = None,
                 xa_kv: Optional[Dict] = None):
        x, pt_emb = self.embed(ids, pt_raw=xa.get("pt"))

        blocks = self.block if self.chained else self.block[-1:]
        d = g = None
        for blk in blocks:
            if xa_kv is not None:
                d, g = self._run_block(blk, x, None, None, pt=pt_emb,
                                       text_valid=text_valid,
                                       xa_masks=xa_masks, xa_kv=xa_kv)
            else:
                xa_enc = (dict(xa) if xa_preencoded
                          else self._encode_xa(blk, xa, pt=pt_emb,
                                               masks=xa_masks))
                xa_enc.pop("pt", None)
                d, g = self._run_block(blk, x, xa_enc, None, pt=pt_emb,
                                       text_valid=text_valid,
                                       xa_masks=xa_masks)
            if self.chained:
                x = g

        # greedy decode only consumes one position's logits — head()
        # slices BEFORE the (d x vocab) projection, which dominates
        # decode FLOPs (40k vocab); all norms there are position-wise
        # so slicing first is numerics-exact
        return self.logits_head(d, g, seq=seq,
                                logits_position=logits_position)
