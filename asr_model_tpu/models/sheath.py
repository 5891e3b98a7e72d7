"""MSheath — adaptive-depth layer stack ("myelin sheath").

Parity target: MSheath model.py:387-507 with v_gate model.py:336-358,
MPNet model.py:375-385, r_node model.py:360-373, STthreshold
model.py:319-334.

The reference is a Python ``while`` loop with data-dependent jumps and
``.item()`` host syncs (model.py:441-501) — untraceable.  Here it is a
fixed-length ``lax.scan`` over ``layer`` slots carrying an active-layer
index: each step gathers the params of layer ``i`` (a traced scalar
index into stacked parameter arrays, so exactly ONE layer's compute runs
per step, like the reference), applies the gated v_gate update, updates
the EMA working memory, and resolves the jump policy:

* forced skip (action=1) when the batch-mean gate potential < 0.1;
* otherwise a hard gumbel sample from the MPNet policy over {0,1,2}
  (straight-through: forward value 1.0, gradient to the policy);
* on action>0, blend ``jump_s``-weighted original input with working
  memory and advance the index by action+1 (clipped to ``layer``).

Control is scalar-per-batch, exactly like the reference (whose
``.item()`` at model.py:478 only admits batch size 1): the policy/
potential are batch means, which equal the reference's values at B=1.
Iterations after ``i >= layer`` are masked no-ops.  Jump statistics are
accumulated as a (3,) counter — this also fixes the reference's
``jstat`` vs ``jump_statistics`` logging mismatch (SURVEY §5.5).

``shared_head`` (AdaptiveSpan) is constructed but never called in the
reference (SURVEY note B); its single ``span_scale`` parameter is kept
for parameter parity.  ``r_node`` (mini_hc=True) is implemented as the
documented intent — softmax-weighted mixture of ``exp`` parallel linear
paths, ReLU — the reference's einsum shapes are broken (model.py:372).
"""

from __future__ import annotations

import contextlib
import math
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from asr_model_tpu.models import tlayers
from asr_model_tpu.models.gates import MPNet
from asr_model_tpu.models.stochastic import gumbel_softmax, ste_threshold
from asr_model_tpu.utils import default_platform, l2norm


def _linear_init(fan_in):
    return tlayers.torch_kernel_init(), tlayers.torch_bias_init(fan_in)


# PALLAS_SHEATH: "on" forces the fused scan everywhere (interpreter on
# CPU — tests), "off" disables it, unset routes it on TPU only.
_PALLAS_SHEATH = os.environ.get("PALLAS_SHEATH", "auto").lower()

# Trace-time flag: while active, the layer-slot scan wraps its body in
# jax.checkpoint so the backward recomputes each slot instead of
# saving per-slot residuals.  The xa-side scans run at encoder length
# (B, ~1000, D): their saved residuals are the train step's HBM hog —
# wrapping the WHOLE loss in jax.checkpoint does not help, because the
# backward's own scan re-saves per-step residuals during the
# recomputation; the body is where the checkpoint must live.
# (See train/loop.py:make_train_step(remat=...).)
_SCAN_REMAT = [False]


@contextlib.contextmanager
def scan_remat():
    _SCAN_REMAT[0] = True
    try:
        yield
    finally:
        _SCAN_REMAT[0] = False


def _pallas_sheath_enabled() -> bool:
    if _PALLAS_SHEATH == "off":
        return False
    return _PALLAS_SHEATH == "on" or default_platform() == "tpu"


# Trace-time context: while active, the batch-mean jump-control scalars
# (policy_mean, forced-skip potential — reference parity, model.py:478,
# whose .item() control admits only whole-batch scalars) are
# additionally pmean'd over the named MAPPED axes.  The jit-SPMD DP
# path gets global batch means for free (XLA partitions jnp.mean with
# collectives); a shard_map stage (parallel/pipeline.py) is a
# per-device program, so without this its control scalars would be
# per-shard means and the pipelined forward would diverge from the
# unsharded one.  Shards are equal-sized under shard_map, so
# pmean-of-means is the exact global mean.
_BATCH_PMEAN: list = []


@contextlib.contextmanager
def batch_pmean(*axes: str):
    _BATCH_PMEAN.append(axes)
    try:
        yield
    finally:
        _BATCH_PMEAN.pop()


def _ctx_pmean(v):
    if _BATCH_PMEAN:
        for ax in _BATCH_PMEAN[-1]:
            v = jax.lax.pmean(v, ax)
    return v


def _ctx_psum(v):
    if _BATCH_PMEAN:
        for ax in _BATCH_PMEAN[-1]:
            v = jax.lax.psum(v, ax)
    return v


def _layer_norm(x, scale, bias, eps=1e-5):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * scale + bias


def _masked_mean(x, valid, axis):
    if valid is None:
        return jnp.mean(x, axis=axis, keepdims=True)
    m = valid.astype(x.dtype)
    while m.ndim < x.ndim:
        m = m[..., None]
    s = jnp.sum(x * m, axis=axis, keepdims=True)
    n = jnp.maximum(jnp.sum(m, axis=axis, keepdims=True), 1.0)
    return s / n


def _causal_mean(x, valid):
    """Per-position running mean over positions <= t along axis 1:
    out[:, t] = mean(x[:, :t+1]).  The cumulative sums run in f32 so
    bf16 inference stays accurate at ctx=2048."""
    f32 = x.astype(jnp.float32)
    if valid is None:
        s = jnp.cumsum(f32, axis=1)
        n = jnp.arange(1, x.shape[1] + 1, dtype=jnp.float32)[None, :, None]
    else:
        m = valid.astype(jnp.float32)[..., None]
        s = jnp.cumsum(f32 * m, axis=1)
        n = jnp.maximum(jnp.cumsum(m, axis=1), 1.0)
    return (s / n).astype(x.dtype)


class MSheath(nn.Module):
    dims: int
    head: int
    layer: int
    mini_hc: bool = False
    rate: int = 2
    mem: int = 64
    thresh: float = 0.3
    l_jump: bool = True

    def setup(self):
        d, L, M = self.dims, self.layer, self.mem
        kinit = tlayers.torch_kernel_init()
        randn = nn.initializers.normal(stddev=1.0)

        self.mem_w = self.param("mem_w", nn.initializers.zeros, (1, 1, d))
        self.memgate_w = self.param("memgate_w", kinit, (d, 1))
        self.memgate_b = self.param("memgate_b", tlayers.torch_bias_init(d), (1,))
        self.jump_s = self.param(
            "jump_s", lambda k, s: jnp.asarray([0.1, 0.05, 0.01]), (3,))
        # parity placeholder: AdaptiveSpan shared_head (model.py:396)
        self.span_scale = self.param("span_scale", nn.initializers.ones, (1,))

        self.ln_scale = self.param("ln_scale", nn.initializers.ones, (L, d))
        self.ln_bias = self.param("ln_bias", nn.initializers.zeros, (L, d))
        self.gate_w = self.param("gate_w", kinit, (L, d, 1))
        self.gate_b = self.param("gate_b", tlayers.torch_bias_init(d), (L, 1))

        # v_gate (per layer): memory bank + scoring MLP + concat head
        self.mkey = self.param("mkey", randn, (L, M, d))
        self.mval = self.param("mval", randn, (L, M, 1))
        self.vmlp1_w = self.param("vmlp1_w", kinit, (L, d, d // 2))
        self.vmlp1_b = self.param("vmlp1_b", tlayers.torch_bias_init(d),
                                  (L, d // 2))
        self.vmlp2_w = self.param("vmlp2_w", kinit, (L, d // 2, 1))
        self.vmlp2_b = self.param("vmlp2_b", tlayers.torch_bias_init(d // 2),
                                  (L, 1))
        self.vcat_w = self.param("vcat_w", kinit, (L, 2, 1))
        self.vcat_b = self.param("vcat_b", tlayers.torch_bias_init(2), (L, 1))

        n_adapt = (L + 1) // 2  # adapters on even layers only (model.py:408)
        self.adapt_w = self.param("adapt_w", kinit, (n_adapt, d, d))
        self.adapt_b = self.param("adapt_b", tlayers.torch_bias_init(d),
                                  (n_adapt, d))

        if self.mini_hc:
            E = self.rate
            self.par_w = self.param("par_w", kinit, (L, E, d, d))
            self.par_b = self.param("par_b", tlayers.torch_bias_init(d),
                                    (L, E, d))
            self.rnet_w = self.param("rnet_w", kinit, (L, d, E))
            self.rnet_b = self.param("rnet_b", tlayers.torch_bias_init(d),
                                     (L, E))

        self.pnet = MPNet(self.dims, jump=2)
        self.mlpgate_w = self.param("mlpgate_w", kinit, (d, 1))
        self.mlpgate_b = self.param("mlpgate_b", tlayers.torch_bias_init(d),
                                    (1,))
        self.mlp1 = tlayers.Dense(d * 4, d, name="mlp1")
        self.mlp2 = tlayers.Dense(d, d * 4, name="mlp2")
        self.mlp_ln_scale = self.param("mlp_ln_scale", nn.initializers.ones,
                                       (d,))
        self.mlp_ln_bias = self.param("mlp_ln_bias", nn.initializers.zeros,
                                      (d,))

    def _v_gate(self, x, idx):
        d = self.dims
        key = jax.nn.softmax(
            jnp.einsum("bcd,md->bcm", l2norm(x), l2norm(self.mkey[idx]))
            / math.sqrt(d), axis=-1)
        mem_score = jnp.einsum("bcm,mo->bco", key, self.mval[idx])
        h = nn.silu(x @ self.vmlp1_w[idx] + self.vmlp1_b[idx])
        mlp_score = h @ self.vmlp2_w[idx] + self.vmlp2_b[idx]
        both = jnp.concatenate([mem_score, mlp_score], axis=-1)
        x_val = both @ self.vcat_w[idx] + self.vcat_b[idx]
        smask = ste_threshold(x_val, self.thresh)
        return smask, x_val

    @staticmethod
    def update_threshold(tx, loss, cema, lr=0.01):
        """v_gate threshold adaptation (parity: model.py:353-358, never
        called by the reference's loop): lower the STE threshold when
        loss exceeds its EMA, raise it otherwise; clamp [0.05, 0.95].
        Functional form — returns the new threshold (a device scalar to
        be fed back in, keeping the jitted step recompile-free)."""
        tx = jnp.where(loss > cema, tx - lr, tx + lr)
        return jnp.clip(tx, 0.05, 0.95)

    def _ranvier(self, x, idx):
        if not self.mini_hc:
            return x
        feats = jnp.einsum("bcd,edf->bcef", x, self.par_w[idx]) \
            + self.par_b[idx]
        wts = jax.nn.softmax(x @ self.rnet_w[idx] + self.rnet_b[idx], -1)
        return nn.relu(jnp.einsum("bcef,bce->bcf", feats, wts))

    def __call__(self, x: jnp.ndarray, valid: Optional[jnp.ndarray] = None,
                 streaming: bool = False) -> Tuple[jnp.ndarray, dict]:
        """``streaming=True`` makes every output position a function of
        input positions <= t only: the working memory becomes a
        per-position causal running mean (B, T, d) instead of a global
        pooled (B, 1, d), and the scalar control signals (jump-policy
        input, forced-skip potential) are computed from position 0's
        state — the only position whose representation is invariant to
        the prefix length, so jump actions are identical at every
        decode step and between training and free-running decode."""
        L = self.layer
        b, ctx, d = x.shape
        orig_x = x
        mem_t = ctx if streaming else 1
        mem_w0 = jnp.broadcast_to(self.mem_w, (b, mem_t, d))

        if streaming:
            pooled = x[:, 0]                                 # (b, d), causal
        else:
            pooled = _masked_mean(x, valid, axis=1)[:, 0]    # (b, d)
        policy = self.pnet(pooled)                           # (b, 3)
        policy_mean = _ctx_pmean(jnp.mean(policy, axis=0))   # (3,) == policy[0] at B=1

        if self.has_rng("gumbel"):
            keys = jax.random.split(self.make_rng("gumbel"), L)
        else:
            keys = None

        # decode hot path: the whole layer-slot recurrence as ONE
        # Pallas program (ops/pallas/sheath_kernel.py) — eval-only
        # (keys=None makes every STE exact and the jump gate 1),
        # non-streaming, decoder configuration (mini_hc=False).  The
        # kernel keeps x, its scratch carry, and every weight resident
        # in VMEM, so it is gated to prefix-sized inputs (the per-step
        # decode buffer); encoder-length calls (the once-per-utterance
        # cross-KV precompute, N ~ batch*1000 frames) stay on XLA —
        # they are matmul-shaped and not dispatch-bound.
        # size bound: the kernel holds two (N, D) f32 temps (x carry +
        # the v_gate MLP hidden) plus ~4 MB of weights in ~16 MB VMEM.
        # 400k elements is the measured general bound; decode-traced
        # calls (utils.in_decode_tracing) extend to 1M elements (8 MB
        # of temps) so B=64's small/medium prefix buckets keep the
        # kernel — at B=64 the widest buckets (N*D > 1M) still fall
        # back, which is the remaining per-row gap vs B=8
        # (docs/BENCH_NOTES.md round 5).
        from asr_model_tpu.utils import in_decode_tracing
        size_ok = x.size <= 400_000 or (in_decode_tracing()
                                        and x.size <= 1_000_000)
        if keys is None and not streaming and not self.mini_hc \
                and d % 128 == 0 and size_ok \
                and not _BATCH_PMEAN and _pallas_sheath_enabled():
            x, jstat, actions = self._fused_scan(x, valid, policy_mean)
        else:
            x, jstat, actions = self._xla_scan(
                x, orig_x, mem_w0, valid, policy_mean, keys, streaming)

        gate = nn.sigmoid(x @ self.mlpgate_w + self.mlpgate_b)
        h = _layer_norm(x, self.mlp_ln_scale, self.mlp_ln_bias)
        output = self.mlp2(nn.silu(self.mlp1(h)))
        x = x + gate * output
        # surfaced for the train loop's Jumps/* counters (SURVEY §5.5)
        self.sow("intermediates", "jstat", jstat)
        return x, {"jstat": jstat, "actions": actions}

    def init_stream_state(self, batch: int):
        """Zero state for ``stream_step``: per-scan-step running sums
        of x_new (the incremental form of the streaming causal mean),
        the position count, and the position-0-decided jump actions."""
        L, d = self.layer, self.dims
        return {"sums": jnp.zeros((L, batch, d), jnp.float32),
                "count": jnp.zeros((), jnp.int32),
                "actions": jnp.zeros((L,), jnp.int32)}

    def stream_step(self, x_t: jnp.ndarray, state: dict):
        """One-position streaming-causal MSheath (eval only).

        Processes (B, 1, D) — the newest decode position — carrying
        exactly the state the streaming buffer path derives from the
        full prefix: the causal running mean per executed scan step
        (``sums``/``count``; _causal_mean is cumulative sums in f32,
        reproduced as running sums here) and the jump-action sequence,
        which the streaming variant pins to position 0 (``__call__``
        docstring) — computed live at count==0 and replayed after.
        Returns (y_t, new_state); numerics equal ``__call__(prefix,
        streaming=True)[:, -1]`` by induction over positions."""
        L = self.layer
        b = x_t.shape[0]
        orig_x = x_t
        count = state["count"]
        first = count == 0

        # position-0 policy: only consulted when count == 0
        policy = self.pnet(x_t[:, 0])
        policy_mean = jnp.mean(policy, axis=0)
        sampled = jnp.argmax(policy_mean).astype(jnp.int32)

        mem_w = jnp.broadcast_to(self.mem_w, (b, 1, self.dims)) \
            .astype(x_t.dtype)

        def body(carry, step):
            x, mem_w, i, sums, jstat = carry
            active = i < L
            idx = jnp.minimum(i, L - 1)

            ion, _ = self._v_gate(x, idx)
            px = _layer_norm(x, self.ln_scale[idx], self.ln_bias[idx])
            a_idx = idx // 2
            adapted = px @ self.adapt_w[a_idx] + self.adapt_b[a_idx]
            apx = jnp.where(idx % 2 == 0, adapted, px)
            out = self._ranvier(apx, idx)
            g_val = nn.sigmoid(px @ self.gate_w[idx] + self.gate_b[idx])
            x_new = x + g_val * (out * ion)

            # causal running mean at this position (f32 running sums,
            # like _causal_mean's f32 cumulative sums; the mean is then
            # cast to x.dtype exactly like the buffer path)
            row = sums[step] + x_new[:, 0].astype(jnp.float32)
            mem = (row / (count + 1).astype(jnp.float32))[:, None] \
                .astype(x.dtype)
            mem_v = nn.sigmoid(mem @ self.memgate_w + self.memgate_b)
            mem_w_new = mem_v * mem_w + (1 - mem_v) * mem

            # jump action: live at position 0, replayed afterwards
            potential = jnp.mean(ion[:, 0])
            last = i >= L - 1
            forced = (potential < 0.1) & ~last
            live = jnp.where(last, 0,
                             jnp.where(forced, 1, sampled)).astype(jnp.int32)
            action = jnp.where(first, live, state["actions"][step])

            jump_w = jnp.take(self.jump_s, jnp.clip(action - 1, 0, 2))
            jump_i = jump_w * orig_x + (1 - jump_w) * mem_w_new
            x_out = jnp.where(action > 0, x_new + jump_i, x_new)
            i_next = jnp.where(action > 0,
                               jnp.minimum(i + action + 1, L), i + 1)

            x_c = jnp.where(active, x_out, x).astype(x.dtype)
            mem_c = jnp.where(active, mem_w_new, mem_w) \
                .astype(mem_w.dtype)
            sums_c = sums.at[step].set(jnp.where(active, row, sums[step]))
            i_c = jnp.where(active, i_next, i)
            jstat_c = jstat + jnp.where(
                active, jax.nn.one_hot(action, 3, dtype=jstat.dtype) * b, 0)
            return (x_c, mem_c, i_c, sums_c, jstat_c), action

        init = (x_t, mem_w, jnp.asarray(0, jnp.int32), state["sums"],
                jnp.zeros(3, jnp.int32))
        (x, _m, _i, sums, jstat), actions = jax.lax.scan(
            body, init, jnp.arange(L))

        gate = nn.sigmoid(x @ self.mlpgate_w + self.mlpgate_b)
        h = _layer_norm(x, self.mlp_ln_scale, self.mlp_ln_bias)
        x = x + gate * self.mlp2(nn.silu(self.mlp1(h)))
        new_state = {"sums": sums, "count": count + 1,
                     "actions": jnp.where(first, actions,
                                          state["actions"])}
        return x, new_state

    def _fused_scan(self, x, valid, policy_mean):
        from asr_model_tpu.ops.pallas.sheath_kernel import fused_sheath_scan

        b, ctx, d = x.shape
        f32 = jnp.float32
        m = (jnp.ones((b, ctx), f32) if valid is None
             else valid.astype(f32))
        n_b = jnp.maximum(jnp.sum(m, axis=1, keepdims=True), 1.0)
        eye = jnp.eye(b, dtype=f32)
        pool_w = (eye[:, :, None] * (m / n_b)[None]).reshape(b, b * ctx)
        bcast = jnp.repeat(eye, ctx, axis=0)                # (b*ctx, b)
        pot_w = (m / jnp.maximum(jnp.sum(m), 1.0)).reshape(1, b * ctx)
        weights = {
            "ln_scale": self.ln_scale, "ln_bias": self.ln_bias,
            "gate_w": self.gate_w[..., 0], "gate_b": self.gate_b,
            "mkey": self.mkey, "mval": self.mval[..., 0],
            "vmlp1_w": self.vmlp1_w, "vmlp1_b": self.vmlp1_b,
            "vmlp2_w": self.vmlp2_w[..., 0], "vmlp2_b": self.vmlp2_b,
            "vcat_w": self.vcat_w[..., 0], "vcat_b": self.vcat_b,
            "adapt_w": self.adapt_w, "adapt_b": self.adapt_b,
            "memgate_w": self.memgate_w.reshape(1, d),
            "memgate_b": self.memgate_b.reshape(1, 1),
        }
        # the kernel computes in f32, and the per-slot stacks are read
        # with a DYNAMIC leading index (the jump-dependent slot) —
        # Mosaic cannot prove sublane alignment for dynamically-indexed
        # packed (bf16) rows, so the (small) stacks go in as f32
        weights = {k: v.astype(jnp.float32) for k, v in weights.items()}
        xk, actions, jstat = fused_sheath_scan(
            x.reshape(b * ctx, d), pool_w, bcast, pot_w,
            self.mem_w.reshape(1, d),
            jnp.argmax(policy_mean).astype(jnp.int32), self.jump_s,
            weights, L=self.layer, thresh=self.thresh,
            interpret=default_platform() != "tpu")
        return xk.reshape(b, ctx, d), jstat, actions

    def _xla_scan(self, x, orig_x, mem_w0, valid, policy_mean, keys,
                  streaming):
        L = self.layer
        b = x.shape[0]

        def body(carry, step):
            x, mem_w, i, jstat = carry
            active = i < L
            idx = jnp.minimum(i, L - 1)

            ion, _ = self._v_gate(x, idx)                    # (b, ctx, 1)
            px = _layer_norm(x, self.ln_scale[idx], self.ln_bias[idx])
            a_idx = idx // 2
            adapted = px @ self.adapt_w[a_idx] + self.adapt_b[a_idx]
            apx = jnp.where(idx % 2 == 0, adapted, px)
            out = self._ranvier(apx, idx)
            g_val = nn.sigmoid(px @ self.gate_w[idx] + self.gate_b[idx])
            x_new = x + g_val * (out * ion)

            if streaming:
                mem = _causal_mean(x_new, valid)             # (b, ctx, d)
            else:
                mem = _masked_mean(x_new, valid, axis=1)     # (b, 1, d)
            mem_v = nn.sigmoid(mem @ self.memgate_w + self.memgate_b)
            mem_w_new = mem_v * mem_w + (1 - mem_v) * mem

            if streaming:
                potential = _ctx_pmean(jnp.mean(ion[:, 0]))  # position 0 only
            elif valid is None:
                potential = _ctx_pmean(jnp.mean(ion))
            elif _BATCH_PMEAN:
                # masked global mean across shards: shards may hold
                # different valid counts, so combine sums and counts
                # (pmean of per-shard ratios would be biased)
                m = valid.astype(ion.dtype)[..., None]
                s = _ctx_psum(jnp.sum(ion * m))
                n = _ctx_psum(jnp.sum(m))
                potential = s / jnp.maximum(n, 1.0)
            else:
                potential = _masked_mean(ion, valid, axis=(0, 1, 2))[0, 0, 0]

            last = i >= L - 1
            forced = (potential < 0.1) & ~last
            key = keys[step] if keys is not None else None
            jump = gumbel_softmax(key, policy_mean, tau=1.0, hard=True)
            # int32 even under x64 (argmax yields int64 there, which
            # would change the scan carry dtype)
            sampled = jnp.argmax(jump, axis=-1).astype(jnp.int32)
            action = jnp.where(last, 0, jnp.where(forced, 1, sampled))
            jump_g = jnp.where(forced | last, 1.0,
                               jnp.take(jump, sampled))

            jump_w = jnp.take(self.jump_s,
                              jnp.clip(action - 1, 0, 2))
            jump_i = jump_w * orig_x + (1 - jump_w) * mem_w_new
            x_jumped = x_new + jump_i * jump_g
            x_kept = x_new * jump_g
            x_out = jnp.where(action > 0, x_jumped, x_kept)

            i_next = jnp.where(action > 0,
                               jnp.minimum(i + action + 1, L), i + 1)
            jstat_new = jstat + jnp.where(
                active, jax.nn.one_hot(action, 3, dtype=jstat.dtype) * b, 0)

            # keep carry dtypes stable (bf16 inference mode)
            x_c = jnp.where(active, x_out, x).astype(x.dtype)
            mem_c = jnp.where(active, mem_w_new, mem_w).astype(mem_w.dtype)
            i_c = jnp.where(active, i_next, i)
            return (x_c, mem_c, i_c, jstat_new), action

        init = (x, mem_w0, jnp.asarray(0, jnp.int32),
                jnp.zeros(3, jnp.int32))
        body_fn = jax.checkpoint(body) if _SCAN_REMAT[0] else body
        (x, mem_w, _, jstat), actions = jax.lax.scan(
            body_fn, init, jnp.arange(L))
        return x, jstat, actions
