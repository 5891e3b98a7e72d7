"""Mixture-of-experts MLP with expert parallelism (EP).

Capability beyond the reference (which has no MoE — its ``router``
model.py:537-557 mixes *modalities*, not experts): an optional
sparse-expert replacement for the residual block's dense MLP
(model.py:573-574), designed TPU-first:

* **Dense dispatch, static shapes.** GShard-style capacity routing —
  per example, each token's top-k experts get a slot in a fixed
  ``(E, C)`` buffer; dispatch/combine are one-hot einsums (MXU work,
  no gathers/scatters, no data-dependent shapes), so the whole layer
  jits into one fused program.
* **Per-example capacity.** Slots are allocated within each example
  (not across the batch), so a token's routing never depends on other
  examples — batched and single-example runs are numerics-identical,
  and DP sharding of the batch axis cannot change results.
* **Expert parallelism.** Expert weights carry a leading ``E`` axis
  (``nn.vmap`` over an ``ExpertFFN``) that shards over an ``expert``
  mesh axis (parallel/sharding.py EP_RULES); under the SPMD
  partitioner the dispatch einsum becomes the all-to-all over ICI and
  each chip runs only its local experts.
* **Load-balance aux loss** (Switch-transformer form) sown into the
  ``intermediates`` collection; the train step folds it into the loss
  with weight ``ModelConfig.moe_aux_weight``.

Enabled via ``ModelConfig.moe_experts > 0``; the expert FFN mirrors the
dense MLP it replaces (d -> num_types*d -> d, same activation), so at
capacity_factor -> inf and E=1 the layer degenerates to the dense pair.

Caveat: capacity is a function of the sequence length seen by the
layer, so the O(1)-per-token incremental decode (which feeds T=1
slices) is not slot-exact vs the buffer decode for tokens that would
overflow an expert's buffer-length capacity; with right-padded batches
real tokens always claim slots before pad positions (token-major
cumsum), so padding never steals capacity from real tokens.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from asr_model_tpu.models import tlayers
from asr_model_tpu.models.registry import get_activation


class ExpertFFN(nn.Module):
    """One expert: the residual MLP's Dense(d,h) -> act -> Dense(h,d)
    pair (model.py:573-574 shape)."""

    dims: int
    hidden: int
    act: str

    @nn.compact
    def __call__(self, x):
        h = tlayers.Dense(self.hidden, self.dims, name="w_in")(x)
        h = get_activation(self.act)(h)
        return tlayers.Dense(self.dims, self.hidden, name="w_out")(h)


def expert_capacity(seq_len: int, num_experts: int, top_k: int,
                    capacity_factor: float) -> int:
    """Static per-example expert capacity C."""
    c = math.ceil(seq_len * top_k / num_experts * capacity_factor)
    return max(1, min(int(c), seq_len))


class MoEMLP(nn.Module):
    """Top-k routed mixture of ``num_experts`` FFNs, capacity-based
    dense dispatch (static shapes), per-example slot allocation."""

    dims: int
    hidden: int
    num_experts: int
    top_k: int = 2
    capacity_factor: float = 1.25
    act: str = "gelu"

    @nn.compact
    def __call__(self, x):
        B, T, d = x.shape
        E, k = self.num_experts, min(self.top_k, self.num_experts)
        C = expert_capacity(T, E, k, self.capacity_factor)

        # router: f32 softmax regardless of compute dtype (tiny, and
        # routing decisions should not flip with bf16 casts)
        logits = tlayers.Dense(E, d, name="router")(x)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        gate_vals, idx = jax.lax.top_k(probs, k)             # (B, T, k)
        gate_vals = gate_vals / jnp.maximum(
            jnp.sum(gate_vals, axis=-1, keepdims=True), 1e-9)

        # slot allocation: flatten the (T, k) assignments token-major
        # (all of token t's choices precede token t+1's) and take a
        # per-example running count per expert; assignments past C drop
        hot = jax.nn.one_hot(idx, E, dtype=jnp.float32)      # (B, T, k, E)
        hot_flat = hot.reshape(B, T * k, E)
        pos = jnp.cumsum(hot_flat, axis=1) * hot_flat - 1.0  # slot index
        keep = (pos < C) * hot_flat                          # (B, Tk, E)
        slot_hot = jax.nn.one_hot(
            jnp.clip(pos, 0, C - 1).astype(jnp.int32), C,
            dtype=jnp.float32) * keep[..., None]             # (B, Tk, E, C)
        slot_hot = slot_hot.reshape(B, T, k, E, C)
        dispatch = jnp.sum(slot_hot, axis=2)                 # (B, T, E, C)
        combine = jnp.sum(
            slot_hot * gate_vals[..., None, None], axis=2)   # (B, T, E, C)

        # load-balance aux (Switch eq. 4): E * sum_e f_e * P_e, where
        # f_e = fraction of (token, slot) assignments routed to e and
        # P_e = mean router probability of e
        f = jnp.mean(hot, axis=(0, 1, 2))                    # (E,)
        p = jnp.mean(probs, axis=(0, 1))                     # (E,)
        self.sow("intermediates", "moe_aux", E * jnp.sum(f * p))

        experts = nn.vmap(
            ExpertFFN,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            in_axes=1, out_axes=1,
            axis_size=E)(self.dims, self.hidden, self.act, name="experts")

        dispatch = dispatch.astype(x.dtype)
        combine = combine.astype(x.dtype)
        expert_in = jnp.einsum("btec,btd->becd", dispatch, x)
        expert_out = experts(expert_in)                      # (B, E, C, d)
        return jnp.einsum("btec,becd->btd", combine, expert_out)
