"""Sequence-parallel attention (SP/CP, SURVEY §2.5 item 4).

For long-form audio the encoder output (the decoder's cross-attention
KV) can exceed a chip's comfortable tile.  ``seq_sharded_attention``
shards the KV time axis over the mesh's 'seq' axis with ``shard_map``:
each device computes partial online-softmax statistics (running max,
normalizer, weighted values) over its KV shard and the partials merge
with pmax/psum over ICI — the distributed form of flash attention's
tile merge.  Queries are replicated (decoder prefixes are short);
output == unsharded softmax attention exactly (up to f32 rounding).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map


def seq_sharded_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                          mesh: Mesh, axis: str = "seq",
                          kv_valid: jnp.ndarray | None = None
                          ) -> jnp.ndarray:
    """(B,H,Tq,D) x (B,H,Tk,D) -> (B,H,Tq,D); Tk sharded over ``axis``.

    kv_valid: optional (B, Tk) bool mask (sharded with k/v).
    """
    scale = 1.0 / math.sqrt(q.shape[-1])
    use_valid = kv_valid is not None
    if not use_valid:
        kv_valid = jnp.ones(k.shape[:1] + k.shape[2:3], bool)

    def local(q, k, v, valid):
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
        s = jnp.where(valid[:, None, None, :], s, -jnp.inf)
        m = jnp.max(s, axis=-1, keepdims=True)              # local max
        m_g = jax.lax.pmax(m, axis)                         # global max
        m_safe = jnp.where(jnp.isfinite(m_g), m_g, 0.0)
        p = jnp.where(jnp.isfinite(s), jnp.exp(s - m_safe), 0.0)
        l = jnp.sum(p, axis=-1, keepdims=True)
        acc = jnp.einsum("bhqk,bhkd->bhqd", p, v)
        l_g = jax.lax.psum(l, axis)
        acc_g = jax.lax.psum(acc, axis)
        return acc_g / jnp.maximum(l_g, 1e-30)

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(None, None, axis, None),
                  P(None, None, axis, None), P(None, axis)),
        out_specs=P(),
        check_vma=False)
    return fn(q, k, v, kv_valid)
