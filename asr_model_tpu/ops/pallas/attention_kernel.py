"""Flash attention Pallas TPU kernel.

Role: the fused SDPA for the hot attention path (SURVEY §2.4: PyTorch
SDPA/cuDNN becomes XLA ops + a fused Pallas kernel).  Online-softmax
(flash) tiling over the KV axis: the (Tq, Tk) score matrix never
materializes in HBM; running max/sum and the output accumulator live in
VMEM scratch across KV tiles.

Supports the model's two uses: causal decoder self-attention and
masked cross/self attention with a per-batch KV validity mask (the
static-shape decode buffer).  Inputs (B, H, Tq, D) / (B, H, Tk, D),
f32 or bf16; D padded to the 128-lane register width by the caller if
needed (the flagship head_dim is 128).

Falls back to interpret mode off-TPU; ``attention.sdpa`` routes here
when shapes are tile-friendly on TPU.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from asr_model_tpu.utils import default_platform
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30

# Tile sizes tuned on a v5e chip (2026-08): 256x512 beats 128x128 by
# ~2-3x (fewer grid steps amortize per-step overhead) and runs at or
# ahead of XLA's fused attention on the model's hot shapes (bf16/f32,
# T 1024-4096, D 128).
BLOCK_Q = 256
BLOCK_K = 512


def _flash_kernel(q_ref, k_ref, v_ref, valid_ref, o_ref,
                  m_scr, l_scr, acc_scr, *,
                  causal: bool, scale: float, block_q: int, block_k: int,
                  kv_len: int, use_valid: bool):
    """Grid: (batch*heads, q_blocks, k_blocks); k is the innermost
    (fastest) dim so scratch accumulators carry across k steps.

    For causal attention, KV blocks that lie entirely above the diagonal
    of a Q block are skipped (no matmul issued) — the grid still steps
    through them, but only the (cheap) predicated branch runs, roughly
    halving the causal FLOPs."""
    kb = pl.program_id(2)
    nk = pl.num_programs(2)
    qb = pl.program_id(1)

    @pl.when(kb == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    if causal:
        # last KV block this Q block can see: its rows reach q_id
        # qb*block_q + block_q - 1, so KV blocks starting beyond that
        # contribute nothing.
        last_kb = jnp.minimum(nk - 1,
                              (qb * block_q + block_q - 1) // block_k)
    else:
        last_kb = nk - 1
    live = kb <= last_kb

    @pl.when(live)
    def _body():
        q = q_ref[0]                              # (BLOCK_Q, D)
        k = k_ref[0]                              # (BLOCK_K, D)
        v = v_ref[0]

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale   # (BQ, BK)

        q_ids = qb * block_q + jax.lax.broadcasted_iota(
            jnp.int32, s.shape, 0)
        k_ids = kb * block_k + jax.lax.broadcasted_iota(
            jnp.int32, s.shape, 1)
        mask = k_ids < kv_len
        if causal:
            mask &= k_ids <= q_ids
        if use_valid:
            kv_ok = valid_ref[0, 0]               # (BLOCK_K,)
            mask &= kv_ok[None, :] > 0
        s = jnp.where(mask, s, NEG_INF)

        m_prev = m_scr[:]                         # (BQ, 1)
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        # guard fully-masked rows
        m_safe = jnp.where(m_new <= NEG_INF, 0.0, m_new)
        p = jnp.exp(s - m_safe)
        p = jnp.where(mask, p, 0.0)
        alpha = jnp.where(m_prev <= NEG_INF, 0.0,
                          jnp.exp(m_prev - m_safe))

        l_new = alpha * l_scr[:] + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc_scr[:] * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

        m_scr[:] = m_new
        l_scr[:] = l_new
        acc_scr[:] = acc

    @pl.when(kb == last_kb)
    def _finalize():
        denom = jnp.maximum(l_scr[:], 1e-30)
        o_ref[0] = (acc_scr[:] / denom).astype(o_ref.dtype)


def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    causal: bool = False,
                    kv_valid: jnp.ndarray | None = None,
                    scale: float | None = None,
                    interpret: bool | None = None) -> jnp.ndarray:
    """(B, H, Tq, D) x (B, H, Tk, D) -> (B, H, Tq, D); numerics match
    softmax(q k^T * scale) v with optional causal + kv-validity
    masking.  Tq/Tk padded to tile multiples internally."""
    if interpret is None:
        interpret = default_platform() != "tpu"
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])

    b, h, tq, d = q.shape
    tk = k.shape[2]
    bq = min(BLOCK_Q, max(8, tq))
    bk = min(BLOCK_K, max(8, tk))
    tq_p = -(-tq // bq) * bq
    tk_p = -(-tk // bk) * bk

    qp = jnp.pad(q, ((0, 0), (0, 0), (0, tq_p - tq), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, tk_p - tk), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, tk_p - tk), (0, 0)))
    qp = qp.reshape(b * h, tq_p, d)
    kp = kp.reshape(b * h, tk_p, d)
    vp = vp.reshape(b * h, tk_p, d)

    use_valid = kv_valid is not None
    if use_valid:
        vmask = jnp.pad(kv_valid.astype(jnp.int32),
                        ((0, 0), (0, tk_p - tk)))
        vmask = jnp.repeat(vmask, h, axis=0)      # (B*H, Tk_p)
    else:
        vmask = jnp.ones((b * h, tk_p), jnp.int32)
    vmask = vmask[:, None, :]                     # (B*H, 1, Tk_p): tile-legal

    grid = (b * h, tq_p // bq, tk_p // bk)

    out = pl.pallas_call(
        functools.partial(_flash_kernel, causal=causal, scale=scale,
                          block_q=bq, block_k=bk, kv_len=tk,
                          use_valid=use_valid),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda bh, qb, kb: (bh, qb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda bh, qb, kb: (bh, kb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda bh, qb, kb: (bh, kb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bk), lambda bh, qb, kb: (bh, 0, kb),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda bh, qb, kb: (bh, qb, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, tq_p, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, d), jnp.float32),
        ],
        interpret=interpret,
    )(qp, kp, vp, vmask)

    return out.reshape(b, h, tq_p, d)[:, :, :tq]
