"""Fused MSheath scan — one Pallas program for the decode hot path.

Parity target: models/sheath.py:MSheath.__call__'s ``lax.scan`` over
``layer`` slots (itself the TPU redesign of the reference's Python
while-loop, model.py:430-470).  At eval (no gumbel rng, non-streaming)
every straight-through estimator reduces to its hard forward value and
the jump gate is exactly 1, so the whole scan is a deterministic
recurrence of ~40 small ops per layer slot: v_gate (memory-bank match
+ scoring MLP + threshold), layer norm, even-slot adapter, skip gate,
working-memory EMA, and the scalar jump policy.  XLA runs those as
dozens of separate kernels per decode step (BENCH_NOTES: the decode
loop is dispatch-bound, not MXU-bound); this kernel runs the full
L-slot recurrence in one program with every weight resident in VMEM.

Batch-pooled statistics (the working memory and the forced-skip
potential) become two tiny matmuls against precomputed pooling
matrices, so the kernel needs no segment reductions:

  mem[b]    = pool_w[b, :] @ x_new         (masked per-batch mean)
  rows      = bcast @ mem_w                (broadcast back per row)
  potential = pot_w @ ion                  (global masked mean)

Scope (gated in models/sheath.py): ``mini_hc=False`` (the decoder's
configuration — the r_node variant keeps the XLA path), non-streaming,
no gumbel rng.  All arithmetic runs in f32 inside the kernel
regardless of the storage dtype; outputs are cast back.

The jump policy's sampled action (argmax of the batch-mean MPNet
policy — deterministic at eval) is computed by the caller and enters
as a scalar, because it depends on a flax submodule.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _f32(v):
    return v.astype(jnp.float32)


def _kernel(sampled_ref, jump_s_ref,                       # SMEM scalars
            x_ref, pool_w_ref, bcast_ref, pot_w_ref, mem0_ref,
            ln_scale_ref, ln_bias_ref, gate_w_ref, gate_b_ref,
            mkey_ref, mval_ref, vmlp1_w_ref, vmlp1_b_ref,
            vmlp2_w_ref, vmlp2_b_ref, vcat_w_ref, vcat_b_ref,
            adapt_w_ref, adapt_b_ref, memgate_w_ref, memgate_b_ref,
            out_ref, actions_ref, jstat_ref,
            x_s, mem_s, i_s,
            *, L: int, thresh: float, batch: int):
    D = x_ref.shape[1]

    x_s[:] = _f32(x_ref[:])
    mem_s[:] = jnp.broadcast_to(_f32(mem0_ref[:]), (batch, D))
    i_s[0] = 0
    for a in range(3):
        jstat_ref[0, a] = 0

    memgate_w = _f32(memgate_w_ref[:])                     # (1, D)
    memgate_b = _f32(memgate_b_ref[:])[0, 0]
    sampled = sampled_ref[0, 0]

    inv_sqrt_d = 1.0 / (D ** 0.5)

    def row(ref, idx):
        """(1, X) f32 slice of a (L, X) VMEM ref at a traced index."""
        return _f32(ref[pl.ds(idx, 1), :])

    def body(step, _):
        i = i_s[0]
        active = i < L
        idx = jnp.minimum(i, L - 1)
        x = x_s[:]                                         # (N, D) f32
        mem_w = mem_s[:]                                   # (B, D) f32

        # ---- v_gate: memory-bank match + scoring MLP -> STE threshold
        xn = x * jax.lax.rsqrt(
            jnp.maximum(jnp.sum(x * x, axis=-1, keepdims=True), 1e-24))
        mk = _f32(mkey_ref[idx])                           # (M, D)
        mkn = mk * jax.lax.rsqrt(
            jnp.maximum(jnp.sum(mk * mk, axis=-1, keepdims=True), 1e-24))
        logits = jax.lax.dot_general(
            xn, mkn, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * inv_sqrt_d   # (N, M)
        key = jax.nn.softmax(logits, axis=-1)
        mem_score = jnp.sum(key * row(mval_ref, idx), axis=-1,
                            keepdims=True)                 # (N, 1)
        h = jax.nn.silu(
            jnp.dot(x, _f32(vmlp1_w_ref[idx]),
                    preferred_element_type=jnp.float32)
            + row(vmlp1_b_ref, idx))                       # (N, D2)
        mlp_score = jnp.sum(h * row(vmlp2_w_ref, idx), axis=-1,
                            keepdims=True) \
            + row(vmlp2_b_ref, idx)[0, 0]                  # (N, 1)
        vc = row(vcat_w_ref, idx)                          # (1, 2)
        x_val = mem_score * vc[0, 0] + mlp_score * vc[0, 1] \
            + row(vcat_b_ref, idx)[0, 0]
        ion = (x_val > thresh).astype(jnp.float32)         # (N, 1)

        # ---- layer norm + even-slot adapter + skip gate
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean((x - mu) * (x - mu), axis=-1, keepdims=True)
        px = (x - mu) * jax.lax.rsqrt(var + 1e-5) \
            * row(ln_scale_ref, idx) + row(ln_bias_ref, idx)
        a_idx = idx // 2
        adapted = jnp.dot(px, _f32(adapt_w_ref[a_idx]),
                          preferred_element_type=jnp.float32) \
            + row(adapt_b_ref, a_idx)
        apx = jnp.where(idx % 2 == 0, adapted, px)         # mini_hc=False
        g_val = jax.nn.sigmoid(
            jnp.sum(px * row(gate_w_ref, idx), axis=-1, keepdims=True)
            + row(gate_b_ref, idx)[0, 0])
        x_new = x + g_val * (apx * ion)

        # ---- working memory EMA (batch-pooled via matmul)
        mem = jax.lax.dot_general(
            _f32(pool_w_ref[:]), x_new, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)            # (B, D)
        mem_v = jax.nn.sigmoid(
            jnp.sum(mem * memgate_w, axis=-1, keepdims=True)
            + memgate_b)                                   # (B, 1)
        mem_w_new = mem_v * mem_w + (1.0 - mem_v) * mem

        # ---- scalar jump policy (deterministic at eval: jump gate = 1)
        potential = jax.lax.dot_general(
            _f32(pot_w_ref[:]), ion, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)[0, 0]
        last = i >= L - 1
        forced = (potential < 0.1) & ~last
        action = jnp.where(last, 0, jnp.where(forced, 1, sampled))
        jump_w = jump_s_ref[0, jnp.clip(action - 1, 0, 2)]
        rows = jax.lax.dot_general(
            _f32(bcast_ref[:]), mem_w_new, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)            # (N, D)
        jump_i = jump_w * _f32(x_ref[:]) + (1.0 - jump_w) * rows
        x_out = jnp.where(action > 0, x_new + jump_i, x_new)
        i_next = jnp.where(action > 0,
                           jnp.minimum(i + action + 1, L), i + 1)

        x_s[:] = jnp.where(active, x_out, x)
        mem_s[:] = jnp.where(active, mem_w_new, mem_w)
        i_s[0] = jnp.where(active, i_next, i)
        actions_ref[0, step] = action
        for a in range(3):
            jstat_ref[0, a] = jstat_ref[0, a] + jnp.where(
                active & (action == a), batch, 0)
        return 0

    jax.lax.fori_loop(0, L, body, 0)
    out_ref[:] = x_s[:].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("L", "thresh", "interpret"))
def fused_sheath_scan(x2, pool_w, bcast, pot_w, mem0, sampled, jump_s,
                      weights: dict, L: int, thresh: float,
                      interpret: bool = False):
    """Run the MSheath layer-slot recurrence as one Pallas program.

    ``x2``: (N, D) flattened (batch*ctx) input; ``pool_w`` (B, N) /
    ``bcast`` (N, B) / ``pot_w`` (1, N): pooling matrices (see module
    docstring); ``mem0`` (1, D): the mem_w parameter; ``sampled``: ()
    int32 argmax of the batch-mean jump policy; ``jump_s``: (3,) jump
    interpolation weights; ``weights``: the per-slot parameter stack
    with trailing singleton axes squeezed (see models/sheath.py).

    Returns (x_out (N, D), actions (L,), jstat (3,))."""
    N, D = x2.shape
    B = pool_w.shape[0]

    kernel = functools.partial(_kernel, L=L, thresh=float(thresh),
                               batch=B)
    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    w = weights
    out, actions, jstat = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((N, D), x2.dtype),
                   jax.ShapeDtypeStruct((1, L), jnp.int32),
                   jax.ShapeDtypeStruct((1, 3), jnp.int32)),
        in_specs=[smem(), smem()] + [vmem()] * 21,
        out_specs=(vmem(), smem(), smem()),
        scratch_shapes=[
            pltpu.VMEM((N, D), jnp.float32),
            pltpu.VMEM((B, D), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
        ],
        interpret=interpret,
    )(jnp.asarray(sampled, jnp.int32).reshape(1, 1),
      jnp.asarray(jump_s, jnp.float32).reshape(1, 3),
      x2, pool_w, bcast, pot_w, mem0,
      w["ln_scale"], w["ln_bias"], w["gate_w"], w["gate_b"],
      w["mkey"], w["mval"], w["vmlp1_w"], w["vmlp1_b"],
      w["vmlp2_w"], w["vmlp2_b"], w["vcat_w"], w["vcat_b"],
      w["adapt_w"], w["adapt_b"], w["memgate_w"], w["memgate_b"])
    return out, actions[0], jstat[0]
