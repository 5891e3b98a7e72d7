"""Sequence parallelism (SP/CP, SURVEY §2.5 item 4 / §5.7).

Three pieces, composable end-to-end for long-form audio:

* ``sp_encode`` — the AudioEncoder over a time-sharded feature track.
  The conv stack is time-local (one-sided receptive field
  ``1 + 9*layer`` frames: stem k3, then per block wn-conv k3 +
  depthwise k15 + dw-conv k3), so overlap-discard is EXACT: one
  ``ppermute`` halo exchange per neighbor over ICI, local conv compute
  on (halo + shard + halo), discard the halos, add globally-offset
  sinusoidal positions.  Non-circular ppermute fills the outermost
  halos with zeros — exactly the unsharded SAME-pad semantics.
* ``seq_sharded_attention`` — distributed online-softmax over a
  KV-time-sharded attention: each device computes partial statistics
  (running max, normalizer, weighted values) over its KV shard and the
  partials merge with pmax/psum over ICI — the distributed form of
  flash attention's tile merge.  Queries are replicated (decoder
  prefixes are short); output == unsharded softmax attention exactly
  (up to f32 rounding).
* ``seq_sharding`` — a trace-time context that routes the decode
  loop's cached-KV cross-attention (models/attention.py) through
  ``seq_sharded_attention``, so a greedy decode traced inside the
  context runs every per-step cross-attention distributed over the
  'seq' axis.
"""

from __future__ import annotations

import contextlib
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


# ---------------------------------------------------------------------------
# trace-time seq-sharding context (consulted by models/attention.py)

_SEQ_CTX: list = []


@contextlib.contextmanager
def seq_sharding(mesh: Mesh, axis: str = "seq"):
    """While active, decode-path cached-KV cross-attention routes to
    ``seq_sharded_attention`` over ``mesh``/``axis``.  The context is
    consulted at TRACE time — wrap the jit/trace (e.g. the
    greedy_decode call), not the execution of an already-compiled
    function."""
    _SEQ_CTX.append((mesh, axis))
    try:
        yield
    finally:
        _SEQ_CTX.pop()


def active_seq_sharding():
    return _SEQ_CTX[-1] if _SEQ_CTX else None


# ---------------------------------------------------------------------------
# sequence-parallel encoder

def encoder_halo(layer: int) -> int:
    """One-sided receptive field of AudioEncoder's conv stack: stem k3
    (+1), per block wn k3 (+1) + ConvLite depthwise k15 (+7) + dw k3
    (+1)."""
    return 1 + 9 * layer


def sp_encode(model, variables, feature: jnp.ndarray, mesh: Mesh,
              axis: str = "seq", train: bool = False) -> jnp.ndarray:
    """Run ``model.enc`` on one (B, C, T) feature track with T sharded
    over ``mesh``'s ``axis``; returns (B, T, dims), numerically equal
    to the unsharded encoder (overlap-discard, halo >= receptive
    field).  Inference-only (BatchNorm running stats are position-
    independent; train-mode batch stats would need a psum).  Requires
    T divisible by the axis size and cfg.encoder_transformer=False
    (a global self-attention layer cannot be overlap-discarded).
    """
    if train:
        raise ValueError("sp_encode is inference-only")
    if getattr(model.cfg, "encoder_transformer", False):
        raise ValueError("sp_encode requires encoder_transformer=False "
                         "(global self-attention is not time-local)")
    if getattr(model.cfg, "encoder_norm", False):
        # encoder_norm applies out_norm/local_norm per POSITION for the
        # channel-axis norms; time-coupled norm types would need a
        # collective and are rejected (ADVICE r2: norm=True must be
        # numerically equal, not silently divergent)
        if model.param.n_type in ("instancenorm", "instancenorm2d",
                                  "groupnorm", "globalnorm"):
            raise ValueError(
                f"sp_encode with encoder_norm=True requires a "
                f"position-wise norm; {model.param.n_type!r} couples "
                f"positions across time")
    n = mesh.shape[axis]
    B, C, T = feature.shape
    if T % n != 0:
        raise ValueError(f"time axis {T} not divisible by '{axis}' size {n}")
    halo = encoder_halo(model.param.layer)
    t_local = T // n
    if t_local < halo:
        raise ValueError(f"shard length {t_local} < halo {halo}")

    from asr_model_tpu.ops.audio import sinusoids

    pe = sinusoids(T, model.param.dims, model.cfg.theta)

    def encode_chunk(variables, x_local, pe_full):
        idx = jax.lax.axis_index(axis)
        fwd = [(i, i + 1) for i in range(n - 1)]
        bwd = [(i + 1, i) for i in range(n - 1)]
        left = jax.lax.ppermute(x_local[..., -halo:], axis, fwd)
        right = jax.lax.ppermute(x_local[..., :halo], axis, bwd)
        ext = jnp.concatenate([left, x_local, right], axis=-1)
        # halo rows beyond the global sequence must act as SAME-pad
        # zeros at EVERY conv layer (biases/GLU/BN make nonzero
        # activations from zero inputs), so the encoder re-zeroes them
        # before each padded conv via this validity mask
        lv = jnp.broadcast_to(idx > 0, (halo,))
        rv = jnp.broadcast_to(idx < n - 1, (halo,))
        valid = jnp.concatenate(
            [lv, jnp.ones((t_local,), bool), rv])[None]
        valid = jnp.broadcast_to(valid, (B, halo + t_local + halo))
        # globally-offset PE rows for the EXTENDED shard, added inside
        # _process_feature so out_norm (encoder_norm=True) runs after
        # the position add exactly like the unsharded path; halo rows
        # get clamped positions — they are discarded below
        pos = jnp.clip(idx * t_local - halo
                       + jnp.arange(halo + t_local + halo), 0, T - 1)
        pe_ext = jnp.take(pe_full, pos, axis=0)
        y = model.apply(
            variables, ext,
            method=lambda mdl, f: mdl.enc._process_feature(
                f, train=False, pe=False, valid=valid,
                pe_override=pe_ext))
        return y[:, halo:halo + t_local]

    fn = shard_map(
        encode_chunk, mesh=mesh,
        in_specs=(P(), P(None, None, axis), P()),
        out_specs=P(None, axis, None),
        check_vma=False)
    return fn(variables, feature, pe)
