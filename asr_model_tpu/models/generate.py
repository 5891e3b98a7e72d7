"""Greedy decoding.

Parity targets: Model.generate model.py:674-701 (BOS=1 start, greedy
argmax, stop when all rows have emitted EOS=2, max_new_tokens cap) and
generate_predictions essentials.py:1028-1046 (EOS suppressed until the
token budget) — both EOS conventions supported via ``suppress_eos``.

TPU design: the reference re-runs the full decoder over a growing
prefix every step with no KV cache (O(T^2 * prefix) per utterance,
SURVEY §3.3).  Exact-parity incremental caching is impossible because
the b/c/d/g block calls are NON-causal over the prefix (only the ``a``
call is causal, model.py:618) — every new token legitimately changes
earlier positions.  What IS cacheable and fixed here:

* the AudioEncoder pass runs once (as in the reference);
* the per-block modality re-encodings ``i(xa[k])`` (model.py:619-621),
  which the reference recomputes for EVERY emitted token, run ONCE per
  utterance;
* the whole decode — encode, pre-encode, token loop — is ONE jitted
  program (cached per (model, max_new_tokens, suppress_eos, shapes)):
  the prefix lives in a fixed (B, 1+max_new_tokens) buffer with a
  validity mask that restricts attention and pooled statistics to the
  live prefix, reproducing the reference's variable-length numerics;
  the ``lax.while_loop`` exits as soon as every row has emitted EOS.
"""

from __future__ import annotations

import functools
import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from asr_model_tpu.config import BOS_ID, EOS_ID, PAD_ID
from asr_model_tpu.models.model import Model, modality_slots
from asr_model_tpu.utils import decode_tracing


def _decode_stages() -> int:
    """Prefix-bucket stage count (GRAFT_DECODE_STAGES, default 8).

    Measured on the v5e headline (B=8, 64-token budget, bf16,
    docs/BENCH_NOTES.md): full-width 402.9x, 4 stages 576.1x, 8 stages
    612.3x — per-step cost is ~linear in bucket width over a ~28%
    fixed serial floor, so halving the stage pitch buys +6.3%.  16
    stages is predicted +~3% more but doubles the decode's compiled
    loop bodies (remote compiles dominate bench wall time), so 8 is
    the default."""
    try:
        return max(1, int(os.environ.get("GRAFT_DECODE_STAGES", "8")))
    except ValueError:
        return 8


def _bucket_sizes(T: int, n_stages: int):
    """Prefix-bucket buffer widths for a 1+max_new_tokens decode.

    The parity model's buffer decode recomputes the whole buffer per
    token, and per-step cost scales with buffer ROWS (measured:
    per-chip decode throughput is flat in batch, BENCH_NOTES) — so
    short prefixes should run in short buffers.  Evenly-spaced stages
    cut average processed width ~37% (4 stages) / ~43% (8) at 64
    tokens.  Numerics are IDENTICAL to the full-width buffer: every
    length-dependent op (attention, MSheath pooling, router inputs,
    position slicing) already consumes the validity mask, and
    positions are absolute — tested token-exact (tests/test_model.py)."""
    if T <= 24 or n_stages <= 1:
        return [T]
    sizes = sorted({min(T, 1 + ((T - 1) * k + n_stages - 1)
                        // n_stages) for k in range(1, n_stages + 1)})
    return [s for s in sizes if s >= 8] or [T]


@functools.lru_cache(maxsize=32)
def _build_decode_fn(model: Model, max_new_tokens: int,
                     suppress_eos: bool, sp_ctx, n_stages: int):
    """``sp_ctx`` is the active seq-sharding context (or None) — part
    of the cache key because the context is consulted at TRACE time by
    Attention: without it, a decode fn first traced inside a
    seq_sharding context would bake the SP routing into the cached
    non-SP entry (ADVICE r2).  ``n_stages`` keys the bucket schedule
    so a GRAFT_DECODE_STAGES change mid-process cannot serve a stale
    compiled fn — it is REQUIRED (resolved from the env only in the
    public greedy_decode* wrappers, never inside this cached body)."""
    del sp_ctx  # key-only; the traced body reads the live context
    T = 1 + max_new_tokens
    stages = _bucket_sizes(T, n_stages)

    def decode(variables, xa):
        xa_enc = model.apply(variables, xa, method=Model.encode)

        def _pre(mdl, xa_enc):
            blk = mdl.processor.block[-1]
            re_enc = mdl.processor._encode_xa(blk, xa_enc)
            # per-utterance cross-attention K/V cache: the block
            # re-encoding AND the cross branch's PE+MSheath+router+
            # kv-projection all run once here instead of per token
            return mdl.processor._precompute_cross(blk, re_enc)

        xa_kv = model.apply(variables, xa_enc, method=_pre)
        fx = next(v for k, v in xa.items() if k != "pt")
        batch = fx.shape[0]
        ids0 = jnp.full((batch, T), PAD_ID, jnp.int32).at[:, 0].set(BOS_ID)

        def make_step(s):
            """One decode step over the width-``s`` prefix bucket: the
            model processes ids[:, :s] (masked to the live prefix);
            the new token writes into the FULL (B, T) buffer."""
            def step(carry):
                ids, length, done = carry
                window = jax.lax.slice_in_dim(ids, 0, s, axis=1)
                valid = jnp.broadcast_to(
                    jnp.arange(s)[None, :] < length, (batch, s))
                idx = jnp.clip(length - 1, 0, s - 1)
                logits = model.apply(variables, window, xa_kv,
                                     method=_decode_step,
                                     text_valid=valid,
                                     logits_position=idx)
                next_logits = logits[:, 0]                # (B, vocab)
                if suppress_eos:
                    allow = length >= (T - 1)   # the FULL token budget
                    masked = jnp.where(allow, next_logits[:, EOS_ID],
                                       -jnp.inf)
                    next_logits = next_logits.at[:, EOS_ID].set(masked)
                nxt = jnp.argmax(next_logits, axis=-1).astype(jnp.int32)
                nxt = jnp.where(done, jnp.asarray(PAD_ID, jnp.int32), nxt)
                col = jnp.arange(T) == length
                ids = jnp.where(col[None, :], nxt[:, None], ids)
                done = done | (nxt == EOS_ID)
                return ids, length + 1, done
            return step

        carry = (ids0, jnp.asarray(1, jnp.int32), jnp.zeros(batch, bool))
        # decode_tracing: the step bodies trace inside the context so
        # size-gated Pallas kernels admit large-batch prefix buffers
        # (utils.in_decode_tracing); the encode/precompute above stays
        # OUTSIDE — encoder-length activations route to XLA.
        with decode_tracing():
            for s in stages:
                # bucket s serves lengths < s (the step at length L
                # reads positions 0..L-1 and writes position L <= s-1)
                carry = jax.lax.while_loop(
                    lambda c, s=s: (c[1] < s) & ~jnp.all(c[2]),
                    make_step(s), carry)
        ids, _, _ = carry
        return ids

    return jax.jit(decode)


def _decode_step(mdl: Model, ids, xa_kv, text_valid=None,
                 logits_position=None):
    # Reference parity: generate reads the seq=True head (g only,
    # model.py:692) while the training loss reads the blended
    # sigmoid(blend)*d + (1-blend)*g head (model.py:628) — a
    # train/decode mismatch that contributes to the reference's
    # degenerate free-running decode.  The streaming variant decodes
    # from the same blended head it trains (seq=False).
    seq = not mdl.cfg.streaming
    return mdl.processor(ids, {}, seq=seq, text_valid=text_valid,
                         logits_position=logits_position, xa_kv=xa_kv)


def greedy_decode(model: Model, variables, spectrogram=None, pitch=None,
                  waveform=None, pitch_tokens=None,
                  max_new_tokens: int = 150, suppress_eos: bool = False,
                  rngs: Optional[dict] = None) -> jnp.ndarray:
    """Returns (B, 1+max_new_tokens) ids: BOS, generated tokens, PAD
    after a row's EOS.  One compile per (shapes, max_new_tokens)."""
    del rngs  # decode is deterministic (gumbel routing takes argmax)
    from asr_model_tpu.parallel.seq import active_seq_sharding
    xa = modality_slots(pitch, spectrogram, waveform, pitch_tokens)
    fn = _build_decode_fn(model, int(max_new_tokens), bool(suppress_eos),
                          active_seq_sharding(), _decode_stages())
    return fn(variables, xa)


@functools.lru_cache(maxsize=32)
def _build_prompted_decode_fn(model: Model, prompt_len: int,
                              max_new_tokens: int, suppress_eos: bool,
                              sp_ctx, n_stages: int):
    del sp_ctx  # cache-key-only (see _build_decode_fn)
    T = 1 + prompt_len + max_new_tokens
    # prefix buckets (see _bucket_sizes) — only widths past the prompt
    # can serve a step, so drop the smaller stages
    stages = [s for s in _bucket_sizes(T, n_stages)
              if s > 1 + prompt_len] or [T]

    def decode(variables, xa, prompt):
        xa_enc = model.apply(variables, xa, method=Model.encode)

        def _pre(mdl, xa_enc):
            blk = mdl.processor.block[-1]
            re_enc = mdl.processor._encode_xa(blk, xa_enc)
            # per-utterance cross-attention K/V cache: the block
            # re-encoding AND the cross branch's PE+MSheath+router+
            # kv-projection all run once here instead of per token
            return mdl.processor._precompute_cross(blk, re_enc)

        xa_kv = model.apply(variables, xa_enc, method=_pre)
        fx = next(v for k, v in xa.items() if k != "pt")
        batch = fx.shape[0]
        ids0 = jnp.full((batch, T), PAD_ID, jnp.int32)
        ids0 = ids0.at[:, 0].set(BOS_ID)
        if prompt_len:
            ids0 = ids0.at[:, 1:1 + prompt_len].set(prompt)

        def make_step(s):
            def step(carry):
                ids, length, done = carry
                window = jax.lax.slice_in_dim(ids, 0, s, axis=1)
                valid = jnp.broadcast_to(
                    jnp.arange(s)[None, :] < length, (batch, s))
                idx = jnp.clip(length - 1, 0, s - 1)
                logits = model.apply(variables, window, xa_kv,
                                     method=_decode_step,
                                     text_valid=valid,
                                     logits_position=idx)
                next_logits = logits[:, 0]
                if suppress_eos:
                    allow = length >= (T - 1)
                    masked = jnp.where(allow, next_logits[:, EOS_ID],
                                       -jnp.inf)
                    next_logits = next_logits.at[:, EOS_ID].set(masked)
                nxt = jnp.argmax(next_logits, axis=-1).astype(jnp.int32)
                nxt = jnp.where(done, jnp.asarray(PAD_ID, jnp.int32),
                                nxt)
                col = jnp.arange(T) == length
                ids = jnp.where(col[None, :], nxt[:, None], ids)
                done = done | (nxt == EOS_ID)
                return ids, length + 1, done
            return step

        carry = (ids0, jnp.asarray(1 + prompt_len, jnp.int32),
                 jnp.zeros(batch, bool))
        with decode_tracing():          # see _build_decode_fn
            for s in stages:
                carry = jax.lax.while_loop(
                    lambda c, s=s: (c[1] < s) & ~jnp.all(c[2]),
                    make_step(s), carry)
        ids, _, _ = carry
        return ids

    return jax.jit(decode)


def greedy_decode_prompted(model: Model, variables, prompt: jnp.ndarray,
                           spectrogram=None, pitch=None, waveform=None,
                           pitch_tokens=None, max_new_tokens: int = 150,
                           suppress_eos: bool = False) -> jnp.ndarray:
    """Greedy decode seeded with a (B, P) token prompt after BOS —
    the long-form cross-chunk carry (models/longform.py).  Compiles one
    program per (prompt length, shapes)."""
    from asr_model_tpu.parallel.seq import active_seq_sharding
    xa = modality_slots(pitch, spectrogram, waveform, pitch_tokens)
    p = int(prompt.shape[-1])
    fn = _build_prompted_decode_fn(model, p, int(max_new_tokens),
                                   bool(suppress_eos),
                                   active_seq_sharding(),
                                   _decode_stages())
    return fn(variables, xa, prompt.astype(jnp.int32))


@functools.lru_cache(maxsize=32)
def _build_stream_decode_fn(model: Model, max_new_tokens: int,
                            suppress_eos: bool):
    """Incremental decode for the STREAMING variant: O(1) compute per
    token (one position through the a/b/c/d/e/g flow with per-site KV
    caches and MSheath running-mean state) instead of the buffer
    path's full-prefix recompute — the prefix-causal property that
    defines streaming=True (config.py:67) is exactly what makes the
    incremental state sufficient.  Token-for-token equal to
    greedy_decode on streaming models (tests/test_stream_decode.py)."""
    from asr_model_tpu.config import THETA
    from asr_model_tpu.ops.audio import sinusoids

    T = 1 + max_new_tokens

    def decode(variables, xa):
        xa_enc = model.apply(variables, xa, method=Model.encode)

        def _pre(mdl, xa_enc):
            blk = mdl.processor.block[-1]
            re_enc = mdl.processor._encode_xa(blk, xa_enc)
            return mdl.processor._precompute_cross(blk, re_enc)

        xa_kv = model.apply(variables, xa_enc, method=_pre)
        fx = next(v for k, v in xa.items() if k != "pt")
        batch = fx.shape[0]
        dtype = fx.dtype
        pe_table = sinusoids(T, model.param.dims, THETA)

        def _init_state(mdl):
            return mdl.processor.init_stream_state(batch, T, dtype)

        state0 = model.apply(variables, method=_init_state)
        ids0 = jnp.full((batch, T), PAD_ID, jnp.int32).at[:, 0].set(BOS_ID)

        def cond(carry):
            ids, state, length, done = carry
            return (length < T) & ~jnp.all(done)

        def step(carry):
            ids, state, length, done = carry
            pos = length - 1
            tok = jnp.take_along_axis(ids, pos[None, None]
                                      .repeat(batch, 0), axis=1)[:, 0]

            def _step(mdl, state, tok):
                return mdl.processor.decode_stream_step(
                    tok, pos, state, xa_kv, pe_table)

            next_logits, state = model.apply(variables, state, tok,
                                             method=_step)
            if suppress_eos:
                allow = length >= (T - 1)
                masked = jnp.where(allow, next_logits[:, EOS_ID],
                                   -jnp.inf)
                next_logits = next_logits.at[:, EOS_ID].set(masked)
            nxt = jnp.argmax(next_logits, axis=-1).astype(jnp.int32)
            nxt = jnp.where(done, jnp.asarray(PAD_ID, jnp.int32), nxt)
            col = jnp.arange(T) == length
            ids = jnp.where(col[None, :], nxt[:, None], ids)
            done = done | (nxt == EOS_ID)
            return ids, state, length + 1, done

        init = (ids0, state0, jnp.asarray(1, jnp.int32),
                jnp.zeros(batch, bool))
        ids, _, _, _ = jax.lax.while_loop(cond, step, init)
        return ids

    return jax.jit(decode)


def greedy_decode_stream(model: Model, variables, spectrogram=None,
                         pitch=None, waveform=None,
                         max_new_tokens: int = 150,
                         suppress_eos: bool = False) -> jnp.ndarray:
    """Incremental greedy decode (streaming models only): same output
    contract as greedy_decode, O(1) per-token compute."""
    if not model.cfg.streaming:
        raise ValueError("greedy_decode_stream requires "
                         "ModelConfig.streaming=True; use greedy_decode")
    xa = modality_slots(pitch, spectrogram, waveform, None)
    fn = _build_stream_decode_fn(model, int(max_new_tokens),
                                 bool(suppress_eos))
    return fn(variables, xa)


def generate_predictions(model: Model, variables, tokenizer=None,
                         spectrogram=None, pitch=None, waveform=None,
                         max_new_tokens: int = 150) -> jnp.ndarray:
    """Parity wrapper for essentials.py:1028-1046 (EOS-suppressed
    greedy)."""
    return greedy_decode(model, variables, spectrogram=spectrogram,
                         pitch=pitch, waveform=waveform,
                         max_new_tokens=max_new_tokens, suppress_eos=True)


@functools.lru_cache(maxsize=8)
def _build_decode_fn_sp(model: Model, max_new_tokens: int,
                        suppress_eos: bool, mesh, axis: str):
    """Decode over PRE-ENCODED audio with the seq-sharding context
    active during tracing: the cached-KV cross-attentions lower to the
    distributed online-softmax (parallel/seq.py), and the cross-KV
    precompute partitions over the sharded time axis via GSPMD."""
    import contextlib

    from asr_model_tpu.parallel.seq import seq_sharding

    T = 1 + max_new_tokens

    def decode(variables, xa_enc):
        ctx = (seq_sharding(mesh, axis) if mesh is not None
               else contextlib.nullcontext())
        with ctx:                         # trace-time routing
            def _pre(mdl, xa_enc):
                blk = mdl.processor.block[-1]
                re_enc = mdl.processor._encode_xa(blk, xa_enc)
                return mdl.processor._precompute_cross(blk, re_enc)

            xa_kv = model.apply(variables, xa_enc, method=_pre)
            fx = next(v for k, v in xa_enc.items() if k != "pt")
            batch = fx.shape[0]
            ids0 = jnp.full((batch, T), PAD_ID,
                            jnp.int32).at[:, 0].set(BOS_ID)

            def cond(carry):
                ids, length, done = carry
                return (length < T) & ~jnp.all(done)

            def step(carry):
                ids, length, done = carry
                valid = jnp.broadcast_to(
                    jnp.arange(T)[None, :] < length, (batch, T))
                idx = jnp.clip(length - 1, 0, T - 1)
                logits = model.apply(variables, ids, xa_kv,
                                     method=_decode_step,
                                     text_valid=valid,
                                     logits_position=idx)
                next_logits = logits[:, 0]
                if suppress_eos:
                    allow = length >= (T - 1)
                    masked = jnp.where(allow, next_logits[:, EOS_ID],
                                       -jnp.inf)
                    next_logits = next_logits.at[:, EOS_ID].set(masked)
                nxt = jnp.argmax(next_logits, axis=-1).astype(jnp.int32)
                nxt = jnp.where(done, jnp.asarray(PAD_ID, jnp.int32), nxt)
                col = jnp.arange(T) == length
                ids = jnp.where(col[None, :], nxt[:, None], ids)
                done = done | (nxt == EOS_ID)
                return ids, length + 1, done

            init = (ids0, jnp.asarray(1, jnp.int32),
                    jnp.zeros(batch, bool))
            ids, _, _ = jax.lax.while_loop(cond, step, init)
            return ids

    return jax.jit(decode)


def greedy_decode_sp(model: Model, variables, mesh, spectrogram=None,
                     pitch=None, waveform=None, axis: str = "seq",
                     max_new_tokens: int = 150,
                     suppress_eos: bool = False) -> jnp.ndarray:
    """Sequence-parallel single-pass greedy decode for LONG audio
    (BASELINE config #4 at scale): the encoder runs time-sharded over
    the mesh's ``axis`` (parallel/seq.py:sp_encode, halo-exact) and
    every per-step cross-attention runs as a distributed online-softmax
    — one utterance spans the whole slice instead of being chunked.

    Feature time axes must be divisible by the axis size with shards
    >= the conv receptive field (pad with zero frames — the reference
    attends over pad frames, so zero-padding is parity-consistent)."""
    from asr_model_tpu.parallel.seq import sp_encode

    xa = modality_slots(pitch, spectrogram, waveform, None)
    enc, by_id = {}, {}
    for k, v in xa.items():
        if k not in ("a", "b", "c"):
            continue
        if id(v) not in by_id:             # shared slots encode once
            by_id[id(v)] = sp_encode(model, variables, v, mesh, axis)
        enc[k] = by_id[id(v)]
    fn = _build_decode_fn_sp(model, int(max_new_tokens),
                             bool(suppress_eos), mesh, axis)
    return fn(variables, enc)
