"""Beam-search decoding.

Capability addition: the reference has greedy only (SURVEY §1 "beam
search: not present").  Same fixed-buffer design as greedy_decode —
beams are folded into the batch axis ((B*K, T) through the decoder),
one jitted program, early exit when every beam of every utterance has
finished.

Standard length-normalized beam search:

* step: per live beam, top-K token continuations by accumulated
  log-prob; finished (EOS) beams propagate unchanged with their score;
* select: per utterance, the K best of the K*K candidates;
* exit: all beams finished or token budget exhausted;
* result: the highest length-normalized-score beam per utterance.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from asr_model_tpu.config import BOS_ID, EOS_ID, PAD_ID
from asr_model_tpu.models.generate import _decode_step
from asr_model_tpu.models.model import Model, modality_slots

NEG = -1e9


@functools.lru_cache(maxsize=16)
def _build_beam_fn(model: Model, beam_size: int, max_new_tokens: int,
                   length_penalty: float):
    K = beam_size
    T = 1 + max_new_tokens

    def decode(variables, xa):
        xa_enc = model.apply(variables, xa, method=Model.encode)

        def _pre(mdl, xe):
            blk = mdl.processor.block[-1]
            re_enc = mdl.processor._encode_xa(blk, xe)
            return mdl.processor._precompute_cross(blk, re_enc)

        xa_kv = model.apply(variables, xa_enc, method=_pre)
        fx = next(v for k, v in xa.items() if k != "pt")
        B = fx.shape[0]

        # expand the KV cache over beams: (B,...) -> (B*K,...)
        def expand(t):
            return jnp.repeat(t, K, axis=0)

        xa_kv_b = jax.tree.map(expand, xa_kv)

        ids0 = jnp.full((B, K, T), PAD_ID, jnp.int32).at[..., 0].set(BOS_ID)
        # only beam 0 live initially (identical beams would duplicate)
        scores0 = jnp.full((B, K), NEG, jnp.float32).at[:, 0].set(0.0)
        done0 = jnp.zeros((B, K), bool)

        def cond(carry):
            ids, scores, done, length = carry
            return (length < T) & ~jnp.all(done)

        def step(carry):
            ids, scores, done, length = carry
            flat = ids.reshape(B * K, T)
            valid = jnp.broadcast_to(jnp.arange(T)[None, :] < length,
                                     (B * K, T))
            idx = jnp.clip(length - 1, 0, T - 1)
            logits = model.apply(variables, flat, xa_kv_b,
                                 method=_decode_step, text_valid=valid,
                                 logits_position=idx)
            logp = jax.nn.log_softmax(
                logits[:, 0].astype(jnp.float32), -1)
            V = logp.shape[-1]
            logp = logp.reshape(B, K, V)

            # finished beams: only a PAD continuation, at score 0
            pad_only = jnp.full((V,), NEG).at[PAD_ID].set(0.0)
            logp = jnp.where(done[..., None], pad_only[None, None], logp)

            cand = scores[..., None] + logp                # (B, K, V)
            topv, topi = jax.lax.top_k(cand.reshape(B, K * V), K)
            beam_src = topi // V                           # (B, K)
            token = (topi % V).astype(jnp.int32)

            ids = jnp.take_along_axis(ids, beam_src[..., None], axis=1)
            done = jnp.take_along_axis(done, beam_src, axis=1)
            token = jnp.where(done, jnp.asarray(PAD_ID, jnp.int32), token)
            col = jnp.arange(T) == length
            ids = jnp.where(col[None, None, :], token[..., None], ids)
            done = done | (token == EOS_ID)
            return ids, topv, done, length + 1

        init = (ids0, scores0, done0, jnp.asarray(1, jnp.int32))
        ids, scores, done, length = jax.lax.while_loop(cond, step, init)

        # length-normalized selection
        lengths = jnp.sum((ids != PAD_ID) & (ids != EOS_ID), axis=-1)
        norm = scores / (lengths.astype(jnp.float32) ** length_penalty)
        best = jnp.argmax(norm, axis=-1)                   # (B,)
        out = jnp.take_along_axis(ids, best[:, None, None], axis=1)[:, 0]
        return out, jnp.take_along_axis(norm, best[:, None], axis=1)[:, 0]

    return jax.jit(decode)


def beam_search(model: Model, variables, spectrogram=None, pitch=None,
                waveform=None, pitch_tokens=None, beam_size: int = 4,
                max_new_tokens: int = 150,
                length_penalty: float = 1.0):
    """Returns (ids (B, 1+max_new_tokens), scores (B,))."""
    xa = modality_slots(pitch, spectrogram, waveform, pitch_tokens)
    fn = _build_beam_fn(model, int(beam_size), int(max_new_tokens),
                        float(length_penalty))
    return fn(variables, xa)
