"""Top-level Model.

Parity target: ``Model`` model.py:631-719 — AudioEncoder over
priority-ordered modality slots a/b/c (model.py:656-662, the ``aborc``
ordering) + the multi-modal processor; CE loss with ignore_index=0
(model.py:669-670).  ``generate`` lives in generate.py (fixed-length
scan decode).

Features arrive as the collator's dict: ``spectrogram`` (B, mels, T),
``pitch``/``waveform`` (B, 1, T), ``pitch_tokens`` (B, T+1), plus
optional ``*_mask`` validity masks for the strict-masking mode.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from asr_model_tpu.config import Dimensions, ModelConfig
from asr_model_tpu.models.conv import AudioEncoder
from asr_model_tpu.models.decoder import Processor
from asr_model_tpu.utils import aborc


def modality_slots(pitch=None, spectrogram=None, waveform=None,
                   pitch_tokens=None) -> Dict[str, jnp.ndarray]:
    """Priority-ordered modality slots (model.py:656-662)."""
    xa = {
        "a": aborc(pitch, spectrogram, waveform),
        "b": aborc(spectrogram, pitch, waveform),
        "c": aborc(waveform, pitch, spectrogram),
        "pt": pitch_tokens,
    }
    return {k: v for k, v in xa.items() if v is not None}


def cross_entropy_ignore_pad(logits: jnp.ndarray, labels: jnp.ndarray,
                             ignore_id: int = 0) -> jnp.ndarray:
    """torch F.cross_entropy(..., ignore_index=0): mean over
    non-ignored positions."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    ll = jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    mask = (labels != ignore_id).astype(logits.dtype)
    return -jnp.sum(ll * mask) / jnp.maximum(jnp.sum(mask), 1.0)


class Model(nn.Module):
    param: Dimensions
    cfg: ModelConfig = ModelConfig()

    def setup(self):
        p = self.param
        self.processor = Processor(
            tokens=p.tokens, mels=p.mels, dims=p.dims, head=p.head,
            layer=p.layer, act=p.act, n_type=p.n_type, ctx=self.cfg.ctx,
            chained=self.cfg.chained_blocks,
            causal_all=self.cfg.causal_all,
            streaming=self.cfg.streaming,
            pitch_token_vocab=self.cfg.pitch_token_vocab,
            pitch_token_bins=self.cfg.pitch_token_bins,
            moe_experts=self.cfg.moe_experts,
            moe_top_k=self.cfg.moe_top_k,
            moe_capacity_factor=self.cfg.moe_capacity_factor)
        self.enc = AudioEncoder(
            mels=p.mels, dims=p.dims, head=p.head, layer=p.layer,
            act=p.act, n_type=p.n_type, norm=self.cfg.encoder_norm,
            enc=self.cfg.encoder_transformer, theta=self.cfg.theta,
            dropout=self.cfg.dropout)

    def encode(self, xa: Dict[str, jnp.ndarray], train: bool = False):
        """Run the AudioEncoder over the a/b/c slots (pt passes through)."""
        return self.enc(xa, train=train)

    def __call__(self, text_ids: jnp.ndarray,
                 labels: Optional[jnp.ndarray] = None,
                 spectrogram: Optional[jnp.ndarray] = None,
                 pitch: Optional[jnp.ndarray] = None,
                 waveform: Optional[jnp.ndarray] = None,
                 pitch_tokens: Optional[jnp.ndarray] = None,
                 train: bool = False,
                 text_valid: Optional[jnp.ndarray] = None):
        xa = modality_slots(pitch, spectrogram, waveform, pitch_tokens)
        xa = self.encode(xa, train=train)
        logits = self.processor(text_ids, xa, seq=False,
                                text_valid=text_valid)
        loss = None
        if labels is not None:
            loss = cross_entropy_ignore_pad(logits, labels, ignore_id=0)
        return {"logits": logits, "loss": loss}

    def decode_step(self, ids: jnp.ndarray, xa_enc: Dict[str, jnp.ndarray],
                    text_valid: Optional[jnp.ndarray] = None):
        """One decode evaluation over a (fixed-size) prefix buffer with
        pre-encoded audio; returns (B, T, vocab) logits (seq=True path,
        model.py:692; the streaming variant decodes from the blended
        training head instead — see generate._decode_step)."""
        return self.processor(ids, xa_enc, seq=not self.cfg.streaming,
                              text_valid=text_valid, xa_preencoded=False)

    def count_modules(self) -> Dict[str, int]:
        """Parity with Model.init_w's module-count reporting
        (model.py:703-719); counts flax param leaves by role."""
        return {"processor_blocks": self.param.layer,
                "encoder_blocks": self.param.layer}


def cast_variables(variables, dtype=jnp.bfloat16):
    """Cast float params/stats to ``dtype`` for inference (greedy
    decode is bf16-robust: logits are still emitted f32).  The model's
    scan carries and positional adds are dtype-stable, so the whole
    decode runs at bf16 MXU/VPU rates."""
    return jax.tree.map(
        lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x,
        variables)


def init_w(params) -> Dict[str, int]:
    """Module-count self-check (parity: Model.init_w/_init_w,
    model.py:703-719): count Linear/Conv/LayerNorm-shaped parameter
    groups in an initialized params tree and print a summary."""
    counts = {"Linear": 0, "Conv1d": 0, "LayerNorm": 0, "Embedding": 0,
              "Other": 0}
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    seen = set()
    for path, leaf in flat:
        keys = [str(getattr(k, "key", k)) for k in path]
        parent = "/".join(keys[:-1])
        name = keys[-1]
        if parent in seen:
            continue
        if name == "kernel" and leaf.ndim == 2:
            counts["Linear"] += 1
            seen.add(parent)
        elif name in ("kernel", "v") and leaf.ndim == 3:
            counts["Conv1d"] += 1
            seen.add(parent)
        elif name in ("scale", "ln_scale", "mlp_ln_scale", "gamma"):
            # stacked (L, d) norm scales count as L norms
            counts["LayerNorm"] += leaf.shape[0] if leaf.ndim == 2 else 1
            seen.add(parent + "/" + name)
        elif name == "embedding":
            counts["Embedding"] += 1
            seen.add(parent)
    print("Initialization summary:")
    for k, v in counts.items():
        if v > 0:
            print(f"{k}: {v}")
    return counts
