"""Typed configuration tree.

The reference scatters configuration over a ``Dimensions`` dataclass
(model.py:30-38), an ``extract_args`` dict (model.py:733-744) and
hard-coded constants (THETA=30000 model.py:27, special ids 0/1/2
essentials.py:292-294).  Here everything lives in one serializable
config tree: ``ModelConfig`` / ``DataConfig`` / ``OptimConfig`` /
``RunConfig``, with ``Dimensions`` kept as the parity-named model
hyperparameter record.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Optional, Tuple

THETA = 30000.0
PAD_ID = 0
BOS_ID = 1
EOS_ID = 2


@dataclass(frozen=True)
class Dimensions:
    """Model hyperparameters (parity: model.py:30-38).

    Default values reproduce the reference's default config
    (model.py:746): tokens=40000, mels=128, dims=512, head=4, layer=4,
    act="gelu", n_type="AbbyNormal".
    """

    tokens: int = 40000
    mels: int = 128
    dims: int = 512
    head: int = 4
    layer: int = 4
    act: str = "gelu"
    n_type: str = "AbbyNormal"


@dataclass(frozen=True)
class ModelConfig:
    dims: Dimensions = field(default_factory=Dimensions)
    ctx: int = 2048              # decoder context cap (model.py:586)
    theta: float = THETA         # sinusoid/rotary base (model.py:27)
    dropout: float = 0.1
    # Parity quirks, individually toggleable:
    # reference block loop never chains x across blocks (model.py:617-626);
    # chained=False reproduces that (only the last block reaches the loss).
    chained_blocks: bool = False
    # reference applies the causal mask only to the first self-attn call
    # per block iteration (model.py:618 vs 619-626).
    causal_all: bool = False
    # Streaming-causal decoder: the reference's training graph leaks
    # future tokens into position t through (a) MSheath's global time
    # pooling and (b) the g-block's non-causal cross-attention over the
    # text-derived e branch (model.py:624-626) — so free-running decode
    # degenerates even after causal_all (docs/BENCH_NOTES.md ablation).
    # streaming=True makes every text-side path prefix-causal: implies
    # causal_all, switches MSheath to per-position causal running-mean
    # working memory with position-0-derived jump policy, and masks the
    # d‖e cross causally.  Position t's logits then depend only on
    # tokens <= t, making teacher-forced training consistent with
    # free-running greedy decode.
    streaming: bool = False
    # AudioEncoder flags (model.py:646): norm=False, enc=False by default.
    encoder_norm: bool = False
    encoder_transformer: bool = False
    num_types: int = 3           # router/tgate modality count (model.py:560)
    msheath_mini_hc: bool = False  # r_node "ranvier" paths (model.py:388)
    msheath_mem: int = 64        # v_gate memory slots (model.py:407)
    pitch_token_bins: int = 256  # quantize_pitch bins (essentials.py:416)
    pitch_token_vocab: int = 1024  # pitch-token embedding rows (model.py:593)
    # Mixture-of-experts MLP (models/moe.py) — a capability beyond the
    # reference: 0 = dense parity MLP; >0 replaces each residual
    # block's MLP pair with E routed experts of the same shape.
    # Experts shard over an 'expert' mesh axis (EP, sharding.py).
    moe_experts: int = 0
    moe_top_k: int = 2
    moe_capacity_factor: float = 1.25
    moe_aux_weight: float = 1e-2  # load-balance loss weight (train step)


@dataclass(frozen=True)
class DataConfig:
    """Feature-extraction settings (parity: extract_args, model.py:733-744)."""

    spectrogram: bool = True
    pitch: bool = True
    waveform: bool = True
    pitch_tokens: bool = False
    harmonics: bool = False
    aperiodics: bool = False
    phase: bool = False
    hilbert: bool = False
    hop_length: int = 160
    sample_rate: int = 16000
    mels: int = 128
    # F0 algorithm for the pitch modality, shared by training features
    # AND the serving frontends (Transcriber/longform) so a model is
    # served the features it trained on: "dio" (native DIO+StoneMask,
    # the reference's pyworld pair, essentials.py:451-455) or "yin"
    # (jittable on-device estimator).
    pitch_estimator: str = "dio"
    n_fft: int = 1024
    f_min: float = 50.0
    f_max: float = 8000.0
    # collator
    pad_id: int = PAD_ID
    bos_id: int = BOS_ID
    eos_id: int = EOS_ID


@dataclass(frozen=True)
class OptimConfig:
    """MaxFactor + FAMScheduler2 settings (parity: model.py:783-791)."""

    lr: float = 2.5e-3
    b_decay: float = -0.8
    eps: Tuple[float, float] = (1e-8, 1e-8)
    d: float = 1.0
    decay: float = 1e-2
    gamma: float = 0.99
    maximize: bool = False
    bias: int = 1
    jump_bias: int = 2           # bias for 'jump'/'pnet' params (model.py:775-787)
    min_lr: float = 1e-9
    clip: bool = False
    cap: float = 0.0
    warmup_steps: int = 10
    total_steps: int = 100
    decay_start: Optional[int] = None
    warmup_start: float = 1e-6
    eta_min: float = 1e-6


@dataclass(frozen=True)
class RunConfig:
    """Training-loop settings (parity: model.py:795-816)."""

    max_steps: int = 100
    batch_size: int = 1
    acc_steps: int = 1
    log_interval: int = 10
    eval_interval: int = 10
    save_interval: int = 0
    warmup_interval: int = 10
    checkpoint_dir: str = "./checkpoints"
    log_dir: str = "./logs"
    generate: bool = False       # free-running vs teacher-forced eval WER
    clip_grad_norm: float = 0.0
    # rematerialize the forward in the backward (jax.checkpoint):
    # needed past batch ~12 at TF=1001 on a 16 GB chip.  Policy
    # "dots" saves matmul outputs; "full" saves nothing (big batches)
    remat: bool = False
    remat_policy: str = "dots"
    # mixed-precision training: "bfloat16" casts params/activations to
    # bf16 inside the loss (f32 master weights + optimizer state; loss
    # and grad-norm accumulate in f32) — the MXU's native rate with
    # halved activation HBM.  "float32" is the parity default.
    train_dtype: str = "float32"
    max_new_tokens: int = 150
    seed: int = 0
    # mesh axes sizes; 1 = disabled. data*model*seq must divide device count.
    mesh_data: int = 1
    mesh_model: int = 1
    mesh_seq: int = 1
    # expert-parallel axis for MoE models (ModelConfig.moe_experts>0):
    # expert weights shard over it, dispatch rides an ICI all-to-all
    mesh_expert: int = 1
    # pipeline parallelism over the chained block stack
    # (parallel/pipeline.py); composes with mesh_data only.  Requires
    # chained_blocks=True and layer % mesh_pipe == 0.
    mesh_pipe: int = 1
    # GPipe microbatches per step (bubble = (P-1)/(M+P-1)); the
    # microbatch is MSheath's jump-control unit (gradient-accumulation
    # semantics — pipeline.py module docstring)
    microbatches: int = 1
    # host input-pipeline overlap: batches this many collated batches
    # ahead on a worker thread (data.dataset.Prefetcher), and the train
    # loop additionally prepares batch N+1 while the device runs step N.
    # 0 = fully synchronous (the reference's num_workers=0 semantics).
    prefetch_depth: int = 2


@dataclass(frozen=True)
class Config:
    model: ModelConfig = field(default_factory=ModelConfig)
    data: DataConfig = field(default_factory=DataConfig)
    optim: OptimConfig = field(default_factory=OptimConfig)
    run: RunConfig = field(default_factory=RunConfig)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    @staticmethod
    def from_json(s: str) -> "Config":
        raw = json.loads(s)

        nested = {"dims": Dimensions, "model": ModelConfig,
                  "data": DataConfig, "optim": OptimConfig, "run": RunConfig}

        def build(cls, d):
            kw = {}
            for f in dataclasses.fields(cls):
                if f.name not in d:
                    continue
                v = d[f.name]
                if isinstance(v, dict) and f.name in nested:
                    v = build(nested[f.name], v)
                elif isinstance(v, list):
                    v = tuple(v)
                kw[f.name] = v
            return cls(**kw)

        return build(Config, raw)
