"""asr_model_tpu — a TPU-native ASR framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the
reference PyTorch codebase (sine2pi/ASR-model): multi-modal audio
encoder (log-mel spectrogram / pitch / frame-rate waveform), a
cross-modal transformer decoder ("processor") with signal-adaptive
rotary attention and adaptive-depth layer stacks, the MaxFactor
factored optimizer family, byte-level BPE tokenization, and a full
train/eval/decode loop — all built TPU-first:

* pure-functional flax modules, explicit PRNG keys for every stochastic
  path (gumbel-softmax routing/jumping),
* static shapes everywhere: the adaptive-depth stack is a masked
  ``lax.scan``, greedy decode is a fixed-length scan with validity
  masks,
* data-parallel / tensor-parallel execution via ``jax.sharding.Mesh``
  + NamedSharding (XLA collectives over ICI), no host round-trips in
  the hot loop,
* Pallas kernels for the hot ops (fused log-mel frontend, attention).
"""

__version__ = "0.1.0"

from asr_model_tpu.config import Dimensions, ModelConfig, DataConfig, OptimConfig, RunConfig

__all__ = [
    "Dimensions",
    "ModelConfig",
    "DataConfig",
    "OptimConfig",
    "RunConfig",
]
