"""Fused log-mel frontend as a Pallas TPU kernel (the north-star item,
SURVEY §2.4: torchaudio's C++ MelSpectrogram becomes an on-device fused
frame/window/FFT/mel kernel).

Design: the rFFT of a 1024-sample frame is expressed as two matmuls
against fixed windowed DFT bases — ``Wc[k,f] = hann[k]*cos(2*pi*k*f/N)``
and ``Ws`` likewise — which folds the Hann window INTO the basis and
puts the whole transform on the MXU:

    P = (F @ Wc)^2 + (F @ Ws)^2        # power spectrum, (T_BLK, 513)
    M = P @ FB                          # HTK mel projection, (T_BLK, 128)

One kernel invocation per block of frames: the audio chunk covering the
block streams HBM->VMEM once, frames are materialized by strided VMEM
reads, and power+mel fuse into the two matmul epilogues — the
intermediate (T, 513) spectrogram never touches HBM.  At 128 mel bins
and 513 freqs all matmul dims are MXU-friendly (513 padded to 520/128
internally by Mosaic).

Numerics: identical pipeline to ops/mel.py (bit-close in f32; DFT-matmul
vs FFT differ by ~1e-3 relative on power values).  The Whisper
compression (global max) stays outside — it is a cheap global reduce.

Falls back to interpret mode off-TPU (tests run it on CPU).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from asr_model_tpu.ops.mel import hann_window, mel_filterbank, whisper_compress
from asr_model_tpu.utils import default_platform

FRAME_BLOCK = 128          # frames per kernel invocation


@functools.lru_cache(maxsize=4)
def _dft_bases(n_fft: int):
    """Windowed DFT bases (n_fft, n_freqs), float32."""
    n_freqs = n_fft // 2 + 1
    k = np.arange(n_fft)[:, None].astype(np.float64)
    f = np.arange(n_freqs)[None, :].astype(np.float64)
    ang = 2.0 * np.pi * k * f / n_fft
    w = hann_window(n_fft).astype(np.float64)[:, None]
    wc = (np.cos(ang) * w).astype(np.float32)
    ws = (-np.sin(ang) * w).astype(np.float32)
    return wc, ws


def _mel_kernel(frames_ref, wc_ref, ws_ref, fb_ref, out_ref):
    """One (FRAME_BLOCK, n_fft) block of frames -> (FRAME_BLOCK, n_mels)
    mel powers; window is folded into the DFT bases, the (block, 513)
    power spectrum lives only in VMEM/registers."""
    frames = frames_ref[:]
    re = jnp.dot(frames, wc_ref[:], preferred_element_type=jnp.float32)
    im = jnp.dot(frames, ws_ref[:], preferred_element_type=jnp.float32)
    power = re * re + im * im
    out_ref[:] = jnp.dot(power, fb_ref[:],
                         preferred_element_type=jnp.float32)


def pallas_mel_spectrogram(audio: jnp.ndarray, sample_rate: int = 16000,
                           n_fft: int = 1024, hop_length: int = 160,
                           n_mels: int = 128, f_min: float = 50.0,
                           f_max: float = 8000.0,
                           interpret: bool | None = None) -> jnp.ndarray:
    """(n_mels, n_frames) power mel spectrogram of a 1-D waveform,
    matching ops/mel.mel_spectrogram (center=True constant padding,
    n_frames = 1 + N//hop)."""
    if interpret is None:
        interpret = default_platform() != "tpu"

    n = audio.shape[-1]
    n_frames = 1 + n // hop_length
    n_blocks = -(-n_frames // FRAME_BLOCK)         # cdiv
    padded_frames = n_blocks * FRAME_BLOCK

    pad = n_fft // 2
    need = (padded_frames - 1) * hop_length + n_fft
    x = jnp.pad(audio.astype(jnp.float32), (pad, max(need - n - pad, 0)))

    # framing stays in XLA (Mosaic cannot prove alignment of hop-strided
    # vector loads; hop=160 is not lane-aligned) — the kernel fuses
    # window+DFT+power+mel on aligned (FRAME_BLOCK, n_fft) blocks
    from asr_model_tpu.ops.mel import frame_signal
    frames = frame_signal(x, n_fft, hop_length, center=False)
    frames = frames[:padded_frames]
    if frames.shape[0] < padded_frames:
        frames = jnp.pad(frames, ((0, padded_frames - frames.shape[0]),
                                  (0, 0)))

    wc, ws = _dft_bases(n_fft)
    fb = mel_filterbank(n_fft // 2 + 1, f_min, f_max, n_mels, sample_rate)
    n_freqs = n_fft // 2 + 1

    grid_spec = pl.GridSpec(
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((FRAME_BLOCK, n_fft), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, n_freqs), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, n_freqs), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_freqs, n_mels), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((FRAME_BLOCK, n_mels), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
    )

    out = pl.pallas_call(
        _mel_kernel,
        out_shape=jax.ShapeDtypeStruct((padded_frames, n_mels),
                                       jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(frames, jnp.asarray(wc), jnp.asarray(ws), jnp.asarray(fb))
    return out[:n_frames].T                        # (n_mels, n_frames)


def pallas_log_mel_spectrogram(audio, **kw):
    """Full frontend parity: fused mel + Whisper compression."""
    return whisper_compress(pallas_mel_spectrogram(audio, **kw))
