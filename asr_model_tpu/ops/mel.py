"""Log-mel spectrogram frontend, on-device.

Reproduces the reference feature pipeline exactly
(essentials.py:470-491): torchaudio MelSpectrogram with n_fft=1024,
hop=160, win=1024, periodic Hann window, center=True with constant
(zero) padding, power=2, HTK mel scale, f_min=50, f_max=8000, 128 mels,
no filterbank norm — followed by Whisper-style dynamic-range
compression ``clamp(1e-10).log10(); max(x, x.max()-8); (x+4)/4``
(essentials.py:488-490).

This is the XLA path: framing via gather, rfft via XLA's FFT, mel
projection as a single (frames, 513) x (513, mels) matmul that XLA maps
onto the MXU.  A fused Pallas frame/window/mel kernel lives in
ops/pallas/mel_kernel.py and is numerics-checked against this module.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from asr_model_tpu.utils import default_platform
import numpy as np


def hann_window(win_length: int) -> np.ndarray:
    """Periodic Hann window (torch.hann_window default)."""
    n = np.arange(win_length, dtype=np.float64)
    return (0.5 * (1.0 - np.cos(2.0 * np.pi * n / win_length))).astype(np.float32)


def hz_to_mel_htk(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def mel_to_hz_htk(m):
    return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)


@functools.lru_cache(maxsize=8)
def mel_filterbank(n_freqs: int = 513, f_min: float = 50.0,
                   f_max: float = 8000.0, n_mels: int = 128,
                   sample_rate: int = 16000, norm: str | None = None) -> np.ndarray:
    """Triangular HTK mel filterbank, (n_freqs, n_mels), float32.

    Matches torchaudio.functional.melscale_fbanks(norm=None,
    mel_scale='htk'): n_mels+2 points linear in mel between
    mel(f_min) and mel(f_max); triangles evaluated on
    linspace(0, sr/2, n_freqs).
    """
    all_freqs = np.linspace(0, sample_rate / 2, n_freqs)
    m_min = hz_to_mel_htk(f_min)
    m_max = hz_to_mel_htk(f_max)
    m_pts = np.linspace(m_min, m_max, n_mels + 2)
    f_pts = mel_to_hz_htk(m_pts)

    f_diff = f_pts[1:] - f_pts[:-1]                       # (n_mels+1,)
    slopes = f_pts[None, :] - all_freqs[:, None]          # (n_freqs, n_mels+2)
    down_slopes = -slopes[:, :-2] / f_diff[:-1]           # (n_freqs, n_mels)
    up_slopes = slopes[:, 2:] / f_diff[1:]                # (n_freqs, n_mels)
    fb = np.maximum(0.0, np.minimum(down_slopes, up_slopes))

    if norm == "slaney":
        enorm = 2.0 / (f_pts[2: n_mels + 2] - f_pts[:n_mels])
        fb *= enorm[None, :]
    return fb.astype(np.float32)


def frame_signal(audio: jnp.ndarray, n_fft: int, hop_length: int,
                 center: bool = True) -> jnp.ndarray:
    """Slice a (..., N) signal into (..., n_frames, n_fft) frames.

    center=True zero-pads n_fft//2 on both sides (pad_mode='constant');
    n_frames = 1 + N // hop.

    Gather-free: the signal reshapes to (rows, hop) and each frame is a
    horizontal concat of ``ceil(n_fft/hop)`` consecutive rows — row
    slices + one concat, which XLA turns into plain strided copies
    (jnp.take's 1M-element gather was the frontend's bottleneck on TPU).
    """
    if center:
        pad = n_fft // 2
        padding = [(0, 0)] * (audio.ndim - 1) + [(pad, pad)]
        audio = jnp.pad(audio, padding)
    n = audio.shape[-1]
    n_frames = 1 + (n - n_fft) // hop_length

    k = (n_fft + hop_length - 1) // hop_length     # rows per frame
    rows_needed = n_frames + k                     # with slack
    total = rows_needed * hop_length
    if total > n:
        pad2 = [(0, 0)] * (audio.ndim - 1) + [(0, total - n)]
        audio = jnp.pad(audio, pad2)
    grid = audio.reshape(*audio.shape[:-1], rows_needed, hop_length)
    parts = [grid[..., j:j + n_frames, :] for j in range(k)]
    frames = jnp.concatenate(parts, axis=-1)       # (..., n_frames, k*hop)
    return frames[..., :n_fft]


def power_spectrogram(audio: jnp.ndarray, n_fft: int = 1024,
                      hop_length: int = 160, power: float = 2.0) -> jnp.ndarray:
    """|STFT|^power, shape (..., n_freqs, n_frames)."""
    frames = frame_signal(audio, n_fft, hop_length)
    window = jnp.asarray(hann_window(n_fft))
    spec = jnp.fft.rfft(frames * window, axis=-1)
    mag2 = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
    if power == 2.0:
        out = mag2
    elif power == 1.0:
        out = jnp.sqrt(mag2)
    else:
        out = mag2 ** (power / 2.0)
    return jnp.swapaxes(out, -1, -2)


def mel_spectrogram(audio: jnp.ndarray, sample_rate: int = 16000,
                    n_fft: int = 1024, hop_length: int = 160,
                    n_mels: int = 128, f_min: float = 50.0,
                    f_max: float = 8000.0) -> jnp.ndarray:
    """(..., n_mels, n_frames) power mel spectrogram."""
    spec = power_spectrogram(audio, n_fft, hop_length)          # (.., F, T)
    fb = jnp.asarray(mel_filterbank(n_fft // 2 + 1, f_min, f_max, n_mels,
                                    sample_rate))
    mel = jnp.einsum("...ft,fm->...mt", spec, fb)
    return mel


def whisper_compress(mel: jnp.ndarray) -> jnp.ndarray:
    """clamp(1e-10).log10(); max(x, x.max()-8); (x+4)/4 — the global max
    is over the whole (per-utterance) tensor (essentials.py:488-490)."""
    log_mel = jnp.log10(jnp.clip(mel, min=1e-10))
    log_mel = jnp.maximum(log_mel, jnp.max(log_mel) - 8.0)
    return (log_mel + 4.0) / 4.0


# Pallas fused-mel routing: "auto" routes 1-D inputs on TPU to the
# fused frame/window/DFT/mel kernel (ops/pallas/mel_kernel.py); "on"
# forces it (interpret mode off-TPU, for tests); "off" disables.
PALLAS_MEL = "auto"


def _pallas_mel_eligible(audio) -> bool:
    if PALLAS_MEL == "off" or audio.ndim != 1:
        return False
    return PALLAS_MEL == "on" or default_platform() == "tpu"


def log_mel_spectrogram(audio: jnp.ndarray, sample_rate: int = 16000,
                        n_fft: int = 1024, hop_length: int = 160,
                        n_mels: int = 128, f_min: float = 50.0,
                        f_max: float = 8000.0) -> jnp.ndarray:
    """The full reference frontend: power mel + Whisper compression.

    Note the compression max is per-call (per utterance): batch inputs
    should be vmapped if per-utterance max semantics are wanted.

    On TPU, 1-D inputs route to the fused Pallas mel kernel (the
    north-star item, SURVEY §2.4); the XLA path is the fallback and the
    numerics reference.
    """
    if _pallas_mel_eligible(audio):
        from asr_model_tpu.ops.pallas.mel_kernel import (
            pallas_log_mel_spectrogram)
        return pallas_log_mel_spectrogram(
            audio, sample_rate=sample_rate, n_fft=n_fft,
            hop_length=hop_length, n_mels=n_mels, f_min=f_min, f_max=f_max)
    return whisper_compress(mel_spectrogram(audio, sample_rate, n_fft,
                                            hop_length, n_mels, f_min, f_max))
