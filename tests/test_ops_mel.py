"""Golden tests for the log-mel frontend vs torch.stft + documented
torchaudio filterbank math (torchaudio itself is not in this image;
torchaudio.Spectrogram delegates to torch.stft, reproduced here)."""

import numpy as np
import torch

import jax.numpy as jnp

from asr_model_tpu.ops.mel import (hann_window, log_mel_spectrogram,
                                   mel_filterbank, mel_spectrogram,
                                   power_spectrogram, whisper_compress)

SR, NFFT, HOP, MELS = 16000, 1024, 160, 128


def _torch_power_spec(audio: np.ndarray) -> np.ndarray:
    x = torch.from_numpy(audio)
    win = torch.hann_window(NFFT, periodic=True)
    spec = torch.stft(x, n_fft=NFFT, hop_length=HOP, win_length=NFFT,
                      window=win, center=True, pad_mode="constant",
                      normalized=False, onesided=True, return_complex=True)
    return (spec.abs() ** 2).numpy()


def _torchaudio_fbank(n_freqs=NFFT // 2 + 1, f_min=50.0, f_max=8000.0,
                      n_mels=MELS, sr=SR) -> np.ndarray:
    # torchaudio.functional.melscale_fbanks(norm=None, mel_scale="htk")
    all_freqs = torch.linspace(0, sr // 2, n_freqs)
    def hz2mel(f):
        return 2595.0 * torch.log10(torch.as_tensor(1.0 + f / 700.0))
    m_min, m_max = hz2mel(f_min), hz2mel(f_max)
    m_pts = torch.linspace(m_min.item(), m_max.item(), n_mels + 2)
    f_pts = 700.0 * (10 ** (m_pts / 2595.0) - 1.0)
    f_diff = f_pts[1:] - f_pts[:-1]
    slopes = f_pts.unsqueeze(0) - all_freqs.unsqueeze(1)
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    return torch.clamp(torch.min(down, up), min=0.0).numpy()


def _make_audio(n=SR):  # 1s: chirp + tone + noise
    t = np.arange(n) / SR
    rng = np.random.RandomState(0)
    a = (np.sin(2 * np.pi * 440 * t) + 0.5 * np.sin(2 * np.pi * (200 + 300 * t) * t)
         + 0.01 * rng.randn(n))
    return (a / np.abs(a).max()).astype(np.float32)


def test_hann_window_matches_torch():
    np.testing.assert_allclose(hann_window(NFFT),
                               torch.hann_window(NFFT).numpy(), atol=1e-6)


def test_filterbank_matches_torchaudio_formula():
    got = mel_filterbank()
    want = _torchaudio_fbank()
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)
    assert got.shape == (513, 128)
    # every filter has some support in-band
    assert (got.sum(axis=0) > 0).all()


def test_power_spectrogram_matches_torch_stft():
    audio = _make_audio()
    got = np.asarray(power_spectrogram(jnp.asarray(audio), NFFT, HOP))
    want = _torch_power_spec(audio)
    assert got.shape == want.shape == (513, 1 + SR // HOP)
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-4)


def test_log_mel_numerics_end_to_end():
    audio = _make_audio()
    got = np.asarray(log_mel_spectrogram(jnp.asarray(audio)))
    # reference pipeline in torch
    spec = torch.from_numpy(_torch_power_spec(audio))
    fb = torch.from_numpy(_torchaudio_fbank())
    mel = torch.matmul(spec.transpose(-1, -2), fb).transpose(-1, -2)
    log_mel = torch.clamp(mel, min=1e-10).log10()
    log_mel = torch.maximum(log_mel, log_mel.max() - 8.0)
    want = ((log_mel + 4.0) / 4.0).numpy()
    assert got.shape == (MELS, 1 + SR // HOP)
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-4)


def test_whisper_compress_range():
    mel = jnp.asarray(np.random.RandomState(1).rand(8, 10).astype(np.float32))
    out = np.asarray(whisper_compress(mel))
    # after compression the dynamic range is exactly <= 2.0 (=8/4)
    assert out.max() - out.min() <= 2.0 + 1e-6
