"""Pallas kernels vs XLA reference numerics (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from asr_model_tpu.models.attention import sdpa
from asr_model_tpu.ops.mel import mel_spectrogram
from asr_model_tpu.ops.pallas.attention_kernel import flash_attention
from asr_model_tpu.ops.pallas.mel_kernel import pallas_mel_spectrogram


def test_pallas_mel_matches_xla_path():
    rng = np.random.RandomState(0)
    n = 16000  # 1s
    t = np.arange(n) / 16000
    audio = (np.sin(2 * np.pi * 440 * t) + 0.01 * rng.randn(n)
             ).astype(np.float32)
    want = np.asarray(mel_spectrogram(jnp.asarray(audio), n_mels=32))
    got = np.asarray(pallas_mel_spectrogram(jnp.asarray(audio), n_mels=32,
                                            interpret=True))
    assert got.shape == want.shape == (32, 101)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("causal", [False, True])
def test_flash_attention_matches_sdpa(causal):
    rng = np.random.RandomState(1)
    B, H, T, D = 2, 2, 48, 16
    q = jnp.asarray(rng.randn(B, H, T, D), jnp.float32)
    k = jnp.asarray(rng.randn(B, H, T, D), jnp.float32)
    v = jnp.asarray(rng.randn(B, H, T, D), jnp.float32)
    want = np.asarray(sdpa(q, k, v, causal=causal))
    got = np.asarray(flash_attention(q, k, v, causal=causal,
                                     interpret=True))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-4)


def test_flash_attention_kv_mask():
    rng = np.random.RandomState(2)
    B, H, Tq, Tk, D = 1, 2, 8, 24, 16
    q = jnp.asarray(rng.randn(B, H, Tq, D), jnp.float32)
    k = jnp.asarray(rng.randn(B, H, Tk, D), jnp.float32)
    v = jnp.asarray(rng.randn(B, H, Tk, D), jnp.float32)
    valid = jnp.asarray(np.arange(Tk)[None] < 10)
    want = np.asarray(sdpa(q, k, v, kv_valid=valid))
    got = np.asarray(flash_attention(q, k, v, kv_valid=valid,
                                     interpret=True))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-4)
    # masked == truncated
    want_trunc = np.asarray(sdpa(q, k[:, :, :10], v[:, :, :10]))
    np.testing.assert_allclose(got, want_trunc, atol=2e-5, rtol=2e-4)


def test_flash_attention_uneven_lengths():
    rng = np.random.RandomState(3)
    B, H, Tq, Tk, D = 1, 1, 130, 200, 16   # crosses tile boundaries
    q = jnp.asarray(rng.randn(B, H, Tq, D), jnp.float32)
    k = jnp.asarray(rng.randn(B, H, Tk, D), jnp.float32)
    v = jnp.asarray(rng.randn(B, H, Tk, D), jnp.float32)
    want = np.asarray(sdpa(q, k, v))
    got = np.asarray(flash_attention(q, k, v, interpret=True))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-4)
