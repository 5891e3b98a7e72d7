"""Golden tests for the audio ops against torch CPU semantics."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from asr_model_tpu.ops.audio import (adaptive_avg_pool1d, frame_rate_waveform,
                                     linear_interpolate, peak_normalize,
                                     sinusoids)


def test_sinusoids_matches_reference_formula():
    ctx, dims, theta = 37, 64, 30000.0
    got = np.asarray(sinusoids(ctx, dims, theta))
    # independent torch computation of the documented formula
    tscales = torch.exp(-torch.log(torch.tensor(theta))
                        / (dims // 2 - 1) * torch.arange(dims // 2))
    scaled = torch.arange(ctx).float()[:, None] * tscales[None, :]
    want = torch.cat([torch.sin(scaled), torch.cos(scaled)], dim=1).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)
    # concat (not interleaved) layout: first half is sin(0)=0 at t=0
    assert np.allclose(got[0, :dims // 2], 0.0)
    assert np.allclose(got[0, dims // 2:], 1.0)


@pytest.mark.parametrize("L,target", [(1000, 100), (999, 100), (357, 64)])
def test_adaptive_avg_pool_matches_torch(L, target):
    x = np.random.RandomState(0).randn(2, L).astype(np.float32)
    got = np.asarray(adaptive_avg_pool1d(jnp.asarray(x), target))
    want = F.adaptive_avg_pool1d(torch.from_numpy(x)[None], target)[0].numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.parametrize("L,target", [(50, 100), (64, 321)])
def test_linear_interpolate_matches_torch(L, target):
    x = np.random.RandomState(1).randn(1, L).astype(np.float32)
    got = np.asarray(linear_interpolate(jnp.asarray(x), target))
    want = F.interpolate(torch.from_numpy(x)[None], size=target,
                         mode="linear", align_corners=False)[0].numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_frame_rate_waveform_length():
    sr, hop = 16000, 160
    audio = jnp.asarray(np.random.RandomState(2).randn(sr * 2).astype(np.float32))
    w = frame_rate_waveform(audio, sr, hop)
    # duration 2.0s * 100 frames/s
    assert w.shape == (1, 200)


def test_peak_normalize():
    x = jnp.asarray([0.5, -2.0, 1.0])
    y = np.asarray(peak_normalize(x))
    np.testing.assert_allclose(y, [0.25, -1.0, 0.5], atol=1e-7)
    z = np.asarray(peak_normalize(jnp.zeros(4)))
    np.testing.assert_allclose(z, np.zeros(4))
