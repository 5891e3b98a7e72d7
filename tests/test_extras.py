"""Tests for the latent attention modules (extras.py) and gates."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from asr_model_tpu.models.attention import rbf_scores, taylor_softmax
from asr_model_tpu.models.extras import (AdaptiveSpan, Curiosity,
                                         MyelinatedLayer,
                                         calculate_attention,
                                         create_attention_mask)
from asr_model_tpu.models.gates import Gate, OneShot


def test_create_attention_mask():
    m = create_attention_mask(2, 4, is_causal=True)
    assert m.shape == (2, 1, 4, 4)
    assert bool(m[0, 0, 0, 1]) and not bool(m[0, 0, 1, 0])
    pad = jnp.asarray([[1, 1, 0, 0], [1, 1, 1, 1]], bool)
    m2 = create_attention_mask(2, 4, is_causal=False, padding_mask=pad)
    assert bool(m2[0, 0, 0, 2]) and not bool(m2[1, 0, 0, 2])


def test_calculate_attention_temperature():
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(1, 2, 5, 8), jnp.float32)
    out1, w = calculate_attention(q, q, q, temperature=1.0,
                                  is_causal=True)
    out2, _ = calculate_attention(q, q, q, temperature=0.5,
                                  is_causal=True)
    assert out1.shape == (1, 5, 16)
    assert not np.allclose(np.asarray(out1), np.asarray(out2))


def test_curiosity_blend():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 5, 16), jnp.float32)
    xa = jnp.asarray(rng.randn(2, 7, 16), jnp.float32)
    m = Curiosity(d=16, h=2)
    v = m.init(jax.random.key(0), x, xa)
    out = m.apply(v, x, xa)
    assert out.shape == (2, 5, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_adaptive_span():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 12, 16), jnp.float32)
    m = AdaptiveSpan(dims=16, head=2, max_dist=8)
    v = m.init(jax.random.key(0), x)
    out, _ = m.apply(v, x)
    assert out.shape[0] == 1 and out.shape[-1] == 16
    assert out.shape[1] == 8                   # span bounded by max_dist


def test_myelinated_layer_runs():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 6, 16), jnp.float32)
    m = MyelinatedLayer(dims=16, head=2, layerA=3)
    v = m.init({"params": jax.random.key(0), "jump": jax.random.key(1)}, x)
    out = m.apply(v, x, rngs={"jump": jax.random.key(2)})
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()
    # deterministic without the jump rng
    o1 = m.apply(v, x)
    o2 = m.apply(v, x)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2))


def test_oneshot_bias_and_runtime_scale():
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(1, 4, 16), jnp.float32)
    xa = jnp.asarray(rng.randn(1, 9, 16), jnp.float32)
    m = OneShot(dims=16, head=2)
    v = m.init(jax.random.key(0), x, xa)
    b1 = m.apply(v, x, xa)
    assert b1.shape == (1, 2, 4, 9)
    # runtime-adaptive scale changes the bias without recompiling
    b2 = m.apply(v, x, xa, scale=0.6)
    np.testing.assert_allclose(np.asarray(b2),
                               np.asarray(b1) * (0.6 / 0.3), rtol=1e-5)
    m4 = OneShot(dims=16, head=2, num_features=4)
    assert m4.default_scale == 0.25


def test_gate_topk_mixture():
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(2, 3, 16), jnp.float32)
    m = Gate(dims=16, num_types=4)
    v = m.init(jax.random.key(0), x)
    out = m.apply(v, x)
    assert out.shape == (2, 3, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_taylor_softmax_normalizes():
    x = jnp.asarray(np.random.RandomState(6).randn(3, 7), np.float32)
    p = taylor_softmax(x)
    np.testing.assert_allclose(np.asarray(p.sum(-1)), 1.0, rtol=1e-5)


def test_rbf_scores_blend():
    rng = np.random.RandomState(7)
    q = jnp.asarray(rng.randn(1, 2, 4, 8), jnp.float32)
    k = jnp.asarray(rng.randn(1, 2, 6, 8), jnp.float32)
    s = rbf_scores(q, k, rbf_ratio=0.0)
    want = jnp.einsum("bhqd,bhkd->bhqk", q, k)
    np.testing.assert_allclose(np.asarray(s), np.asarray(want), rtol=1e-5)
    s2 = rbf_scores(q, q, rbf_ratio=1.0)
    # pure RBF of identical q/k has 1.0 on the diagonal
    diag = np.asarray(s2)[0, 0][np.arange(4), np.arange(4)]
    np.testing.assert_allclose(diag, 1.0, rtol=1e-5)
