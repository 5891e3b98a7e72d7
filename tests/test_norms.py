"""Norm-zoo tests: pooling golden vs torch, AbbyNormal properties,
registry dispatch."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from asr_model_tpu.models.norms import (AbbyNormal, LayerNorm, LocalNorm,
                                        RMSNorm, window_reduce_last)
from asr_model_tpu.models.registry import get_activation, get_norm


@pytest.mark.parametrize("size", [3, 5, 7, 25])
def test_window_reduce_matches_torch_pools(size):
    x = np.abs(np.random.RandomState(0).randn(4, 37, 64)).astype(np.float32)
    got_avg = np.asarray(window_reduce_last(jnp.asarray(x), size, "mean"))
    got_max = np.asarray(window_reduce_last(jnp.asarray(x), size, "max"))
    t = torch.from_numpy(x)
    want_avg = F.avg_pool1d(t, kernel_size=size, stride=1,
                            padding=size // 2).numpy()
    want_max = F.max_pool1d(t, kernel_size=size, stride=1,
                            padding=size // 2).numpy()
    np.testing.assert_allclose(got_avg, want_avg, atol=1e-6)
    np.testing.assert_allclose(got_max, want_max, atol=1e-6)


def test_abbynormal_finite_and_shape():
    m = AbbyNormal(dims=64)
    x = jnp.asarray(np.random.RandomState(1).randn(2, 9, 64).astype(np.float32))
    params = m.init({"params": jax.random.key(0),
                     "gumbel": jax.random.key(1)}, x)
    y = m.apply(params, x, rngs={"gumbel": jax.random.key(2)})
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()
    # deterministic path (no gumbel rng) must also work and be repeatable
    y1 = m.apply(params, x)
    y2 = m.apply(params, x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2))


def test_abbynormal_zero_row_gradient_finite():
    # MoE capacity overflow (models/moe.py) feeds exactly-zero token
    # rows into the residual norms; jnp.std's backward is inf at
    # var==0, which NaN'd the whole train gradient until the safe-std
    # guard.  Forward must be unchanged (0 row -> cv 0), backward
    # finite.
    m = AbbyNormal(dims=32)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 5, 32),
                    jnp.float32)
    x = x.at[0, 2].set(0.0)         # one all-zero token row
    x = x.at[1, 4].set(0.0)
    params = m.init({"params": jax.random.key(0), "gumbel": jax.random.key(1)}, x)

    def f(p, xx):
        return jnp.sum(m.apply(p, xx,
                               rngs={"gumbel": jax.random.key(2)}) ** 2)

    gp = jax.grad(f)(params, x)
    gx = jax.grad(f, argnums=1)(params, x)
    assert all(np.isfinite(np.asarray(l)).all()
               for l in jax.tree.leaves(gp))
    assert np.isfinite(np.asarray(gx)).all()
    # forward at the zero rows is exactly zero (denominator k^beta)
    y = m.apply(params, x, rngs={"gumbel": jax.random.key(2)})
    np.testing.assert_array_equal(np.asarray(y[0, 2]), 0.0)


def test_l2norm_zero_row_gradient_finite():
    # same hazard class as the AbbyNormal std: linalg.norm's backward
    # is 0/0 at the origin even though l2norm's forward clamps the
    # denominator.  MSheath's cosine similarity (sheath.py) runs this
    # on block streams.
    from asr_model_tpu.utils import l2norm
    x = jnp.asarray(np.random.RandomState(0).randn(3, 8), jnp.float32)
    x = x.at[1].set(0.0)
    # forward parity with the torch-definition for nonzero rows
    t = torch.nn.functional.normalize(torch.tensor(np.asarray(x)), dim=-1)
    np.testing.assert_allclose(np.asarray(l2norm(x)), t.numpy(),
                               rtol=1e-6, atol=1e-6)
    g = jax.grad(lambda v: jnp.sum(l2norm(v) ** 2))(x)
    assert np.isfinite(np.asarray(g)).all()


def test_abbynormal_denominator_bounds():
    # with alpha=1e-4 and k=1 the denominator stays close to 1 for unit
    # inputs => output ~ x
    m = AbbyNormal(dims=32)
    x = jnp.ones((1, 4, 32), jnp.float32) * 0.1
    params = m.init({"params": jax.random.key(0)}, x)
    y = np.asarray(m.apply(params, x))
    np.testing.assert_allclose(y, np.asarray(x), rtol=1e-3)


def test_localnorm_mode1_matches_torch():
    # reference LocalNorm operates unbatched (C, T); our channel-last pool
    # over the last axis matches avg_pool1d over T
    x = np.abs(np.random.RandomState(2).randn(16, 50)).astype(np.float32)
    m = LocalNorm(size=5)
    params = m.init(jax.random.key(0), jnp.asarray(x))
    got = np.asarray(m.apply(params, jnp.asarray(x)))
    t = torch.from_numpy(x)
    div = (t * t).unsqueeze(1)
    div = F.avg_pool1d(div, kernel_size=5, stride=1, padding=2)
    div = div.narrow(2, 0, x.shape[1]).squeeze(1)
    want = (t / (div * 1e-4 + 1.0).pow(0.75)).numpy()
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-5)


def test_registry_dispatch_and_fallback():
    for name in ["layernorm", "rmsnorm", "AbbyNormal", "localnorm",
                 "linearnorm", "adanorm"]:
        assert get_norm(name, dims=32) is not None
    with pytest.warns(UserWarning):
        m = get_norm("nope", dims=32)
    assert isinstance(m, LayerNorm)


def test_gelu_is_exact_erf():
    x = np.linspace(-3, 3, 101).astype(np.float32)
    got = np.asarray(get_activation("gelu")(jnp.asarray(x)))
    want = torch.nn.GELU()(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(got, want, atol=1e-6)


@pytest.mark.parametrize("act", ["relu", "swish", "tanhshrink", "softplus",
                                 "softshrink", "leaky_relu", "elu", "tanh",
                                 "sigmoid"])
def test_activations_match_torch(act):
    tmap = {"relu": torch.nn.ReLU(), "swish": torch.nn.SiLU(),
            "tanhshrink": torch.nn.Tanhshrink(), "softplus": torch.nn.Softplus(),
            "softshrink": torch.nn.Softshrink(), "leaky_relu": torch.nn.LeakyReLU(),
            "elu": torch.nn.ELU(), "tanh": torch.nn.Tanh(),
            "sigmoid": torch.nn.Sigmoid()}
    x = np.linspace(-3, 3, 101).astype(np.float32)
    got = np.asarray(get_activation(act)(jnp.asarray(x)))
    want = tmap[act](torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)
