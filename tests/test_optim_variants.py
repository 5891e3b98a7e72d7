"""Smoke + behavior tests for the MaxFactor variant family and FAM."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from asr_model_tpu.optim.fam import (fam_optimizer, get_parameter_groups,
                                     handler_tree_from_params,
                                     HANDLERS, _band_powers_linear)
from asr_model_tpu.optim.variants import (depth_role_tree, maxfactor1,
                                          maxfactor2, maxfactor99,
                                          maxfactor_a, maxfactorb,
                                          maxheadroom, simple_fam)

PARAMS = {"conv_stem": {"kernel": jnp.asarray(
              np.random.RandomState(0).randn(4, 6), np.float32)},
          "attn": {"bias": jnp.asarray(
              np.random.RandomState(1).randn(6), np.float32)},
          "token_embed": {"w": jnp.asarray(
              np.random.RandomState(2).randn(8, 4, 2), np.float32)}}
GRADS = jax.tree.map(lambda p: jnp.ones_like(p) * 0.1, PARAMS)


def _run_steps(tx, params, n=3, **kw):
    state = tx.init(params)
    for _ in range(n):
        updates, state = tx.update(GRADS, state, params=params, **kw)
        params = optax.apply_updates(params, updates)
    return params


@pytest.mark.parametrize("factory", [
    lambda: maxfactor99(lr=0.01, bias=1),
    lambda: maxfactor99(lr=0.01, bias=2),
    lambda: maxfactor1(lr=0.01),
    lambda: maxfactor2(lr=0.01),
    lambda: maxfactorb(lr=0.01, bias=1),
    lambda: maxfactorb(lr=0.01, bias=2),
    lambda: maxfactorb(lr=0.01, bias=0),
    lambda: maxheadroom(lr=0.01),
    lambda: simple_fam(lr=0.01),
])
def test_variant_steps_change_params_finitely(factory):
    tx = factory()
    new = _run_steps(tx, PARAMS)
    for a, b in zip(jax.tree.leaves(new), jax.tree.leaves(PARAMS)):
        assert np.isfinite(np.asarray(a)).all()
        assert not np.allclose(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("factory,eps2", [
    (lambda: maxfactor2(lr=0.01), 1e-3),
    (lambda: maxheadroom(lr=0.01), 1e-3),
])
def test_effective_lr_reporting(factory, eps2):
    """get_last_lr(opt_state) == mean over params of the trust-ratio
    alpha = max(eps2, RMS(p)) * rho_t (optimizerc.py:467-493,
    797-926)."""
    from asr_model_tpu.optim.variants import TrackedLRState, get_last_lr

    tx = factory()
    state = tx.init(PARAMS)
    assert isinstance(state, TrackedLRState)
    assert get_last_lr(state) == 0.0          # no step yet
    updates, state = tx.update(GRADS, state, params=PARAMS)

    rho_t = min(0.01, 1.0)                    # step 1: min(lr, 1/sqrt(1))
    alphas = [max(eps2, float(jnp.sqrt(jnp.mean(p * p)))) * rho_t
              for p in jax.tree.leaves(PARAMS)]
    want = sum(alphas) / len(alphas)
    np.testing.assert_allclose(get_last_lr(state), want, rtol=1e-5)


def test_maxfactor_a_roles():
    roles = depth_role_tree(PARAMS)
    vals = jax.tree.leaves(roles)
    assert vals[0] == "robust"            # first 20%
    assert vals[1] == "balanced"          # 1/3 = 0.33 < 0.7
    assert vals[2] == "balanced"          # 2/3 = 0.67 < 0.7
    # with 10 leaves the last 30% are aggressive
    many = {f"p{i}": jnp.zeros(2) for i in range(10)}
    vals10 = jax.tree.leaves(depth_role_tree(many))
    assert vals10[-1] == "aggressive" and vals10[7] == "aggressive"
    tx = maxfactor_a(lr=0.01, roles=roles)
    new = _run_steps(tx, PARAMS)
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree.leaves(new))


def test_handler_assignment():
    tree = handler_tree_from_params(PARAMS)
    assert tree["conv_stem"]["kernel"] == "conv"
    assert tree["attn"]["bias"] == "attention"
    assert tree["token_embed"]["w"] == "embedding"


def test_fam_optimizer_adapts_only_large_params():
    big = {"w": jnp.asarray(np.random.RandomState(3).randn(64, 64),
                            np.float32)}
    tx = fam_optimizer(lr=0.01, min_size=256, fam_start_step=0)
    state = tx.init(big)
    g = jax.tree.map(jnp.ones_like, big)
    updates, state2 = tx.update(g, state, params=big)
    assert np.isfinite(np.asarray(updates["w"])).all()
    # freq history updated for the large param
    assert np.asarray(state2.freq_history["w"]).sum() > 0


def test_band_powers_sum_to_one():
    p = jnp.abs(jnp.asarray(np.random.RandomState(4).randn(501),
                            np.float32))
    p = p / p.sum()
    bands = _band_powers_linear(p, 8)
    np.testing.assert_allclose(float(bands.sum()), 1.0, rtol=1e-5)


def test_adaptive_momentum_bounds():
    for h in HANDLERS.values():
        bands = jnp.ones(8) / 8
        a = float(h.get_adaptive_momentum(bands, 0.9))
        assert 0.8 <= a <= 0.98 + 1e-6


def test_get_parameter_groups():
    groups = get_parameter_groups(PARAMS, lr=1e-3, decay=0.01)
    assert groups["conv"]["handler"] == "conv"
    assert groups["embedding"]["lr"] == pytest.approx(0.8e-3)
    assert groups["embedding"]["decay"] == pytest.approx(0.015)
    names = sum((g["names"] for g in groups.values()), [])
    assert len(names) == 3
