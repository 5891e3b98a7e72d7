"""Golden parity tests for MaxFactor + FAMScheduler2 against stored
reference trajectories (tests/golden/maxfactor.npz, generated once from
the reference implementation by tools/gen_golden_optim.py)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from asr_model_tpu.optim.maxfactor import (bias_group_tree, maxfactor,
                                           _lower_median)
from asr_model_tpu.optim.schedules import fam_scheduler2

GOLD = os.path.join(os.path.dirname(__file__), "golden", "maxfactor.npz")
SHAPES = [(8, 16), (16,), (4, 6, 5), ()]


@pytest.fixture(scope="module")
def gold():
    return np.load(GOLD)


def _params(gold, group):
    return {f"p{i}": jnp.asarray(gold[f"init_{group}_{i}"])
            for i in range(len(SHAPES))}


def _run(gold, group, bias_label):
    params = _params(gold, group)
    sched = fam_scheduler2(2.5e-3, warmup_steps=10, total_steps=100)
    bias_tree = {k: bias_label for k in params}
    opt = maxfactor(lr=sched, b_decay=-0.8, eps=(1e-8, 1e-8), d=1.0,
                    decay=1e-2, gamma=0.99, bias=bias_tree, min_lr=1e-9)
    state = opt.init(params)
    traj = []
    for t in range(5):
        grads = {f"p{i}": jnp.asarray(gold[f"grad_{t}_{i}"])
                 for i in range(len(SHAPES))}
        updates, state = opt.update(grads, state, params=params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        traj.append({k: np.asarray(v) for k, v in params.items()})
    return traj


@pytest.mark.parametrize("group,bias", [("main", 1), ("jump", 2)])
def test_maxfactor_trajectory_matches_reference(gold, group, bias):
    traj = _run(gold, group, bias)
    for t in range(5):
        for i in range(len(SHAPES)):
            np.testing.assert_allclose(
                traj[t][f"p{i}"], gold[f"{group}_{t}_{i}"],
                atol=2e-6, rtol=1e-5,
                err_msg=f"group={group} step={t} param={i} "
                        f"shape={SHAPES[i]}")


def test_fam_scheduler2_curve(gold):
    sched = fam_scheduler2(2.5e-3, warmup_steps=10, total_steps=100,
                           decay_start=None, warmup_start=1e-6,
                           eta_min=1e-6)
    got = np.asarray([float(sched(s)) for s in range(100)])
    np.testing.assert_allclose(got, gold["lr_curve"], rtol=1e-6, atol=1e-10)


def test_lower_median_matches_torch():
    import torch
    x = np.random.RandomState(3).rand(5, 8).astype(np.float32)
    got = np.asarray(_lower_median(jnp.asarray(x), axis=-1))
    want = torch.median(torch.from_numpy(x), dim=-1, keepdim=True)[0].numpy()
    np.testing.assert_allclose(got, want)


def test_bias_group_tree_name_matching():
    params = {"block0": {"jump": {"mkey": jnp.zeros((2, 2))},
                         "attn": {"w": jnp.zeros((2, 2))}},
              "pnet_head": {"w": jnp.zeros(3)}}
    tree = bias_group_tree(params)
    assert tree["block0"]["jump"]["mkey"] == 2
    assert tree["block0"]["attn"]["w"] == 1
    assert tree["pnet_head"]["w"] == 2
