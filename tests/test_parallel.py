"""Distributed-semantics tests on the 8-device virtual CPU mesh
(SURVEY §4: DP-sharded grads == single-device grads; mesh/TP checks)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from asr_model_tpu.parallel.mesh import make_mesh
from asr_model_tpu.parallel.sharding import (batch_shardings, param_pspec,
                                             param_shardings, shard_params)


def test_virtual_devices_present():
    assert len(jax.devices()) == 8


def test_make_mesh_shapes():
    mesh = make_mesh(data=4, model=2)
    assert mesh.shape == {"data": 4, "model": 2, "seq": 1}
    with pytest.raises(ValueError):
        make_mesh(data=16)


def test_param_pspec_rules():
    params = {"block0": {"attn": {"q_proj": {"kernel": jnp.zeros((8, 8))},
                                  "out_proj": {"kernel": jnp.zeros((8, 8))}},
                         "mlp_in": {"kernel": jnp.zeros((8, 24))}},
              "token": {"embedding": jnp.zeros((40, 8))},
              "other": {"w": jnp.zeros((3, 3))}}
    specs = param_pspec(params)
    assert specs["block0"]["attn"]["q_proj"]["kernel"] == P(None, "model")
    assert specs["block0"]["attn"]["out_proj"]["kernel"] == P("model", None)
    assert specs["token"]["embedding"] == P("model", None)
    assert specs["other"]["w"] == P()


def test_indivisible_shapes_fall_back_to_replication():
    mesh = make_mesh(data=2, model=4)
    params = {"q_proj": {"kernel": jnp.zeros((6, 6))}}   # 6 % 4 != 0
    sh = param_shardings(params, mesh)
    assert sh["q_proj"]["kernel"].spec == P()


def test_dp_grads_match_single_device():
    """The core DP invariant: data-sharded loss grads == single-device
    grads on the same global batch."""
    mesh = make_mesh(data=4, model=1)

    w = jnp.asarray(np.random.RandomState(0).randn(16, 4), jnp.float32)
    x = jnp.asarray(np.random.RandomState(1).randn(8, 16), jnp.float32)
    y = jnp.asarray(np.random.RandomState(2).randn(8, 4), jnp.float32)

    def loss(w, x, y):
        return jnp.mean((x @ w - y) ** 2)

    g_single = jax.grad(loss)(w, x, y)

    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    ys = jax.device_put(y, NamedSharding(mesh, P("data")))
    ws = jax.device_put(w, NamedSharding(mesh, P()))
    g_sharded = jax.jit(jax.grad(loss))(ws, xs, ys)
    np.testing.assert_allclose(np.asarray(g_single),
                               np.asarray(g_sharded), atol=1e-6)


def test_dryrun_multichip_entrypoint():
    """The driver's multichip validation path must compile+run on the
    virtual mesh."""
    import importlib.util
    import os
    spec = importlib.util.spec_from_file_location(
        "graft_entry", os.path.join(os.path.dirname(__file__), "..",
                                    "__graft_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


def test_seq_sharded_attention_matches_unsharded():
    """kv-sharded online-softmax attention == plain attention."""
    from asr_model_tpu.models.attention import sdpa
    from asr_model_tpu.parallel.seq import seq_sharded_attention

    mesh = make_mesh(data=1, model=1, seq=8)
    rng = np.random.RandomState(0)
    B, H, Tq, Tk, D = 2, 2, 4, 64, 16
    q = jnp.asarray(rng.randn(B, H, Tq, D), jnp.float32)
    k = jnp.asarray(rng.randn(B, H, Tk, D), jnp.float32)
    v = jnp.asarray(rng.randn(B, H, Tk, D), jnp.float32)
    want = np.asarray(sdpa(q, k, v))
    got = np.asarray(seq_sharded_attention(q, k, v, mesh))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-4)

    # with a kv validity mask
    valid = jnp.asarray(np.arange(Tk)[None] < 40).repeat(B, 0)
    want_m = np.asarray(sdpa(q, k, v, kv_valid=valid))
    got_m = np.asarray(seq_sharded_attention(q, k, v, mesh,
                                             kv_valid=valid))
    np.testing.assert_allclose(got_m, want_m, atol=2e-5, rtol=2e-4)
