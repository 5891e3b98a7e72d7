"""Mixture-of-experts MLP + expert parallelism (models/moe.py).

Capability beyond the reference (SURVEY §2.5 lists EP as a greenfield
axis; the reference's ``router`` model.py:537-557 mixes modalities,
not experts).  Covers: dense-dispatch semantics vs a loop reference,
per-example capacity independence, EP-sharded == unsharded exactness,
aux-loss wiring through the train step, and the config round-trip.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from asr_model_tpu.config import Config, Dimensions, ModelConfig
from asr_model_tpu.models.moe import MoEMLP, expert_capacity
from asr_model_tpu.models.model import Model
from asr_model_tpu.parallel.mesh import make_mesh
from asr_model_tpu.parallel.sharding import (batch_shardings, param_shardings,
                                             shard_params)


def _mk(B=2, T=12, d=16, E=4, k=2, cap=100.0, seed=0):
    moe = MoEMLP(dims=d, hidden=2 * d, num_experts=E, top_k=k,
                 capacity_factor=cap)
    x = jnp.asarray(np.random.RandomState(seed).randn(B, T, d),
                    jnp.float32)
    variables = moe.init(jax.random.key(0), x)
    return moe, variables, x


def _loop_reference(variables, x, E, k):
    """Dense loop reference: every token runs its top-k experts at
    unlimited capacity; gates renormalized over the selected k."""
    p = variables["params"]
    router_w, router_b = p["router"]["kernel"], p["router"]["bias"]
    logits = x @ router_w + router_b
    probs = jax.nn.softmax(logits, axis=-1)
    vals, idx = jax.lax.top_k(probs, k)
    vals = vals / vals.sum(-1, keepdims=True)
    wi = p["experts"]["w_in"]["kernel"]     # (E, d, h)
    bi = p["experts"]["w_in"]["bias"]       # (E, h)
    wo = p["experts"]["w_out"]["kernel"]    # (E, h, d)
    bo = p["experts"]["w_out"]["bias"]      # (E, d)
    from asr_model_tpu.models.registry import get_activation
    act = get_activation("gelu")
    out = jnp.zeros_like(x)
    for e in range(E):
        ye = act(x @ wi[e] + bi[e]) @ wo[e] + bo[e]
        w_e = jnp.sum(vals * (idx == e), axis=-1)       # (B, T)
        out = out + w_e[..., None] * ye
    return out


def test_matches_dense_loop_at_high_capacity():
    moe, variables, x = _mk()
    y = moe.apply(variables, x)
    ref = _loop_reference(variables, x, E=4, k=2)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_capacity_drops_overflow_tokens():
    # capacity 1 with many tokens: each expert serves exactly its first
    # assignment; total combine mass <= full-gate mass
    moe, variables, x = _mk(B=1, T=16, E=2, k=1, cap=1e-9)
    assert expert_capacity(16, 2, 1, 1e-9) == 1
    y = moe.apply(variables, x)
    assert np.isfinite(np.asarray(y)).all()
    # overflow tokens get zero MLP output -> strictly smaller norm than
    # the unlimited-capacity run
    moe2, variables2, _ = _mk(B=1, T=16, E=2, k=1, cap=100.0)
    y2 = moe2.apply(variables, x)   # same params, higher capacity
    assert float(jnp.linalg.norm(y)) < float(jnp.linalg.norm(y2))


def test_per_example_capacity_batch_independence():
    # a token's routing must not depend on other examples in the batch
    moe, variables, x = _mk(B=4, T=10, E=4, k=2, cap=1.0)
    y_batch = moe.apply(variables, x)
    for b in range(4):
        y_one = moe.apply(variables, x[b:b + 1])
        np.testing.assert_allclose(np.asarray(y_batch[b]),
                                   np.asarray(y_one[0]),
                                   rtol=1e-5, atol=1e-6)


def test_aux_loss_sown():
    moe, variables, x = _mk()
    _, mut = moe.apply(variables, x, mutable=["intermediates"])
    aux = mut["intermediates"]["moe_aux"]
    val = float(jnp.stack(list(aux)).sum())
    # Switch aux: >= 1 always (E * sum f_e p_e >= 1 by Cauchy-Schwarz
    # when f == p; for balanced routing it approaches 1)
    assert np.isfinite(val) and val > 0.5


def _tiny_moe_model(E=4):
    dims = Dimensions(tokens=64, mels=8, dims=16, head=2, layer=2)
    cfg = ModelConfig(dims=dims, moe_experts=E, moe_top_k=2,
                      moe_capacity_factor=2.0)
    model = Model(param=dims, cfg=cfg)
    rng = np.random.RandomState(0)
    B, T, TF = 4, 6, 16
    batch = {
        "text_ids": jnp.asarray(rng.randint(3, 64, (B, T)), jnp.int32),
        "labels": jnp.asarray(rng.randint(3, 64, (B, T)), jnp.int32),
        "spectrogram": jnp.asarray(rng.randn(B, 8, TF), jnp.float32),
    }
    variables = jax.jit(lambda r, b: model.init(
        {"params": r}, b["text_ids"], labels=b["labels"],
        spectrogram=b["spectrogram"]))(jax.random.key(0), batch)
    return model, variables, batch


def test_moe_model_forward_and_ep_sharding_match():
    model, variables, batch = _tiny_moe_model(E=4)

    def fwd(v, b):
        return model.apply(v, b["text_ids"], labels=b["labels"],
                           spectrogram=b["spectrogram"])["logits"]

    ref = jax.jit(fwd)(variables, batch)

    mesh = make_mesh(data=2, expert=4)
    params = shard_params(variables["params"], mesh)
    # expert kernels must actually be sharded over 'expert'
    wk = params["processor"]["block1"]["moe"]["experts"]["w_in"]["kernel"]
    assert "expert" in wk.sharding.spec
    sb = jax.device_put(batch, batch_shardings(batch, mesh))
    got = jax.jit(fwd)({"params": params,
                        "batch_stats": variables.get("batch_stats", {})},
                       sb)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_moe_train_step_aux_in_loss():
    from asr_model_tpu.train.loop import make_optimizer, make_train_step

    model, variables, batch = _tiny_moe_model(E=4)
    cfg = Config()
    params = variables["params"]
    tx, _ = make_optimizer(cfg, params)
    opt_state = tx.init(params)
    step = make_train_step(model, tx)
    key = jax.random.key(0)
    # snapshot before the step: the jitted step donates params
    before = np.asarray(variables["params"]["processor"]["block1"]
                        ["moe"]["experts"]["w_in"]["kernel"])
    p1, o1, bs1, key, loss, gnorm, _ = step(
        params, opt_state, variables.get("batch_stats", {}), key, batch)
    assert np.isfinite(float(loss)) and np.isfinite(float(gnorm))
    # expert weights must receive gradient (they changed)
    after = p1["processor"]["block1"]["moe"]["experts"]["w_in"]["kernel"]
    assert float(jnp.max(jnp.abs(before - np.asarray(after)))) > 0


def test_moe_ep_train_step_matches_single_device():
    """The REAL train step (fwd+bwd+MaxFactor, incl. the aux loss) on a
    data x expert mesh produces the same updated params as unsharded
    execution — EP changes layout, never numerics (per-example
    capacity: routing can't see the batch axis)."""
    from asr_model_tpu.parallel.sharding import (make_sharded_train_step,
                                                 replicated)
    from asr_model_tpu.train.loop import make_optimizer, make_train_step

    model, variables, batch = _tiny_moe_model(E=4)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    cfg = Config()
    tx, _ = make_optimizer(cfg, params)
    opt_state = tx.init(params)
    key = jax.random.key(0)

    step1 = make_train_step(model, tx)
    p1, *_r1, loss1, g1, _ = step1(
        jax.tree.map(jnp.copy, params), jax.tree.map(jnp.copy, opt_state),
        jax.tree.map(jnp.copy, batch_stats), key, batch)

    mesh = make_mesh(data=2, expert=4)
    ps = shard_params(jax.tree.map(jnp.copy, params), mesh)
    oss = jax.device_put(jax.tree.map(jnp.copy, opt_state),
                         replicated(opt_state, mesh))
    bss = jax.device_put(jax.tree.map(jnp.copy, batch_stats),
                         replicated(batch_stats, mesh))
    bsh = jax.device_put(batch, batch_shardings(batch, mesh))
    ksh = jax.device_put(key, NamedSharding(mesh, P()))
    step2 = make_sharded_train_step(model, tx, mesh)
    p2, *_r2, loss2, g2, _ = step2(ps, oss, bss, ksh, bsh)

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
    np.testing.assert_allclose(float(g1), float(g2), rtol=1e-3)
    flat1 = jax.tree_util.tree_leaves_with_path(p1)
    flat2 = {jax.tree_util.keystr(k): v
             for k, v in jax.tree_util.tree_leaves_with_path(p2)}
    for k, v1 in flat1:
        v2 = flat2[jax.tree_util.keystr(k)]
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v2),
                                   atol=2e-5, rtol=2e-4,
                                   err_msg=jax.tree_util.keystr(k))


def test_moe_dropped_tokens_keep_gradient_finite():
    """Capacity overflow drops tokens -> exactly-zero MLP rows flow
    into the residual norms.  Regression: the unguarded jnp.std in
    AbbyNormal had an inf backward at var==0, NaN'ing the whole train
    gradient whenever any token dropped (caught by dryrun_multichip's
    EP section at capacity_factor=1.25)."""
    dims = Dimensions(tokens=64, mels=8, dims=16, head=2, layer=2)
    cfg = ModelConfig(dims=dims, moe_experts=4, moe_top_k=2,
                      moe_capacity_factor=1e-9)   # C=1: heavy dropping
    model = Model(param=dims, cfg=cfg)
    rng = np.random.RandomState(0)
    B, T, TF = 4, 6, 16
    batch = {
        "text_ids": jnp.asarray(rng.randint(3, 64, (B, T)), jnp.int32),
        "labels": jnp.asarray(rng.randint(3, 64, (B, T)), jnp.int32),
        "spectrogram": jnp.asarray(rng.randn(B, 8, TF), jnp.float32),
    }
    variables = jax.jit(lambda r, b: model.init(
        {"params": r}, b["text_ids"], labels=b["labels"],
        spectrogram=b["spectrogram"]))(jax.random.key(0), batch)

    def loss_fn(p):
        out, _ = model.apply(
            {"params": p,
             "batch_stats": variables.get("batch_stats", {})},
            batch["text_ids"], labels=batch["labels"],
            spectrogram=batch["spectrogram"], train=True,
            rngs={"gumbel": jax.random.key(1),
                  "dropout": jax.random.key(2)},
            mutable=["batch_stats", "intermediates"])
        return out["loss"]

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(
        variables["params"])
    assert np.isfinite(float(loss))
    for path, leaf in jax.tree_util.tree_leaves_with_path(grads):
        assert np.isfinite(np.asarray(leaf)).all(), \
            jax.tree_util.keystr(path)


def test_moe_config_roundtrip():
    cfg = Config(model=ModelConfig(moe_experts=8, moe_top_k=1,
                                   moe_capacity_factor=1.5))
    back = Config.from_json(cfg.to_json())
    assert back.model.moe_experts == 8
    assert back.model.moe_top_k == 1
    assert back.model.moe_capacity_factor == 1.5
