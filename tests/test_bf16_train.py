"""Mixed-precision (bfloat16) training — train/loop.py compute_dtype.

TPU-first capability beyond the reference (which trains f32-only,
essentials.py:708-996): the forward/backward run in bf16 (MXU native
rate, halved activation HBM) while master params, optimizer state,
loss, and grad-norm stay f32.  Covers: master dtypes preserved across
steps (donation-safe), loss agreement with the f32 step at init,
params actually updating, the RunConfig mapping, and the MoE aux path
under bf16.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from asr_model_tpu.config import Config, Dimensions, ModelConfig, RunConfig
from asr_model_tpu.models.model import Model
from asr_model_tpu.train.loop import (make_optimizer, make_train_step,
                                      train_compute_dtype)


def _tiny(moe=0):
    dims = Dimensions(tokens=64, mels=8, dims=16, head=2, layer=2)
    cfg = ModelConfig(dims=dims, moe_experts=moe, moe_top_k=2,
                      moe_capacity_factor=2.0)
    model = Model(param=dims, cfg=cfg)
    rng = np.random.RandomState(0)
    B, T, TF = 2, 6, 16
    batch = {
        "text_ids": jnp.asarray(rng.randint(3, 64, (B, T)), jnp.int32),
        "labels": jnp.asarray(rng.randint(3, 64, (B, T)), jnp.int32),
        "spectrogram": jnp.asarray(rng.randn(B, 8, TF), jnp.float32),
    }
    variables = jax.jit(lambda r, b: model.init(
        {"params": r}, b["text_ids"], labels=b["labels"],
        spectrogram=b["spectrogram"]))(jax.random.key(0), batch)
    return model, variables, batch


def _run_step(model, variables, batch, compute_dtype):
    params = jax.tree.map(jnp.copy, variables["params"])
    bs = jax.tree.map(jnp.copy, variables.get("batch_stats", {}))
    tx, _ = make_optimizer(Config(), params)
    opt = tx.init(params)
    step = make_train_step(model, tx, compute_dtype=compute_dtype)
    return step(params, opt, bs, jax.random.key(0), batch)


def test_bf16_step_matches_f32_loss_and_updates():
    model, variables, batch = _tiny()
    before = jax.tree.map(np.asarray, variables["params"])

    p32, _, bs32, _, loss32, g32, _ = _run_step(model, variables, batch,
                                                None)
    p16, _, bs16, _, loss16, g16, _ = _run_step(model, variables, batch,
                                                jnp.bfloat16)

    # loss/gnorm emitted in f32 and finite in both modes
    assert loss16.dtype == jnp.float32
    assert np.isfinite(float(loss16)) and np.isfinite(float(g16))
    # sanity bound, not a numerics claim: the model routes discretely
    # (hard gumbel in AbbyNormal, Router top-k, MSheath jump actions),
    # so a bf16-induced flip of one decision steps the loss
    # discontinuously at this untrained tiny scale (measured: 76 vs
    # 101 at init).  The bound catches catastrophic breakage (0, inf,
    # 1e6); continuous-path numerics are pinned by the dtype asserts
    # and by the bf16 decode==f32 decode test in test_transcribe.
    assert float(loss16) == pytest.approx(float(loss32), rel=0.5)

    # master params stay f32 and actually move
    moved = 0.0
    for (path, a), b in zip(
            jax.tree_util.tree_leaves_with_path(p16),
            jax.tree.leaves(before)):
        assert a.dtype == b.dtype, jax.tree_util.keystr(path)
        moved += float(jnp.sum(jnp.abs(a.astype(jnp.float32)
                                       - jnp.asarray(b, jnp.float32))))
    assert moved > 0

    # batch stats keep their master dtype (donation-safe across steps)
    for a, b in zip(jax.tree.leaves(bs16), jax.tree.leaves(bs32)):
        assert a.dtype == b.dtype


def test_bf16_step_is_reentrant():
    # the returned trees must feed straight back into the same compiled
    # step (no dtype drift through the donated arguments)
    model, variables, batch = _tiny()
    params = variables["params"]
    bs = variables.get("batch_stats", {})
    tx, _ = make_optimizer(Config(), params)
    opt = tx.init(params)
    step = make_train_step(model, tx, compute_dtype=jnp.bfloat16)
    key = jax.random.key(0)
    params, opt, bs, key, l1, _, _ = step(params, opt, bs, key, batch)
    params, opt, bs, key, l2, _, _ = step(params, opt, bs, key, batch)
    assert np.isfinite(float(l1)) and np.isfinite(float(l2))
    assert float(l2) < float(l1) * 1.5   # sane progression, no blowup


def test_bf16_with_moe_aux():
    model, variables, batch = _tiny(moe=4)
    _, _, _, _, loss, gnorm, _ = _run_step(model, variables, batch,
                                           jnp.bfloat16)
    assert np.isfinite(float(loss)) and np.isfinite(float(gnorm))


def test_train_compute_dtype_mapping():
    assert train_compute_dtype(RunConfig()) is None
    assert train_compute_dtype(
        RunConfig(train_dtype="bfloat16")) == jnp.bfloat16
    assert train_compute_dtype(
        RunConfig(train_dtype="bf16")) == jnp.bfloat16
    with pytest.raises(ValueError):
        train_compute_dtype(RunConfig(train_dtype="float16"))


def test_config_roundtrip():
    cfg = Config(run=RunConfig(train_dtype="bfloat16"))
    assert Config.from_json(cfg.to_json()).run.train_dtype == "bfloat16"
