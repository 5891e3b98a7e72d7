"""End-to-end train loop test: synthetic data, few steps, checkpoint
save + RESTORE (the reference has no restore path — SURVEY §5.4)."""

import glob
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from asr_model_tpu.config import (Config, Dimensions, ModelConfig,
                                  OptimConfig, RunConfig)
from asr_model_tpu.data.dataset import Repeated, SyntheticDataset
from asr_model_tpu.data.tokenizer import setup_tokenizer
from asr_model_tpu.models.model import Model
from asr_model_tpu.train import checkpoint as ckpt
from asr_model_tpu.train.loop import (grad_norm_controller, make_optimizer,
                                      train_and_evaluate)

ASSET = os.path.join(os.path.dirname(__file__), "..", "asr_model_tpu",
                     "assets", "tokenizer.json")


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("train")
    tok = setup_tokenizer(ASSET)
    extract = dict(spectrogram=True, pitch=False, waveform=False,
                   hop_length=160, sample_rate=16000, mels=8)
    ds = SyntheticDataset(n=4, tokenizer=tok, extract_args=extract,
                          dur_range=(0.3, 0.5))
    loader = Repeated(ds, batch_size=2, pad_to_multiple=64,
                      text_pad_to_multiple=16)
    dims = Dimensions(tokens=40000, mels=8, dims=16, head=2, layer=2)
    cfg = Config(
        model=ModelConfig(dims=dims),
        optim=OptimConfig(warmup_steps=2, total_steps=6),
        run=RunConfig(max_steps=6, batch_size=2, eval_interval=3,
                      save_interval=3, warmup_interval=1,
                      checkpoint_dir=str(tmp), log_dir=str(tmp)))
    model = Model(param=dims, cfg=cfg.model)
    variables = train_and_evaluate(model, tok, loader, loader, cfg)
    return model, variables, cfg, tok, loader, str(tmp)


def test_train_loop_runs_and_saves(trained):
    model, variables, cfg, tok, loader, tmp = trained
    assert variables["params"] is not None
    saved = glob.glob(os.path.join(tmp, "*.msgpack"))
    assert saved, "expected periodic + final checkpoints"
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree.leaves(variables["params"]))


def test_checkpoint_restore_roundtrip(trained):
    model, variables, cfg, tok, loader, tmp = trained
    path = ckpt.latest_checkpoint(tmp)
    assert path is not None
    params = variables["params"]
    tx, _ = make_optimizer(cfg, params)
    target = {"params": params, "opt_state": tx.init(params),
              "batch_stats": variables.get("batch_stats", {}), "step": 0}
    restored = ckpt.restore_checkpoint(path, target)
    assert int(restored["step"]) > 0
    # restored params parse into the same treedef with same shapes
    for a, b in zip(jax.tree.leaves(restored["params"]),
                    jax.tree.leaves(params)):
        assert a.shape == b.shape


def test_grad_norm_controller_behavior():
    scales = {"s": 1.0}
    # rising grad norms shrink the scale
    hist = [1.0] * 6 + [2.0] * 5
    out = grad_norm_controller(hist, dict(scales))
    assert out["s"] == pytest.approx(0.9)
    # falling grad norms grow it
    hist = [2.0] * 6 + [1.0] * 5
    out = grad_norm_controller(hist, dict(scales))
    assert out["s"] == pytest.approx(1.1)
    # clamped to [0.05, 2.0]
    out = grad_norm_controller([2.0] * 6 + [1.0] * 5, {"s": 1.95})
    assert out["s"] == 2.0
    # short history: no change
    out = grad_norm_controller([1.0] * 5, {"s": 0.5})
    assert out["s"] == 0.5


def test_train_step_deterministic_given_key(trained):
    """Same PRNG key + same batch -> bit-identical step outputs
    (SURVEY §5.2: determinism replaces the reference's global-RNG
    gumbel)."""
    from asr_model_tpu.data.dataset import data_loader
    from asr_model_tpu.data.dataset import SyntheticDataset
    from asr_model_tpu.train.loop import make_optimizer, make_train_step
    model, variables, cfg, tok, loader, tmp = trained
    batch = next(iter(loader))
    dbatch = {k: jnp.asarray(v) for k, v in batch.items()}
    params = variables["params"]
    bs = variables.get("batch_stats", {})
    tx, _ = make_optimizer(cfg, params)
    opt_state = tx.init(params)
    step = make_train_step(model, tx)
    k = jax.random.key(42)
    copy = lambda t: jax.tree.map(lambda x: jnp.array(x), t)
    p1, _, _, _, l1, g1, _ = step(copy(params), copy(opt_state),
                                  copy(bs), k, dbatch)
    p2, _, _, _, l2, g2, _ = step(copy(params), copy(opt_state),
                                  copy(bs), k, dbatch)
    assert float(l1) == float(l2)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_evaluate_model_standalone(trained):
    from asr_model_tpu.train.loop import evaluate_model
    model, variables, cfg, tok, loader, tmp = trained
    res = evaluate_model(model, tok, loader, variables, eval_steps=1,
                         max_new_tokens=4)
    assert set(res) >= {"loss", "wer", "preds", "labels", "eval_time"}
    assert np.isfinite(res["loss"])
    assert isinstance(res["preds"][0], str)


def test_remat_train_step_matches_plain():
    """jax.checkpoint rematerialization must not change the step's
    numerics: identical loss/gnorm and near-identical params after one
    step (RunConfig.remat / --remat)."""
    import jax
    import jax.numpy as jnp

    from asr_model_tpu.config import Config, Dimensions, ModelConfig
    from asr_model_tpu.models.model import Model
    from asr_model_tpu.train.loop import make_optimizer, make_train_step

    dims = Dimensions(tokens=32, mels=8, dims=16, head=2, layer=2)
    model = Model(param=dims, cfg=ModelConfig(dims=dims))
    rng = np.random.RandomState(0)
    batch = {
        "text_ids": jnp.asarray(rng.randint(3, 32, (2, 6)), jnp.int32),
        "labels": jnp.asarray(rng.randint(3, 32, (2, 6)), jnp.int32),
        "spectrogram": jnp.asarray(rng.randn(2, 8, 32), jnp.float32),
    }
    variables = jax.jit(lambda r: model.init(
        {"params": r, "gumbel": r}, batch["text_ids"],
        labels=batch["labels"], spectrogram=batch["spectrogram"]))(
            jax.random.key(0))
    cfg = Config(model=ModelConfig(dims=dims))
    tx, _ = make_optimizer(cfg, variables["params"])

    outs = {}
    for remat in (False, True):
        # fresh copies: the jitted step donates params/opt_state/stats
        params = jax.tree.map(jnp.array, variables["params"])
        bs = jax.tree.map(jnp.array, variables.get("batch_stats", {}))
        opt_state = tx.init(params)
        step = make_train_step(model, tx, remat=remat)
        p2, _, _, _, loss, gnorm, _ = step(
            params, opt_state, bs, jax.random.key(1), batch)
        outs[remat] = (float(loss), float(gnorm),
                       jax.tree.map(np.asarray, p2))
    assert outs[False][0] == pytest.approx(outs[True][0], rel=1e-6)
    # the rematerialized backward recomputes activations with different
    # fusion/reassociation — grads (and so gnorm) match only to f32
    # accumulation level (measured rel ~1.4e-5 after the encoder-LN eps
    # fix); the loss forward is bit-identical
    assert outs[False][1] == pytest.approx(outs[True][1], rel=5e-4)
    for a, b in zip(jax.tree.leaves(outs[False][2]),
                    jax.tree.leaves(outs[True][2])):
        np.testing.assert_allclose(a, b, atol=1e-6, rtol=1e-5)


def test_prefetch_overlap_matches_synchronous(tmp_path):
    """The overlapped input pipeline (RunConfig.prefetch_depth > 0:
    worker-thread batch prefetch + batch-N+1 prep between the async
    step dispatch and its loss fetch) must be a pure scheduling change:
    identical batch order, identical final params vs the fully
    synchronous loop."""
    tok = setup_tokenizer(ASSET)
    extract = dict(spectrogram=True, pitch=False, waveform=False,
                   hop_length=160, sample_rate=16000, mels=8)
    ds = SyntheticDataset(n=4, tokenizer=tok, extract_args=extract,
                          dur_range=(0.3, 0.5))
    loader = Repeated(ds, batch_size=2, pad_to_multiple=64,
                      text_pad_to_multiple=16)
    dims = Dimensions(tokens=40000, mels=8, dims=16, head=2, layer=2)

    outs = {}
    for depth in (0, 2):
        cfg = Config(
            model=ModelConfig(dims=dims),
            optim=OptimConfig(warmup_steps=2, total_steps=4),
            run=RunConfig(max_steps=4, batch_size=2, eval_interval=0,
                          save_interval=0, warmup_interval=1,
                          prefetch_depth=depth,
                          checkpoint_dir=str(tmp_path / f"d{depth}"),
                          log_dir=str(tmp_path / f"d{depth}")))
        model = Model(param=dims, cfg=cfg.model)
        variables = train_and_evaluate(model, tok, loader, loader, cfg)
        outs[depth] = jax.tree.map(np.asarray, variables["params"])
    for a, b in zip(jax.tree.leaves(outs[0]), jax.tree.leaves(outs[2])):
        np.testing.assert_array_equal(a, b)
