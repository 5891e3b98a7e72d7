"""Tiny-scale regression of the generalization protocol
(tools/demo_generalize.py / docs/GENERALIZATION.md).

Full-scale evidence lives in docs/GENERALIZATION.md (TPU runs); this
keeps the protocol itself regression-tested on CPU: training the
streaming variant on grammar sentences must reduce the teacher-forced
loss on a string-disjoint HELD-OUT set — learning that transfers to
unseen sentences, not just memorization of the training batch.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from asr_model_tpu.config import Config, Dimensions, ModelConfig, OptimConfig
from asr_model_tpu.data.collator import collate
from asr_model_tpu.data.dataset import GrammarDataset
from asr_model_tpu.data.tokenizer import setup_tokenizer

import os

ASSET = os.path.join(os.path.dirname(__file__), "..", "asr_model_tpu",
                     "assets", "tokenizer.json")


def test_grammar_dataset_properties():
    train_s, eval_s = GrammarDataset.make_split(12, 4, seed=3)
    assert len(train_s) == 12 and len(eval_s) == 4
    assert not set(train_s) & set(eval_s)
    ds = GrammarDataset(train_s[:2], tokenizer=setup_tokenizer(ASSET),
                        extract_args=dict(spectrogram=True, mels=8))
    # audio is a deterministic function of the text
    a1 = ds.render("fox dog", seed=5)
    a2 = ds.render("fox dog", seed=5)
    np.testing.assert_array_equal(a1, a2)
    # different text -> different audio
    a3 = ds.render("dog fox", seed=5)
    assert a1.shape == a3.shape and not np.allclose(a1, a3)
    item = ds[0]
    assert item["spectrogram"].shape[0] == 8
    assert len(item["labels"]) > 0


def test_heldout_loss_improves():
    tok = setup_tokenizer(ASSET)
    train_s, eval_s = GrammarDataset.make_split(16, 4, seed=0)
    ex = dict(spectrogram=True, mels=8)
    train_items = [GrammarDataset(train_s, tokenizer=tok,
                                  extract_args=ex, seed=10)[i]
                   for i in range(16)]
    eval_items = [GrammarDataset(eval_s, tokenizer=tok,
                                 extract_args=ex, seed=90)[i]
                  for i in range(4)]

    tmax = max(it["spectrogram"].shape[-1]
               for it in train_items + eval_items)
    tmax = ((tmax + 63) // 64) * 64
    for it in train_items + eval_items:
        s = it["spectrogram"]
        it["spectrogram"] = np.pad(s, ((0, 0), (0, tmax - s.shape[-1])))

    dims = Dimensions(tokens=40000, mels=8, dims=16, head=2, layer=2)
    cfg = Config(model=ModelConfig(dims=dims, streaming=True),
                 optim=OptimConfig(lr=2.5e-3, warmup_steps=5,
                                   total_steps=10_000))
    from asr_model_tpu.models.model import Model
    from asr_model_tpu.train.loop import (make_eval_step, make_optimizer,
                                          make_train_step)

    model = Model(param=dims, cfg=cfg.model)
    eval_batch = collate(eval_items, text_pad_to_multiple=16)
    deval = {k: jnp.asarray(v) for k, v in eval_batch.items()}

    first = collate(train_items[:4], text_pad_to_multiple=16)
    db = {k: jnp.asarray(v) for k, v in first.items()}
    variables = jax.jit(lambda r, b: model.init(
        {"params": r, "gumbel": r, "dropout": r}, b["text_ids"],
        labels=b["labels"], spectrogram=b["spectrogram"]))(
            jax.random.key(0), db)
    params = variables["params"]
    bs = variables.get("batch_stats", {})
    tx, _ = make_optimizer(cfg, params)
    opt_state = tx.init(params)
    step_fn = make_train_step(model, tx)
    eval_fn = make_eval_step(model)
    rng = jax.random.key(1)

    loss0, _ = eval_fn(params, bs, deval)
    loss0 = float(loss0)

    order = np.random.RandomState(2)
    for step in range(60):
        idx = order.permutation(16)[:4]
        batch = collate([train_items[i] for i in idx],
                        text_pad_to_multiple=16)
        dbatch = {k: jnp.asarray(v) for k, v in batch.items()}
        params, opt_state, bs, rng, loss, gnorm, _ = step_fn(
            params, opt_state, bs, rng, dbatch)

    loss1, _ = eval_fn(params, bs, deval)
    loss1 = float(loss1)
    assert np.isfinite(loss1)
    # held-out (string-disjoint) loss must drop substantially
    assert loss1 < 0.5 * loss0, (loss0, loss1)
