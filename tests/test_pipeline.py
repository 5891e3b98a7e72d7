"""Pipeline parallelism: exactness vs the unsharded chained model
(forward AND gradients, eval mode), DP x PP composition, param
round-trip, and a training-step smoke test (SURVEY §2.5 item 5).

Contract (pipeline.py module docstring): microbatches=1 equals the
full-batch unsharded forward; microbatches=M equals the unsharded
forward applied per microbatch (MSheath's jump control is batch-mean
by reference parity, so the microbatch is the control unit — gradient
accumulation semantics).

Tolerances: the tiny test config (dims=16, layer=4) is ill-conditioned
in f32 — the UNSHARDED jitted f32 forward is itself ~9e-4 relative
from the f64-truth forward (logit magnitudes reach ~700), so any
differently-associated-but-correct f32 program (shard_map stages,
'data'-axis pmean of the jump-control scalars) lands at the same
~1e-3 level.  Tolerances sit above that conditioning floor; a
schedule/logic error (wrong microbatch↔stage mapping, wrong xa slice)
shows as O(1) relative divergence, far outside them."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from asr_model_tpu.config import Dimensions, ModelConfig
from asr_model_tpu.models.model import Model, cross_entropy_ignore_pad
from asr_model_tpu.parallel.pipeline import (
    from_pipeline_params, make_pipe_mesh, make_pp_train_step,
    pipeline_forward, shard_pipeline_params, to_pipeline_params)

pytestmark = pytest.mark.distributed

DIMS = Dimensions(tokens=50, mels=8, dims=16, head=2, layer=4)


@pytest.fixture(scope="module")
def setup():
    model = Model(param=DIMS,
                  cfg=ModelConfig(dims=DIMS, chained_blocks=True))
    B, T, TF = 4, 6, 12
    rng = np.random.RandomState(0)
    batch = {
        "text_ids": jnp.asarray(rng.randint(3, 50, (B, T))),
        "labels": jnp.asarray(rng.randint(3, 50, (B, T))),
        "spectrogram": jnp.asarray(rng.randn(B, 8, TF), jnp.float32),
        "pitch": jnp.asarray(rng.rand(B, 1, TF), jnp.float32),
    }
    variables = jax.jit(lambda r, b: model.init(
        {"params": r, "gumbel": r}, b["text_ids"], labels=b["labels"],
        spectrogram=b["spectrogram"], pitch=b["pitch"]))(
            jax.random.key(0), batch)

    fwd = jax.jit(lambda v, b: model.apply(
        v, b["text_ids"], labels=b["labels"],
        spectrogram=b["spectrogram"], pitch=b["pitch"]))

    def ref_logits(micro):
        """Unsharded forward applied per microbatch, concatenated."""
        B = batch["text_ids"].shape[0]
        bm = B // micro
        outs = []
        for i in range(micro):
            sl = {k: v[i * bm:(i + 1) * bm] for k, v in batch.items()}
            outs.append(fwd(variables, sl)["logits"])
        return jnp.concatenate(outs, axis=0)

    return model, variables, batch, fwd, ref_logits


@pytest.mark.parametrize("data,pipe,micro", [(1, 4, 1), (2, 2, 2),
                                             (2, 4, 2)])
def test_pp_forward_matches_unsharded(setup, data, pipe, micro):
    model, variables, batch, fwd, ref_logits = setup
    mesh = make_pipe_mesh(pipe=pipe, data=data)
    pp = to_pipeline_params(variables["params"])
    pp = shard_pipeline_params(pp, mesh)
    logits, new_bs = jax.jit(
        lambda p, b: pipeline_forward(
            model, p, b, mesh, micro,
            batch_stats=variables["batch_stats"]))(pp, batch)
    assert new_bs is None
    np.testing.assert_allclose(np.asarray(logits),
                               np.asarray(ref_logits(micro)),
                               rtol=5e-3, atol=5e-3)


def test_pp_gradients_match_unsharded(setup):
    """f64 comparison: in f32 the two (correct) programs differ at the
    conditioning floor (~1e-3 relative, plus O(1) flips on a handful of
    top-k router elements near selection ties), which a tolerance can't
    separate from a real logic error.  In f64 both programs compute the
    same math to ~1e-12, so a tight tolerance pins the schedule, the
    batch_pmean control scalars, AND the depthwise-conv kernel-grad
    partitioning (test_parallel.py::test_depthwise_conv_grad_partition_
    safe has the 30-line repro of the XLA bug this once caught)."""
    model, variables, batch, fwd, ref_logits = setup
    mesh = make_pipe_mesh(pipe=4, data=2)

    def to64(t):
        return jax.tree.map(
            lambda a: a.astype(jnp.float64)
            if a.dtype == jnp.float32 else a, t)

    with jax.enable_x64(True):
        params = to64(jax.device_get(variables["params"]))
        bs = to64(jax.device_get(variables["batch_stats"]))
        b64 = to64({k: jax.device_get(v) for k, v in batch.items()})

        def ref_loss(p):
            out = model.apply({"params": p, "batch_stats": bs},
                              b64["text_ids"], labels=b64["labels"],
                              spectrogram=b64["spectrogram"],
                              pitch=b64["pitch"])
            return out["loss"]

        def pp_loss(p):
            logits, _ = pipeline_forward(model, p, b64, mesh, 1,
                                         batch_stats=bs)
            return cross_entropy_ignore_pad(logits, b64["labels"])

        g_ref = jax.device_get(jax.jit(jax.grad(ref_loss))(params))
        pp = shard_pipeline_params(to_pipeline_params(params), mesh)
        g_pp = jax.device_get(jax.jit(jax.grad(pp_loss))(pp))
    # compare in the unsharded layout
    g_pp_un = from_pipeline_params(g_pp)
    flat_pp = {tuple(str(getattr(k, "key", k)) for k in path): leaf
               for path, leaf in
               jax.tree_util.tree_leaves_with_path(g_pp_un)}
    for path, leaf in jax.tree_util.tree_leaves_with_path(g_ref):
        key = tuple(str(getattr(k, "key", k)) for k in path)
        np.testing.assert_allclose(
            np.asarray(flat_pp[key]), np.asarray(leaf),
            rtol=1e-8, atol=1e-10, err_msg="/".join(key))


def test_param_roundtrip(setup):
    model, variables, batch, fwd, ref_logits = setup
    pp = to_pipeline_params(variables["params"])
    back = from_pipeline_params(pp)
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(variables["params"]),
            jax.tree_util.tree_leaves_with_path(back)):
        assert jax.tree_util.keystr(pa) == jax.tree_util.keystr(pb)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pp_requires_chained():
    model = Model(param=DIMS, cfg=ModelConfig(dims=DIMS))
    mesh = make_pipe_mesh(pipe=4, data=1)
    with pytest.raises(ValueError, match="chained"):
        pipeline_forward(model, {}, {}, mesh, 2)


def test_pp_optimizer_matches_unsharded(setup):
    """make_pp_optimizer == the unsharded MaxFactor per block.

    The stacked (L, ...) layout must not change optimizer math: naive
    stock-MaxFactor-over-stacked would pool per-tensor statistics
    across blocks and flip the ndim<3 max-vs-norm gate for every block
    matrix (pipeline.py make_pp_optimizer docstring).  Synthetic
    deterministic grads, two consecutive steps (state advance)."""
    from asr_model_tpu.config import Config
    from asr_model_tpu.parallel.pipeline import make_pp_optimizer
    from asr_model_tpu.train.loop import make_optimizer
    model, variables, batch, fwd, ref_logits = setup
    params = variables["params"]
    cfg = Config()
    tx, _ = make_optimizer(cfg, params)
    pp_params = to_pipeline_params(params)
    pp_tx, _ = make_pp_optimizer(cfg, pp_params)

    s = tx.init(params)
    ps = pp_tx.init(pp_params)

    def check(u_ref, u_pp):
        got = {jax.tree_util.keystr(k): v for k, v in
               jax.tree_util.tree_leaves_with_path(
                   from_pipeline_params(u_pp))}
        for k, v in jax.tree_util.tree_leaves_with_path(u_ref):
            np.testing.assert_allclose(
                np.asarray(got[jax.tree_util.keystr(k)]), np.asarray(v),
                rtol=1e-6, atol=1e-8, err_msg=jax.tree_util.keystr(k))

    for i in range(2):
        g = jax.tree.map(lambda p, i=i: jnp.cos(p * (3.0 + i)) * 0.1,
                         params)
        u, s = jax.jit(tx.update)(g, s, params)
        pu, ps = jax.jit(pp_tx.update)(to_pipeline_params(g), ps,
                                       pp_params)
        check(u, pu)


def test_cli_pipe_synthetic_train(tmp_path):
    """User-facing PP+DP training: the CLI drives the GPipe train path
    on the 8-device mesh end to end (--mesh-pipe), including eval on
    the unstacked layout and the canonical final checkpoint."""
    import os

    from asr_model_tpu import cli

    variables = cli.main([
        "--synthetic", "8", "--max-steps", "2", "--batch-size", "4",
        "--dims", "16", "--head", "2", "--layer", "4", "--mels", "8",
        "--no-pitch", "--no-waveform", "--pad-multiple", "64",
        "--eval-interval", "2", "--save-interval", "2",
        "--chained-blocks", "--mesh-pipe", "2", "--mesh-data", "2",
        "--microbatches", "2",
        "--log-dir", str(tmp_path), "--checkpoint-dir", str(tmp_path)])
    assert "params" in variables
    # returned params are the canonical unsharded layout
    assert "block0" in variables["params"]["processor"]
    # final checkpoint is stored in the canonical unsharded layout
    # (Transcriber.from_checkpoint's restore target)
    final = os.path.join(str(tmp_path), "final_model.msgpack")
    assert os.path.exists(final)
    from flax import serialization
    with open(final, "rb") as f:
        blob = serialization.msgpack_restore(f.read())
    assert "block0" in blob["params"]["processor"]
    assert "blocks" not in blob["params"]["processor"]
    # the final optimizer state is the TRANSFORMED pipeline state
    # (from_pipeline_opt_state), not a fresh init: MaxFactor statistics
    # survive resume-from-final after a PP run
    opt = blob["opt_state"]
    assert int(opt["step"]) == 2
    assert "block0" in opt["row_var"]["processor"]
    import numpy as _np
    total = sum(float(_np.max(_np.abs(_np.asarray(v))))
                for v in jax.tree.leaves(opt["row_var"]))
    assert total > 0


def test_pp_opt_state_topology_move_is_exact(setup):
    """Resume-after-PP (VERDICT r4 weak #7): after N pipeline-layout
    optimizer steps, ``from_pipeline_opt_state`` moves the state to the
    unsharded layout and the stock optimizer continues from it — the
    MaxFactor row_var/col_var/v/step statistics must survive the move
    (bit-exact state, same next-step update), and the round trip back
    to the pipeline layout must be the identity."""
    from asr_model_tpu.config import Config
    from asr_model_tpu.parallel.pipeline import (from_pipeline_opt_state,
                                                 make_pp_optimizer,
                                                 to_pipeline_opt_state)
    from asr_model_tpu.train.loop import make_optimizer
    model, variables, batch, fwd, ref_logits = setup
    params = variables["params"]
    cfg = Config()
    tx, _ = make_optimizer(cfg, params)
    pp_params = to_pipeline_params(params)
    pp_tx, _ = make_pp_optimizer(cfg, pp_params)

    # two pipeline-layout steps (params advance: alpha reads param RMS)
    ps = pp_tx.init(pp_params)
    import optax
    for i in range(2):
        g = jax.tree.map(lambda p, i=i: jnp.cos(p * (3.0 + i)) * 0.1,
                         pp_params)
        u, ps = jax.jit(pp_tx.update)(g, ps, pp_params)
        pp_params = optax.apply_updates(pp_params, u)
    params_un = from_pipeline_params(pp_params)

    # the topology move: converted state == a fresh unsharded state's
    # STRUCTURE with the pipeline run's VALUES
    s_conv = from_pipeline_opt_state(ps)
    s_fresh = tx.init(params_un)
    assert (jax.tree_util.tree_structure(s_conv)
            == jax.tree_util.tree_structure(s_fresh))
    assert int(s_conv.step) == 2
    # block statistics are the sliced stacked ones, bit-exact; a fresh
    # state would be all zeros
    for i in [0, DIMS.layer - 1]:
        blk = jax.tree.map(lambda a, i=i: a[i], ps["blocks"].row_var)
        got = s_conv.row_var["processor"][f"block{i}"]
        for a, b in zip(jax.tree.leaves(got), jax.tree.leaves(blk)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert max(float(jnp.max(jnp.abs(v)))
               for v in jax.tree.leaves(s_conv.row_var)) > 0

    # continuing one step in the unsharded layout == continuing in the
    # pipeline layout (same math, per-block)
    g3 = jax.tree.map(lambda p: jnp.cos(p * 5.0) * 0.1, pp_params)
    pu3, ps3 = jax.jit(pp_tx.update)(g3, ps, pp_params)
    u3, s3 = jax.jit(tx.update)(from_pipeline_params(g3), s_conv,
                                params_un)
    got = {jax.tree_util.keystr(k): v for k, v in
           jax.tree_util.tree_leaves_with_path(from_pipeline_params(pu3))}
    for k, v in jax.tree_util.tree_leaves_with_path(u3):
        np.testing.assert_allclose(
            np.asarray(got[jax.tree_util.keystr(k)]), np.asarray(v),
            rtol=1e-6, atol=1e-8, err_msg=jax.tree_util.keystr(k))

    # round trip is the identity
    back = to_pipeline_opt_state(s_conv)
    for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_leaves_with_path(back),
            jax.tree_util.tree_leaves_with_path(ps)):
        assert jax.tree_util.keystr(ka) == jax.tree_util.keystr(kb)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=jax.tree_util.keystr(ka))


def test_pp_opt_state_move_multisteps(setup):
    """The same topology move under optax.MultiSteps (acc_steps > 1):
    counters and accumulated grads transfer too."""
    from asr_model_tpu.config import Config, RunConfig
    from asr_model_tpu.parallel.pipeline import (from_pipeline_opt_state,
                                                 make_pp_optimizer,
                                                 to_pipeline_opt_state)
    from asr_model_tpu.train.loop import make_optimizer
    model, variables, batch, fwd, ref_logits = setup
    params = variables["params"]
    cfg = Config(run=RunConfig(acc_steps=2))
    tx, _ = make_optimizer(cfg, params)
    pp_params = to_pipeline_params(params)
    pp_tx, _ = make_pp_optimizer(cfg, pp_params)
    ps = pp_tx.init(pp_params)
    # one mini-step: grads accumulate, inner state untouched
    g = jax.tree.map(lambda p: jnp.sin(p * 2.0) * 0.1, pp_params)
    _, ps = jax.jit(pp_tx.update)(g, ps, pp_params)
    s_conv = from_pipeline_opt_state(ps)
    s_fresh = tx.init(from_pipeline_params(pp_params))
    assert (jax.tree_util.tree_structure(s_conv)
            == jax.tree_util.tree_structure(s_fresh))
    assert int(s_conv.mini_step) == 1
    assert max(float(jnp.max(jnp.abs(v)))
               for v in jax.tree.leaves(s_conv.acc_grads)) > 0
    back = to_pipeline_opt_state(s_conv)
    for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_leaves_with_path(back),
            jax.tree_util.tree_leaves_with_path(ps)):
        assert jax.tree_util.keystr(ka) == jax.tree_util.keystr(kb)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=jax.tree_util.keystr(ka))


def test_pp_train_step_runs_and_learns(setup):
    from asr_model_tpu.config import Config, OptimConfig
    from asr_model_tpu.parallel.pipeline import (make_pp_optimizer,
                                                 shard_pp_opt_state)
    model, variables, batch, fwd, ref_logits = setup
    mesh = make_pipe_mesh(pipe=2, data=2)
    pp_host = to_pipeline_params(variables["params"])
    # the per-block-exact optimizer — stock maxfactor over the stacked
    # layout is a DIFFERENT optimizer (ndim<3 gate flips; see
    # make_pp_optimizer docstring) and does not reliably descend
    cfg = Config(optim=OptimConfig(lr=1e-3, warmup_steps=1,
                                   total_steps=10))
    tx, _ = make_pp_optimizer(cfg, pp_host)
    opt_state = shard_pp_opt_state(tx.init(pp_host), mesh)
    pp = shard_pipeline_params(pp_host, mesh)
    step = make_pp_train_step(model, tx, mesh, microbatches=2)
    bs = variables["batch_stats"]
    rng = jax.random.key(1)
    losses = []
    for _ in range(10):
        pp, opt_state, bs, rng, loss, gnorm, jstat = step(
            pp, opt_state, bs, rng, batch)
        losses.append(float(loss))
        assert np.isfinite(losses[-1]) and np.isfinite(float(gnorm))
    # the tiny random-init config is ill-conditioned (sum-CE ~440,
    # logit magnitudes ~700) — single steps can bounce; repeated steps
    # on one batch must descend overall
    assert min(losses[1:]) < losses[0], losses


def test_pp_train_step_bf16(setup):
    """PP x mixed precision: the GPipe step under compute_dtype=bf16
    keeps f32 master params/optimizer state, emits an f32 loss, and is
    re-entrant through its donated arguments (same recipe as the
    DP/TP/EP step, tests/test_bf16_train.py)."""
    from asr_model_tpu.config import Config, OptimConfig
    from asr_model_tpu.parallel.pipeline import (make_pp_optimizer,
                                                 shard_pp_opt_state)
    model, variables, batch, fwd, ref_logits = setup
    mesh = make_pipe_mesh(pipe=2, data=2)
    pp_host = to_pipeline_params(variables["params"])
    cfg = Config(optim=OptimConfig(lr=1e-3, warmup_steps=1,
                                   total_steps=10))
    tx, _ = make_pp_optimizer(cfg, pp_host)
    opt_state = shard_pp_opt_state(tx.init(pp_host), mesh)
    pp = shard_pipeline_params(pp_host, mesh)
    step = make_pp_train_step(model, tx, mesh, microbatches=2,
                              compute_dtype=jnp.bfloat16)
    bs = variables["batch_stats"]
    rng = jax.random.key(1)
    before = jax.tree.map(np.asarray, pp_host)
    for _ in range(2):
        pp, opt_state, bs, rng, loss, gnorm, jstat = step(
            pp, opt_state, bs, rng, batch)
        assert loss.dtype == jnp.float32
        assert np.isfinite(float(loss)) and np.isfinite(float(gnorm))
    moved = 0.0
    for (path, a), b in zip(jax.tree_util.tree_leaves_with_path(pp),
                            jax.tree.leaves(before)):
        assert a.dtype == b.dtype, jax.tree_util.keystr(path)
        moved += float(jnp.sum(jnp.abs(a.astype(jnp.float32)
                                       - jnp.asarray(b, jnp.float32))))
    assert moved > 0
    for a, b in zip(jax.tree.leaves(bs),
                    jax.tree.leaves(variables["batch_stats"])):
        assert a.dtype == b.dtype
