"""Pipeline parallelism (PP) over the chained block stack.

Greenfield (SURVEY §2.5 item 5 — the reference has no parallelism of
any kind; its block loop, model.py:617-626, is the natural pipeline
target once ``chained_blocks=True`` actually feeds g back).

TPU-native design — a GPipe microbatch schedule expressed as a single
SPMD program, not a multi-process runtime:

* block params are STACKED on a leading layer axis and sharded over a
  ``pipe`` mesh axis (``to_pipeline_params`` / ``pipeline_shardings``)
  — each device holds ``layer / pipe`` consecutive blocks, weights
  stay resident (no weight motion, only activations move);
* the schedule is one ``lax.scan`` over ``M + P - 1`` ticks inside a
  ``shard_map``: every tick each stage runs its blocks on its current
  microbatch and the carry ``g`` hops one stage forward via a single
  neighbor ``ppermute`` over ICI;
* the batch axis composes with DP: the same shard_map runs over a
  ('data', 'pipe') mesh, microbatch rows sharded over 'data', so a
  4-chip pipeline on a 32-chip slice runs 8 data-parallel pipelines;
* backward needs no hand-written schedule: XLA transposes the scan and
  the ppermute (reverse-direction hops), yielding the standard
  reverse-pipeline backward.

Embedding (``Processor.embed``), the audio encoder, and the logits
head run OUTSIDE the pipe region as ordinary (data-sharded) SPMD —
they are cheap relative to the L-block stack that PP exists to split.

Exactness contract (tests/test_pipeline.py, eval mode):

* microbatches=1 — bit-exact (to f32 rounding) vs the unsharded
  ``chained=True`` forward, for any (data, pipe) mesh.  The DP axis
  stays exact because MSheath's batch-mean jump-control scalars are
  pmean'd over 'data' inside the stage (``sheath.batch_pmean``),
  matching the global means XLA SPMD computes in the jit DP path.
* microbatches=M>1 — bit-exact vs the unsharded forward applied to
  each microbatch independently (gradient-accumulation semantics):
  MSheath's control scalars are DELIBERATELY batch-coupled (reference
  parity — its .item() jump control, model.py:478), so a microbatch is
  the control-decision unit, exactly as it is under
  ``RunConfig.acc_steps`` gradient accumulation.  Cross-microbatch
  control coupling would serialize the pipeline (every stage would
  need the same-layer statistics of every other in-flight microbatch,
  which sit at different ticks by construction).

In training the gumbel routing keys are derived per (block, microbatch,
data-shard) by ``fold_in`` — a valid but different stream from the
unsharded flax path-derived one (documented divergence; the unsharded
stream depends on flax module-path hashing that a stage-local apply
cannot reproduce).

Bubble: (P-1)/(M+P-1) of ticks idle per stage — choose microbatches
M >> P.  Memory: activations for all M microbatches are live (GPipe);
combine with ``RunConfig.remat`` for long sequences.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from asr_model_tpu.models.decoder import Residual, encode_xa, run_block
from asr_model_tpu.models.model import (Model, cross_entropy_ignore_pad,
                                        modality_slots)
from asr_model_tpu.models.sheath import batch_pmean

PipeAxes = ("data", "pipe")


def make_pipe_mesh(pipe: int, data: int = 1, devices=None) -> Mesh:
    """A ('data', 'pipe') mesh over the first data*pipe devices.
    Adjacent pipe coordinates are adjacent in device order, so stage
    hops ride ICI neighbors on real slices."""
    import numpy as np
    devices = list(devices if devices is not None else jax.devices())
    n = data * pipe
    if len(devices) < n:
        raise ValueError(f"pipe mesh {data}x{pipe} needs {n} devices, "
                         f"have {len(devices)}")
    arr = np.asarray(devices[:n], dtype=object).reshape(data, pipe)
    return Mesh(arr, PipeAxes)


# ---------------------------------------------------------------------------
# param re-layout: block0..block{L-1} <-> one stacked 'blocks' subtree

def _split_blocks(params: Dict) -> Tuple[Dict, Dict, int]:
    """(params-without-blocks, {name: subtree}, L). Shallow-copies only
    the touched levels."""
    proc = dict(params["processor"])
    blocks = {}
    i = 0
    while f"block{i}" in proc:
        blocks[f"block{i}"] = proc.pop(f"block{i}")
        i += 1
    out = dict(params)
    out["processor"] = proc
    return out, blocks, i


def to_pipeline_params(params: Dict) -> Dict:
    """Replace processor/block{i} subtrees with one stacked
    processor/blocks subtree (leading axis = layer).  The stacked tree
    is what the PP train step owns and the optimizer updates — its
    leading axis shards over 'pipe' (``pipeline_shardings``)."""
    base, blocks, L = _split_blocks(params)
    if L < 2:
        raise ValueError("pipeline params need a chained stack (layer>=2)")
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs),
                           *[blocks[f"block{i}"] for i in range(L)])
    base["processor"] = dict(base["processor"], blocks=stacked)
    return base


def from_pipeline_params(pp_params: Dict) -> Dict:
    """Inverse of ``to_pipeline_params`` (for checkpoint interchange
    with the unsharded model)."""
    proc = dict(pp_params["processor"])
    stacked = proc.pop("blocks")
    L = jax.tree.leaves(stacked)[0].shape[0]
    for i in range(L):
        proc[f"block{i}"] = jax.tree.map(lambda a, i=i: a[i], stacked)
    out = dict(pp_params)
    out["processor"] = proc
    return out


def _base_variables(pp_params: Dict, batch_stats=None) -> Dict:
    """Variables for the encode/embed/head applies: everything except
    the stacked blocks (flax only resolves params a method touches)."""
    proc = dict(pp_params["processor"])
    proc.pop("blocks", None)
    params = dict(pp_params)
    params["processor"] = proc
    v = {"params": params}
    if batch_stats is not None:
        v["batch_stats"] = batch_stats
    return v


def pipeline_shardings(pp_params, mesh: Mesh):
    """NamedSharding tree: stacked block leaves shard their leading
    (layer) axis over 'pipe'; everything else replicated."""

    def leaf(path, x):
        names = [str(getattr(k, "key", k)) for k in path]
        if "blocks" in names:
            return NamedSharding(
                mesh, P("pipe", *([None] * (x.ndim - 1))))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(leaf, pp_params)


def shard_pipeline_params(pp_params, mesh: Mesh):
    return jax.device_put(pp_params, pipeline_shardings(pp_params, mesh))


def shard_pp_opt_state(opt_state, mesh: Mesh):
    """Place a make_pp_optimizer state: the vmapped 'blocks' subtree
    (every leaf carries the leading layer axis) shards over 'pipe' —
    optimizer state lives with the stage that owns the weights — and
    the 'base' subtree replicates."""
    sh = {
        "base": jax.tree.map(
            lambda _: NamedSharding(mesh, P()), opt_state["base"]),
        "blocks": jax.tree.map(
            lambda a: NamedSharding(
                mesh, P("pipe", *([None] * (a.ndim - 1)))),
            opt_state["blocks"]),
    }
    return jax.device_put(opt_state, sh)


# ---------------------------------------------------------------------------
# the pipelined block stack

def _microbatch(x, m: int):
    """(B, ...) -> (M, B/M, ...); microbatch i is rows [i*Bm, (i+1)*Bm)."""
    b = x.shape[0]
    if b % m:
        raise ValueError(f"batch {b} not divisible by microbatches {m}")
    return x.reshape((m, b // m) + x.shape[1:])


def _pipe_blocks(residual: Residual, mesh: Mesh, n_stages: int, layer: int,
                 microbatches: int, streaming: bool, causal_all: bool,
                 stacked, x_mb, xa_mb: Dict, pt_mb, tv_mb, gkey_data):
    """The shard_map'd GPipe schedule.  Per-device view:

    stacked: block params, leading axis = layer/n_stages (this stage's
    blocks); x_mb (M, Bm, T, D) embedded text microbatches; xa_mb:
    slot -> (M, Bm, Ta, D) encoder outputs; pt_mb (M, Bm, T, D) or
    None; tv_mb (M, Bm, T) or None; gkey_data uint32 key-data or None
    (training gumbel routing).  Returns (d, g) each (M, Bm, T, D).

    AD hygiene: every differentiable input/output crosses the
    shard_map boundary with an EXPLICIT leading 'pipe' axis (inputs
    tiled by broadcast_to, outputs stacked and summed outside), so no
    transpose relies on unmentioned-axis replication semantics under
    ``check_vma=False`` — broadcast_to's transpose is a plain
    reduce-sum over the pipe axis, i.e. each stage's xa/x cotangent
    contribution summed by ordinary SPMD ops.  (The pipe-x-scaled
    encoder gradients seen in round 3 were NOT this boundary — they
    were XLA's grouped-conv kernel-grad partitioning bug, fixed at the
    source in tlayers.dwconv_same; this explicit layout is kept as
    defense in depth against transpose-metadata semantics changing
    across jax versions.)"""
    k = layer // n_stages
    M = microbatches
    P_ = n_stages

    def device_fn(w_local, x_mb, xa_mb, pt_mb, tv_mb, gkey_data):
        # strip the local (size-1) pipe axis the explicit specs add
        unpipe = lambda t: jax.tree.map(lambda a: a[0], t)
        x_mb = unpipe(x_mb)
        xa_mb = unpipe(xa_mb)
        pt_mb = unpipe(pt_mb)
        tv_mb = unpipe(tv_mb)
        idx = jax.lax.axis_index("pipe")
        if gkey_data is not None:
            gkey = jax.random.wrap_key_data(gkey_data)
            gkey = jax.random.fold_in(gkey, jax.lax.axis_index("data"))

        def pick(tree, i):
            return jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(
                    a, i, axis=0, keepdims=False), tree)

        def stage(x, xa_cur, pt_cur, tv_cur, mb):
            d = g = x
            for j in range(k):
                w_j = jax.tree.map(lambda a, j=j: a[j], w_local)
                rngs = None
                if gkey_data is not None:
                    key = jax.random.fold_in(gkey, idx * k + j)
                    rngs = {"gumbel": jax.random.fold_in(key, mb)}

                def body(mod, x=x):
                    enc = encode_xa(mod, xa_cur, pt=pt_cur)
                    return run_block(mod, x, enc, streaming=streaming,
                                     causal_all=causal_all, pt=pt_cur,
                                     text_valid=tv_cur)

                d, g = residual.apply({"params": w_j}, method=body,
                                      rngs=rngs)
                x = g
            return d, g

        def tick(carry, t):
            state, out_d, out_g = carry
            mb = t - idx                       # this stage's microbatch
            mbc = jnp.clip(mb, 0, M - 1)
            x_in = jnp.where(idx == 0,
                             pick(x_mb, jnp.clip(t, 0, M - 1)), state)
            xa_cur = pick(xa_mb, mbc)
            pt_cur = None if pt_mb is None else pick(pt_mb, mbc)
            tv_cur = None if tv_mb is None else pick(tv_mb, mbc)
            d, g = stage(x_in, xa_cur, pt_cur, tv_cur, mbc)
            write = (mb >= 0) & (mb < M) & (idx == P_ - 1)
            out_d = jnp.where(write, jax.lax.dynamic_update_slice_in_dim(
                out_d, d[None].astype(out_d.dtype), mbc, axis=0), out_d)
            out_g = jnp.where(write, jax.lax.dynamic_update_slice_in_dim(
                out_g, g[None].astype(out_g.dtype), mbc, axis=0), out_g)
            state = jax.lax.ppermute(
                g, "pipe", [(i, (i + 1) % P_) for i in range(P_)])
            return (state, out_d, out_g), None

        # bubble-tick seed: microbatch 0's activations, not zeros —
        # bubble outputs are masked anyway, and all-zero rows pushed through
        # norms/rotary sit at non-differentiable points whose NaN/inf
        # Jacobians would leak into weight grads via 0-cotangents
        zero_state = pick(x_mb, 0)
        zeros_out = jnp.zeros_like(x_mb)
        # MSheath's jump-control scalars are batch means; pmean them
        # over 'data' so the per-shard means equal the global
        # microbatch means (sheath.batch_pmean docstring)
        with batch_pmean("data"):
            (_, out_d, out_g), _ = jax.lax.scan(
                tick, (zero_state, zeros_out, zeros_out),
                jnp.arange(M + P_ - 1))
        # only the last stage wrote (write mask above); re-add the
        # explicit pipe axis — the caller sums the stage-stacked
        # result, zeros everywhere but the last stage's slice
        return out_d[None], out_g[None]

    mb_spec = P("pipe", None, "data")
    w_spec = jax.tree.map(
        lambda a: P("pipe", *([None] * (a.ndim - 1))), stacked)
    xa_spec = jax.tree.map(lambda _: mb_spec, xa_mb)
    fn = shard_map(
        device_fn, mesh=mesh,
        in_specs=(w_spec, mb_spec, xa_spec, mb_spec, mb_spec, P()),
        out_specs=(mb_spec, mb_spec),
        check_vma=False)

    def tile(tree):
        # explicit pipe axis: per-device shard is identical to the
        # former replicated copy (no extra memory); the broadcast's
        # transpose sums per-stage cotangents
        return jax.tree.map(
            lambda a: jnp.broadcast_to(a[None], (P_,) + a.shape), tree)

    out_d, out_g = fn(stacked, tile(x_mb), tile(xa_mb), tile(pt_mb),
                      tile(tv_mb), gkey_data)
    return out_d.sum(axis=0), out_g.sum(axis=0)


def _residual_for(model: Model) -> Residual:
    p = model.param
    return Residual(p.dims, p.head, p.layer, p.act, p.n_type)


def pipeline_forward(model: Model, pp_params, batch: Dict, mesh: Mesh,
                     microbatches: int, batch_stats=None,
                     train: bool = False, rngs: Optional[Dict] = None,
                     text_valid=None):
    """Full forward with the block stack pipelined over mesh axis
    'pipe' (DP over 'data' composes via input sharding).

    batch: the collator dict (text_ids + feature tracks).  Returns
    (logits, new_batch_stats) — new_batch_stats is None unless
    ``train`` (BatchNorm running stats, encoder-only).

    Stages: encode + embed (plain SPMD) -> _pipe_blocks (shard_map
    GPipe) -> logits_head (plain SPMD)."""
    cfg = model.cfg
    if not cfg.chained_blocks:
        raise ValueError("pipeline parallelism needs chained_blocks=True "
                         "(parity mode runs a single live block)")
    n_stages = mesh.shape["pipe"]
    if model.param.layer % n_stages:
        raise ValueError(f"layer {model.param.layer} not divisible by "
                         f"pipe axis {n_stages}")
    rngs = rngs or {}
    variables = _base_variables(pp_params, batch_stats)

    xa = modality_slots(pitch=batch.get("pitch"),
                        spectrogram=batch.get("spectrogram"),
                        waveform=batch.get("waveform"),
                        pitch_tokens=batch.get("pitch_tokens"))
    new_bs = None
    if train:
        enc_rngs = ({"dropout": rngs["dropout"]}
                    if "dropout" in rngs else None)
        xa, mut = model.apply(variables, xa, train=True,
                              method=Model.encode,
                              mutable=["batch_stats"], rngs=enc_rngs)
        new_bs = mut.get("batch_stats")
    else:
        xa = model.apply(variables, xa, train=False, method=Model.encode)

    ids = batch["text_ids"]
    x, pt_emb = model.apply(
        variables, ids, xa.get("pt"),
        method=lambda m, ids, pt: m.processor.embed(ids, pt_raw=pt))

    M = microbatches
    x_mb = _microbatch(x, M)
    xa_mb = {s: _microbatch(xa[s], M)
             for s in ("a", "b", "c") if xa.get(s) is not None}
    pt_mb = None if pt_emb is None else _microbatch(pt_emb, M)
    tv_mb = None if text_valid is None else _microbatch(text_valid, M)
    gkey_data = (jax.random.key_data(rngs["gumbel"])
                 if train and "gumbel" in rngs else None)

    d_mb, g_mb = _pipe_blocks(
        _residual_for(model), mesh, n_stages, model.param.layer, M,
        cfg.streaming, cfg.causal_all or cfg.streaming,
        pp_params["processor"]["blocks"], x_mb, xa_mb, pt_mb, tv_mb,
        gkey_data)

    d = d_mb.reshape((-1,) + d_mb.shape[2:])
    g = g_mb.reshape((-1,) + g_mb.shape[2:])
    logits = model.apply(
        variables, d, g,
        method=lambda m, d, g: m.processor.logits_head(d, g, seq=False))
    return logits, new_bs


def _split_base_blocks(pp_params: Dict) -> Tuple[Dict, Any]:
    proc = dict(pp_params["processor"])
    blocks = proc.pop("blocks")
    base = dict(pp_params)
    base["processor"] = proc
    return base, blocks


def _merge_base_blocks(base: Dict, blocks) -> Dict:
    out = dict(base)
    out["processor"] = dict(base["processor"], blocks=blocks)
    return out


def _merge_state_param_tree(base_tree, blocks_tree):
    """Merge a base-params-shaped state tree with an (L, ...)-stacked
    block-params-shaped state tree into the UNSHARDED params-shaped
    tree (processor/block{i} subtrees restored by slicing the layer
    axis) — the state-tree analogue of ``from_pipeline_params``."""
    L = jax.tree.leaves(blocks_tree)[0].shape[0]
    proc = dict(base_tree["processor"])
    for i in range(L):
        proc[f"block{i}"] = jax.tree.map(lambda a, i=i: a[i], blocks_tree)
    out = dict(base_tree)
    out["processor"] = proc
    return out


def _split_state_param_tree(tree):
    """Inverse of ``_merge_state_param_tree``: (base_tree,
    (L, ...)-stacked blocks_tree)."""
    base, blocks, L = _split_blocks(tree)
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs),
                           *[blocks[f"block{i}"] for i in range(L)])
    return base, stacked


def from_pipeline_opt_state(opt_state):
    """Transform a ``make_pp_optimizer`` state ({'base', 'blocks'})
    into the state ``make_optimizer(cfg, unsharded_params).init`` would
    have evolved to — PRESERVING MaxFactor's row_var/col_var/v/step
    statistics, so resuming single-device/DP training from a
    final-after-PP checkpoint continues the optimizer trajectory
    instead of silently restarting it (the reference never restores
    optimizer state at all, SURVEY §5.4; this framework's resume
    contract is stronger and must hold across topology moves).

    Handles the optax.MultiSteps wrapper (acc_steps > 1): mini/gradient
    step counters come from the base state (base and blocks step in
    lockstep), accumulated grads merge like the variance trees."""
    base, blocks = opt_state["base"], opt_state["blocks"]
    return _convert_pp_state(base, blocks)


def _convert_pp_state(base, blocks):
    if hasattr(base, "inner_opt_state"):          # optax.MultiStepsState
        return base._replace(
            inner_opt_state=_convert_pp_state(base.inner_opt_state,
                                              blocks.inner_opt_state),
            acc_grads=_merge_state_param_tree(base.acc_grads,
                                              blocks.acc_grads))
    # MaxFactorState: step is a scalar in base, (L,) in the vmapped
    # blocks state — all entries equal by construction (one update per
    # train step), so base.step is THE step
    return base._replace(
        row_var=_merge_state_param_tree(base.row_var, blocks.row_var),
        col_var=_merge_state_param_tree(base.col_var, blocks.col_var),
        v=_merge_state_param_tree(base.v, blocks.v))


def to_pipeline_opt_state(opt_state):
    """Inverse of ``from_pipeline_opt_state``: lift an unsharded-layout
    optimizer state into the {'base', 'blocks'} pipeline layout (resume
    a PP run from a single-device/DP checkpoint without losing
    MaxFactor statistics)."""
    if hasattr(opt_state, "inner_opt_state"):
        inner = to_pipeline_opt_state(opt_state.inner_opt_state)
        acc_b, acc_bl = _split_state_param_tree(opt_state.acc_grads)
        L = jax.tree.leaves(acc_bl)[0].shape[0]
        return {
            "base": opt_state._replace(
                inner_opt_state=inner["base"], acc_grads=acc_b),
            "blocks": opt_state._replace(
                mini_step=jnp.broadcast_to(opt_state.mini_step, (L,)),
                gradient_step=jnp.broadcast_to(opt_state.gradient_step,
                                               (L,)),
                inner_opt_state=inner["blocks"], acc_grads=acc_bl),
        }
    rv_b, rv_bl = _split_state_param_tree(opt_state.row_var)
    cv_b, cv_bl = _split_state_param_tree(opt_state.col_var)
    v_b, v_bl = _split_state_param_tree(opt_state.v)
    L = jax.tree.leaves(rv_bl)[0].shape[0]
    return {
        "base": opt_state._replace(row_var=rv_b, col_var=cv_b, v=v_b),
        "blocks": opt_state._replace(
            step=jnp.broadcast_to(opt_state.step, (L,)),
            row_var=rv_bl, col_var=cv_bl, v=v_bl),
    }


def make_pp_optimizer(cfg, pp_params):
    """MaxFactor over the PIPELINE param layout with EXACT per-block
    semantics (tested: test_pipeline.py optimizer-parity).

    Running the stock optimizer over stacked ``(L, ...)`` block leaves
    would be a different optimizer: MaxFactor's per-TENSOR statistics
    (full-tensor RMS clip, row-median trust ratio) would pool all L
    blocks, and its ``p.ndim < 3`` max-vs-norm gate (optim/
    maxfactor.py:186-192) would flip branch for every block matrix.
    Instead the stacked subtree is updated by a ``jax.vmap`` of the
    per-block transformation over the layer axis — bit-equal math to
    the unsharded per-block update, and the vmapped axis is the
    'pipe'-sharded one, so XLA partitions the optimizer over the
    pipeline stages for free.

    Returns (tx, sched) like train.loop.make_optimizer; ``tx`` is an
    optax GradientTransformation over the pipeline layout (state is
    {'base': ..., 'blocks': vmapped-stacked})."""
    import optax as _optax

    from asr_model_tpu.train.loop import make_optimizer

    base, blocks = _split_base_blocks(pp_params)
    block0 = jax.tree.map(lambda a: a[0], blocks)
    tx_base, sched = make_optimizer(cfg, base)
    tx_block, _ = make_optimizer(cfg, block0)

    def init(pp_p):
        b, bl = _split_base_blocks(pp_p)
        return {"base": tx_base.init(b),
                "blocks": jax.vmap(tx_block.init)(bl)}

    def update(grads, state, params=None):
        gb, gbl = _split_base_blocks(grads)
        pb, pbl = _split_base_blocks(params)
        ub, sb = tx_base.update(gb, state["base"], pb)
        ubl, sbl = jax.vmap(tx_block.update)(gbl, state["blocks"], pbl)
        return _merge_base_blocks(ub, ubl), {"base": sb, "blocks": sbl}

    return _optax.GradientTransformation(init, update), sched


def make_pp_train_step(model: Model, tx, mesh: Mesh, microbatches: int,
                       clip_grad_norm: float = 0.0,
                       remat: bool = False,
                       compute_dtype=None) -> Callable:
    """The jitted PP(+DP) train step — same 7-tuple contract as
    train.loop.make_train_step so the training loop drives either:
    (params, opt_state, batch_stats, rng, loss, gnorm, jstat).
    ``params`` here is the PIPELINE layout (to_pipeline_params), placed
    by ``shard_pipeline_params``; jstat is zeros (the sow channel is
    not threaded through the shard_map — Jumps/* logging is a
    single/DP-path feature).  ``remat=True`` checkpoints the MSheath
    scan bodies (sheath.scan_remat) — the same per-slot-residual HBM
    hog the plain train step sheds; GPipe keeps all M microbatches'
    activations live, so PP runs want this at long sequences.

    ``compute_dtype=jnp.bfloat16`` is the same mixed-precision recipe
    as the DP/TP/EP step (train/loop.py make_train_step): f32 master
    params + optimizer state, bf16 forward/backward (params, stats,
    and float inputs cast inside the loss), cross-entropy from
    f32-upcast logits, f32 grad-norm, mutated running stats recast to
    their master dtype (the step donates batch_stats)."""

    def step_fn(pp_params, opt_state, batch_stats, rng, batch):
        rng, gumbel, drop = jax.random.split(rng, 3)

        def loss_fn(p):
            if compute_dtype is not None:
                def cast(t):
                    return jax.tree.map(
                        lambda x: x.astype(compute_dtype)
                        if x.dtype == jnp.float32 else x, t)
                p_c, bs_c, b_c = cast(p), cast(batch_stats), cast(batch)
            else:
                p_c, bs_c, b_c = p, batch_stats, batch
            logits, new_bs = pipeline_forward(
                model, p_c, b_c, mesh, microbatches,
                batch_stats=bs_c, train=True,
                rngs={"gumbel": gumbel, "dropout": drop})
            loss = cross_entropy_ignore_pad(
                logits.astype(jnp.float32), batch["labels"])
            if compute_dtype is not None and new_bs is not None:
                new_bs = jax.tree.map(lambda x, ref: x.astype(ref.dtype),
                                      new_bs, batch_stats)
            return loss, new_bs

        import contextlib

        from asr_model_tpu.models.sheath import scan_remat
        ctx = scan_remat() if remat else contextlib.nullcontext()
        with ctx:
            (loss, new_bs), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(pp_params)
        gsq = sum(jnp.sum(g.astype(jnp.float32) ** 2)
                  for g in jax.tree.leaves(grads))
        gnorm = jnp.sqrt(gsq)
        if clip_grad_norm > 0:
            factor = jnp.minimum(1.0, clip_grad_norm / (gnorm + 1e-6))
            grads = jax.tree.map(lambda g: g * factor, grads)
        updates, new_opt = tx.update(grads, opt_state, params=pp_params)
        new_params = optax.apply_updates(pp_params, updates)
        return (new_params, new_opt, new_bs, rng, loss, gnorm,
                jnp.zeros(3, jnp.int32))

    return jax.jit(step_fn, donate_argnums=(0, 1, 2))
