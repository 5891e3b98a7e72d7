"""Training / evaluation driver.

Parity target: train_and_evaluate essentials.py:708-996 — step-based
loop with gradient accumulation, a grad-norm feedback controller for
OneShot scales (essentials.py:794-809), TensorBoard logging (same
scalar names), periodic eval with teacher-forced argmax WER (default)
or free-running greedy WER (``generate=True``), periodic checkpointing.

TPU design: ONE jitted train step does forward + backward + MaxFactor
update + schedule — no host round-trips inside (the reference's
per-param ``.item()`` syncs become two device scalars fetched per
step: loss and global grad norm).  BatchNorm running stats live in the
``batch_stats`` collection and are threaded through the step.  The
grad-norm controller runs on host between steps; like the reference
(whose oneshot_modules scan finds nothing, §2.1 OneShot), the scale it
maintains is logged but feeds no live module — models that do mount a
OneShot bias take the scale as a device-scalar argument so updating it
never recompiles (SURVEY hard-part #7).
"""

from __future__ import annotations

import functools
import logging
import os
import time
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from asr_model_tpu.config import Config
from asr_model_tpu.models.generate import greedy_decode
from asr_model_tpu.models.model import Model
from asr_model_tpu.optim.maxfactor import bias_group_tree, maxfactor
from asr_model_tpu.optim.schedules import fam_scheduler2
from asr_model_tpu.train import checkpoint as ckpt
from asr_model_tpu.train.metrics import (compute_metrics, spectral_entropy,
                                         track_grad_norms)

logger = logging.getLogger(__name__)

FEATURE_KEYS = ("spectrogram", "waveform", "pitch", "pitch_tokens")


@dataclass
class TrainState:
    params: Any
    opt_state: Any
    batch_stats: Any
    step: int = 0
    rng: Any = None
    oneshot_scale: float = 0.3


def make_optimizer(cfg: Config, params):
    sched = fam_scheduler2(cfg.optim.lr, warmup_steps=cfg.optim.warmup_steps,
                           total_steps=cfg.optim.total_steps,
                           decay_start=cfg.optim.decay_start,
                           warmup_start=cfg.optim.warmup_start,
                           eta_min=cfg.optim.eta_min)
    bias_tree = bias_group_tree(params, main_bias=cfg.optim.bias,
                                jump_bias=cfg.optim.jump_bias)
    tx = maxfactor(lr=sched, b_decay=cfg.optim.b_decay, eps=cfg.optim.eps,
                   d=cfg.optim.d, decay=cfg.optim.decay,
                   gamma=cfg.optim.gamma, maximize=cfg.optim.maximize,
                   bias=bias_tree, min_lr=cfg.optim.min_lr,
                   clip=cfg.optim.clip, cap=cfg.optim.cap)
    if cfg.run.acc_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.run.acc_steps)
    return tx, sched


def make_train_step(model: Model, tx, clip_grad_norm: float = 0.0,
                    remat: bool = False, remat_policy: str = "dots",
                    compute_dtype=None):
    """Build the single jitted train step.

    Returns (params, opt_state, batch_stats, rng, loss, gnorm, jstat):
    jstat is the summed MSheath jump-action counter (3,) for the
    Jumps/* scalars — the reference intends this but its counter name
    mismatch means it never fires (SURVEY §5.5).

    ``remat=True`` wraps the loss in ``jax.checkpoint`` (save only
    matmul outputs, recompute the rest in the backward): measured on
    the v5e flagship at TF=1001, the un-remat'd step OOMs HBM at
    batch 16 (19.2 GB needed, 15.75 GB available), while remat trades
    a recomputed forward for fitting larger batches.

    ``compute_dtype=jnp.bfloat16`` is mixed-precision training: master
    params and optimizer state stay f32; the forward/backward run with
    params, batch-norm stats, and float inputs cast to bf16 (grads
    arrive f32 through the cast's transpose).  The cross-entropy is
    computed outside the model from f32-upcast logits — a 40k-way
    log-softmax in bf16 would lose the gradient signal of near-tied
    logits — and the grad-norm already accumulates in f32.  bf16 has
    f32's exponent range, so no loss scaling is needed (unlike fp16)."""

    def step_fn(params, opt_state, batch_stats, rng, batch):
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
            variables = {"params": p_c, "batch_stats": bs_c}
            out, mut = model.apply(
                variables,
                b_c["text_ids"],
                labels=None if compute_dtype is not None else b_c["labels"],
                spectrogram=b_c.get("spectrogram"),
                pitch=b_c.get("pitch"),
                waveform=b_c.get("waveform"),
                pitch_tokens=b_c.get("pitch_tokens"),
                train=True,
                rngs={"gumbel": gumbel, "dropout": drop},
                mutable=["batch_stats", "intermediates"])
            inter = mut.get("intermediates", {})
            jstats = [jnp.sum(jnp.stack(v), axis=0)
                      for v in _collect_sown(inter, "jstat")]
            jstat = (sum(jstats) if jstats
                     else jnp.zeros(3, jnp.int32))
            if compute_dtype is not None:
                from asr_model_tpu.models.model import \
                    cross_entropy_ignore_pad
                loss = cross_entropy_ignore_pad(
                    out["logits"].astype(jnp.float32), batch["labels"])
                # running stats must keep their master dtype: the step
                # donates batch_stats, so a bf16-mutated tree would
                # change the output aval (recompile + dtype drift)
                new_bs = jax.tree.map(
                    lambda x, ref: x.astype(ref.dtype),
                    mut["batch_stats"], batch_stats)
            else:
                loss = out["loss"]
                new_bs = mut["batch_stats"]
            # MoE load-balance aux (models/moe.py), one scalar per
            # routed layer, weighted into the training loss
            aux = _collect_sown(inter, "moe_aux")
            if aux:
                aux_w = getattr(model.cfg, "moe_aux_weight", 0.0)
                loss = loss + aux_w * sum(jnp.sum(a.astype(loss.dtype))
                                          for a in aux)
            return loss, (new_bs, jstat)

        grad_target = loss_fn
        if remat:
            # "dots": matmul outputs saved, elementwise recomputed;
            # "full": nothing saved — minimum memory, most recompute.
            if remat_policy == "full":
                grad_target = jax.checkpoint(loss_fn)
            else:
                grad_target = jax.checkpoint(
                    loss_fn,
                    policy=jax.checkpoint_policies
                    .dots_with_no_batch_dims_saveable)
        # the real HBM hog is per-slot residuals of the MSheath scans
        # at encoder length — wrapping the loss alone does NOT shed
        # them (the backward's recompute re-saves them); the scan BODY
        # must be checkpointed (models/sheath.py:scan_remat), trace-
        # time context active while value_and_grad traces
        import contextlib

        from asr_model_tpu.models.sheath import scan_remat
        ctx = scan_remat() if remat else contextlib.nullcontext()
        with ctx:
            (loss, (new_bs, jstat)), grads = jax.value_and_grad(
                grad_target, has_aux=True)(params)
        gsq = sum(jnp.sum(g.astype(jnp.float32) ** 2)
                  for g in jax.tree.leaves(grads))
        gnorm = jnp.sqrt(gsq)
        if clip_grad_norm > 0:
            factor = jnp.minimum(1.0, clip_grad_norm / (gnorm + 1e-6))
            grads = jax.tree.map(lambda g: g * factor, grads)
        updates, new_opt = tx.update(grads, opt_state, params=params)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_opt, new_bs, rng, loss, gnorm, jstat

    return jax.jit(step_fn, donate_argnums=(0, 1, 2))


def _collect_sown(tree, name):
    """All sown values called ``name`` anywhere in an intermediates
    tree."""
    found = []

    def walk(node):
        if isinstance(node, dict):
            for k, v in node.items():
                if k == name and isinstance(v, tuple):
                    found.append(jnp.stack(list(v)))
                else:
                    walk(v)

    walk(tree)
    return found


def make_grad_diagnostics(model: Model):
    """Separate (non-donating) grad computation for the per-parameter
    diagnostics the reference logs every step (essentials.py:780-782,
    848-853): per-param grad norms + spectral entropy.  Run at
    log intervals only — it recomputes fwd+bwd."""

    @jax.jit
    def grads_fn(params, batch_stats, rng, batch):
        def loss_fn(p):
            out = model.apply(
                {"params": p, "batch_stats": batch_stats},
                batch["text_ids"], labels=batch["labels"],
                spectrogram=batch.get("spectrogram"),
                pitch=batch.get("pitch"),
                waveform=batch.get("waveform"),
                train=False)
            return out["loss"]

        return jax.grad(loss_fn)(params)

    return grads_fn


def make_eval_step(model: Model):
    def eval_fn(params, batch_stats, batch):
        variables = {"params": params, "batch_stats": batch_stats}
        out = model.apply(
            variables, batch["text_ids"], labels=batch["labels"],
            spectrogram=batch.get("spectrogram"),
            pitch=batch.get("pitch"),
            waveform=batch.get("waveform"),
            pitch_tokens=batch.get("pitch_tokens"),
            train=False)
        preds = jnp.argmax(out["logits"], axis=-1)
        return out["loss"], preds

    return jax.jit(eval_fn)


def grad_norm_controller(grad_history, scales: Dict[str, float],
                         lo: float = 0.8, hi: float = 1.2,
                         shrink: float = 0.9, grow: float = 1.1,
                         clamp=(0.05, 2.0)) -> Dict[str, float]:
    """The OneShot grad-norm feedback controller
    (essentials.py:794-809): compare the 5-step average of the global
    grad norm to the previous 5; shrink/grow every scale, clamp."""
    if len(grad_history) > 10:
        recent = sum(grad_history[-5:]) / 5
        prev = sum(grad_history[-10:-5]) / 5
        for k in scales:
            if recent > prev * hi:
                scales[k] *= shrink
            elif recent < prev * lo:
                scales[k] *= grow
            scales[k] = float(max(clamp[0], min(clamp[1], scales[k])))
    return scales


def _device_batch(batch, mesh=None) -> Dict[str, jnp.ndarray]:
    arrs = {k: v for k, v in batch.items() if v is not None}
    if mesh is None:
        return {k: jnp.asarray(v) for k, v in arrs.items()}
    from asr_model_tpu.parallel.sharding import batch_shardings
    return jax.device_put(arrs, batch_shardings(arrs, mesh))


def train_compute_dtype(run):
    """Map RunConfig.train_dtype to the step's compute dtype (None =
    full f32, the parity default)."""
    name = getattr(run, "train_dtype", "float32")
    if name in ("bfloat16", "bf16"):
        return jnp.bfloat16
    if name in ("float32", "f32", None):
        return None
    raise ValueError(f"unsupported train_dtype {name!r} "
                     "(use 'float32' or 'bfloat16')")


def _maybe_mesh(run):
    """Build the device mesh from RunConfig.mesh_* (SURVEY §2.5 items
    1-3); None when all axes are 1 (single-device path)."""
    expert = getattr(run, "mesh_expert", 1)
    if run.mesh_data * run.mesh_model * run.mesh_seq * expert <= 1:
        return None
    from asr_model_tpu.parallel.mesh import make_mesh
    return make_mesh(data=run.mesh_data, model=run.mesh_model,
                     seq=run.mesh_seq, expert=expert)


def train_and_evaluate(
    model: Model,
    tokenizer,
    train_loader: Iterable,
    eval_loader: Iterable,
    cfg: Config,
    variables: Optional[Dict[str, Any]] = None,
    writer=None,
    metric_fn: Callable = compute_metrics,
    resume_from: Optional[str] = None,
    log_detail: bool = False,
    profile_dir: Optional[str] = None,
):
    """Returns the final variables dict {params, batch_stats}.

    ``train_loader``/``eval_loader`` yield collated numpy batches.
    """
    run = cfg.run
    os.makedirs(run.checkpoint_dir, exist_ok=True)
    # persist the full config next to the checkpoints so
    # Transcriber.from_checkpoint can rebuild the exact model
    # (streaming/chained/modality flags) without the caller re-stating it
    with open(os.path.join(run.checkpoint_dir, "config.json"), "w") as f:
        f.write(cfg.to_json())
    if writer is None:
        try:
            from tensorboardX import SummaryWriter
            writer = SummaryWriter(log_dir=run.log_dir)
        except ImportError:           # pragma: no cover
            writer = _NullWriter()

    rng = jax.random.key(run.seed)
    if variables is None:
        init_rng, rng = jax.random.split(rng)
        sample = _device_batch(next(iter(train_loader)))

        def init_fn(r, s):      # jitted: eager init dispatch is slow
            return model.init(
                {"params": r, "gumbel": r, "dropout": r},
                s["text_ids"], labels=s["labels"],
                spectrogram=s.get("spectrogram"),
                pitch=s.get("pitch"), waveform=s.get("waveform"),
                pitch_tokens=s.get("pitch_tokens"), train=False)

        variables = jax.jit(init_fn)(init_rng, sample)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    pipe = getattr(run, "mesh_pipe", 1)
    pp = None
    if pipe > 1:
        # PP(+DP): GPipe schedule over a ('data', 'pipe') mesh
        # (parallel/pipeline.py).  Params and optimizer state live in
        # the pipeline layout for the whole run; checkpoints saved by
        # this branch are in that layout too, so --resume requires the
        # same mesh_pipe (cross-topology moves: from_pipeline_params on
        # the saved params + a fresh optimizer).
        from asr_model_tpu.parallel import pipeline as pp
        if not model.cfg.chained_blocks:
            raise ValueError("mesh_pipe needs chained_blocks=True "
                             "(parity mode runs a single live block)")
        if getattr(model.cfg, "moe_experts", 0) > 0:
            raise ValueError("mesh_pipe does not compose with MoE yet "
                             "(the pipeline schedule's loss does not "
                             "collect the load-balance aux)")
        if run.mesh_model != 1 or run.mesh_seq != 1:
            raise ValueError("mesh_pipe composes with mesh_data only "
                             "(got mesh_model=%d mesh_seq=%d)"
                             % (run.mesh_model, run.mesh_seq))
        if run.batch_size % run.microbatches:
            raise ValueError(f"batch_size {run.batch_size} must divide "
                             f"into microbatches {run.microbatches}")
        if (run.batch_size // run.microbatches) % max(run.mesh_data, 1):
            raise ValueError(
                f"microbatch rows {run.batch_size // run.microbatches} "
                f"must divide mesh_data {run.mesh_data}")

    if pp:
        params = pp.to_pipeline_params(params)
        tx, sched = pp.make_pp_optimizer(cfg, params)
    else:
        tx, sched = make_optimizer(cfg, params)
    opt_state = tx.init(params)
    global_step = 0

    if resume_from:
        target = {"params": params, "opt_state": opt_state,
                  "batch_stats": batch_stats, "step": 0}
        restored = ckpt.restore_checkpoint(resume_from, target)
        params = restored["params"]
        opt_state = restored["opt_state"]
        batch_stats = restored["batch_stats"]
        global_step = int(restored["step"])
        logger.info("restored checkpoint at step %d from %s",
                    global_step, resume_from)

    if pp:
        mesh = pp.make_pipe_mesh(pipe=pipe, data=run.mesh_data)
        params = pp.shard_pipeline_params(params, mesh)
        opt_state = pp.shard_pp_opt_state(opt_state, mesh)
        from jax.sharding import NamedSharding, PartitionSpec
        batch_stats = jax.device_put(
            batch_stats, jax.tree.map(
                lambda _: NamedSharding(mesh, PartitionSpec()),
                batch_stats))
        rng = jax.device_put(rng, NamedSharding(mesh, PartitionSpec()))
        logger.info("pipeline training on mesh data:%d x pipe:%d, "
                    "%d microbatches", run.mesh_data, pipe,
                    run.microbatches)
    else:
        mesh = _maybe_mesh(run)
    if pp:
        pass
    elif mesh is not None:
        # DP(+TP) training: place params per the TP rules, replicate the
        # factored optimizer state and batch norm stats, and let the
        # SPMD partitioner distribute the (identical) step program.
        from asr_model_tpu.parallel.sharding import replicated, shard_params
        if run.batch_size % run.mesh_data != 0:
            raise ValueError(
                f"batch_size {run.batch_size} must divide mesh_data "
                f"{run.mesh_data}")
        params = shard_params(params, mesh)
        opt_state = jax.device_put(opt_state, replicated(opt_state, mesh))
        batch_stats = jax.device_put(batch_stats,
                                     replicated(batch_stats, mesh))
        from jax.sharding import NamedSharding, PartitionSpec
        rng = jax.device_put(rng, NamedSharding(mesh, PartitionSpec()))
        logger.info("training on mesh data:%d x model:%d x seq:%d",
                    run.mesh_data, run.mesh_model, run.mesh_seq)

    if pp:
        train_step = pp.make_pp_train_step(
            model, tx, mesh, run.microbatches, run.clip_grad_norm,
            remat=getattr(run, "remat", False),
            compute_dtype=train_compute_dtype(run))
        # eval/decode run on the unsharded layout: unstack on demand
        # (slices of the 'pipe'-sharded stack — XLA gathers per leaf)
        unstack = jax.jit(pp.from_pipeline_params)
    else:
        train_step = make_train_step(
            model, tx, run.clip_grad_norm,
            remat=getattr(run, "remat", False),
            remat_policy=getattr(run, "remat_policy", "dots"),
            compute_dtype=train_compute_dtype(run))
        unstack = None
    eval_step = make_eval_step(model)
    grad_diag = make_grad_diagnostics(model) if log_detail else None

    if profile_dir:
        # jax profiler trace around the first post-warmup steps
        # (SURVEY §5.1: torch has none; TPU build gets real traces)
        jax.profiler.start_trace(profile_dir)

    n_params_m = sum(x.size for x in jax.tree.leaves(params)) / 1e6
    grad_history: list = []
    oneshot_scales = {"oneshot": 0.3}    # latent in the reference (§2.1)
    total_loss = 0.0
    steps_this_run = 0            # Loss/train averages steps of THIS run
    samples_per_sec = 0.0
    _pp_skips = 0

    # host/device overlap: a worker thread keeps `prefetch_depth`
    # collated batches ahead (feature extraction overlaps the device
    # step), and the loop below additionally pulls batch N+1 between
    # dispatching step N (async) and fetching its loss (blocking) — so
    # host batch prep runs while the device computes.
    depth = getattr(run, "prefetch_depth", 0)
    if depth > 0:
        from asr_model_tpu.data.dataset import Prefetcher
        loader = Prefetcher(train_loader, depth=depth)
    else:
        loader = train_loader
    train_iter = iter(loader)

    def pull_batch():
        nonlocal train_iter, _pp_skips
        while True:
            try:
                batch = next(train_iter)
            except StopIteration:
                train_iter = iter(loader)
                batch = next(train_iter)
            if pp:
                # GPipe needs a fixed microbatch grid: rows must split
                # into `microbatches` equal groups, each divisible by
                # the data axis.  Ragged tail batches (dataset %
                # batch_size) are skipped — the DP path replicates them
                # instead, but a shard_map'd schedule has no ragged
                # story (and a one-off shape would recompile the whole
                # pipeline program anyway).
                rows = len(np.asarray(batch["text_ids"]))
                if (rows % run.microbatches
                        or (rows // run.microbatches)
                        % max(run.mesh_data, 1)):
                    _pp_skips += 1
                    if _pp_skips > 1000:
                        raise ValueError(
                            "every batch is ragged for the pipeline grid "
                            f"(microbatches={run.microbatches} x "
                            f"data={run.mesh_data}); fix batch_size")
                    logger.warning(
                        "skipping ragged batch of %d rows under pipeline "
                        "parallelism (need microbatches=%d x data=%d grid)",
                        rows, run.microbatches, run.mesh_data)
                    continue
                _pp_skips = 0
            return batch

    batch = pull_batch()
    while global_step < run.max_steps:
        start = time.time()
        rows = len(np.asarray(batch["text_ids"]))
        dbatch = _device_batch(batch, mesh)
        params, opt_state, batch_stats, rng, loss, gnorm, jstat = \
            train_step(params, opt_state, batch_stats, rng, dbatch)

        # the step is dispatched (async); prepare the NEXT host batch
        # while the device runs, then block on the loss scalar
        if global_step + 1 < run.max_steps:
            batch = pull_batch()
        loss_f = float(loss)
        gnorm_f = float(gnorm)
        total_loss += loss_f
        steps_this_run += 1
        grad_history.append(gnorm_f)
        oneshot_scales = grad_norm_controller(grad_history, oneshot_scales)
        if len(grad_history) > 100:
            grad_history = grad_history[-100:]
        samples_per_sec = rows / max(time.time() - start, 1e-9)

        if global_step % run.log_interval == 0:
            lr = float(sched(global_step))
            # running mean over steps of this run only — denominating by
            # global_step would corrupt the scalar after --resume, where
            # total_loss restarts at 0 but global_step doesn't
            writer.add_scalar("Loss/train", total_loss / steps_this_run,
                              global_step)
            writer.add_scalar("LearningRate", lr, global_step)
            writer.add_scalar("SamplesPerSec", samples_per_sec, global_step)
            writer.add_scalar("GradNorm", gnorm_f, global_step)
            writer.add_scalar("OneShot/scale", oneshot_scales["oneshot"],
                              global_step)
            # MSheath jump-action counters per interval (SURVEY §5.5,
            # fixing the reference's jstat/jump_statistics mismatch)
            js = np.asarray(jstat)
            writer.add_scalar("Jumps/Layer_Maintained_0", int(js[0]),
                              global_step)
            writer.add_scalar("Jumps/Skipped_1_Layer", int(js[1]),
                              global_step)
            writer.add_scalar("Jumps/Skipped_2_Layers", int(js[2]),
                              global_step)
            if log_detail:
                g = grad_diag(params, batch_stats, rng, dbatch)
                for name, norm in track_grad_norms(g).items():
                    writer.add_scalar(f"train/per_layer_norms_{name}",
                                      norm, global_step)
                for (path, leaf) in jax.tree_util.tree_flatten_with_path(
                        g)[0]:
                    if leaf.size > 1024:
                        nm = ".".join(str(getattr(kk, "key", kk))
                                      for kk in path)
                        writer.add_scalar(f"Entropy/{nm}",
                                          spectral_entropy(leaf),
                                          global_step)

        # ------------------------------------------------------------ eval
        do_eval = (run.eval_interval > 0
                   and global_step > run.warmup_interval
                   and global_step % run.eval_interval == 0) \
            or global_step == run.max_steps - 1
        if do_eval:
            eval_start = time.time()
            eval_loss, n_eval, batches = 0.0, 0, 0
            eparams = unstack(params) if pp else params
            all_p, all_l = [], []
            for ebatch in eval_loader:
                debatch = _device_batch(ebatch, mesh)
                l, preds = eval_step(eparams, batch_stats, debatch)
                eval_loss += float(l)
                batches += 1
                n_eval += len(np.asarray(ebatch["text_ids"]))
                if run.generate:
                    gen = greedy_decode(
                        model, {"params": eparams,
                                "batch_stats": batch_stats},
                        spectrogram=debatch.get("spectrogram"),
                        pitch=debatch.get("pitch"),
                        waveform=debatch.get("waveform"),
                        pitch_tokens=debatch.get("pitch_tokens"),
                        max_new_tokens=int(debatch["labels"].shape[1]))
                    all_p.extend(np.asarray(gen).tolist())
                else:
                    all_p.extend(np.asarray(preds).tolist())
                all_l.extend(np.asarray(ebatch["labels"]).tolist())
            loss_avg = eval_loss / max(batches, 1)
            metrics = metric_fn({"predictions": all_p, "label_ids": all_l},
                                tokenizer=tokenizer,
                                num_params_m=n_params_m)
            writer.add_scalar("Loss/eval", loss_avg, global_step)
            writer.add_scalar("WER", metrics["wer"], global_step)
            writer.add_scalar("EvalSamples", n_eval, global_step)
            writer.add_scalar("EvalTimeSeconds", time.time() - eval_start,
                              global_step)
            lr = float(sched(global_step))
            print(f"EVALUATION STEP:{global_step} • "
                  f"samp:{samples_per_sec:.1f} • "
                  f"WER:{metrics['wer']:.2f}% • Loss:{loss_avg:.4f} • "
                  f"LR:{lr:.8f}")

        # ------------------------------------------------------------ save
        if run.save_interval > 0 and global_step > 0 \
                and global_step % run.save_interval == 0:
            ckpt.save_model_checkpoint(
                run.checkpoint_dir, global_step,
                {"params": params, "opt_state": opt_state,
                 "batch_stats": batch_stats, "step": global_step})

        if profile_dir and global_step == min(run.max_steps - 1, 5):
            jax.profiler.stop_trace()
            profile_dir = None

        global_step += 1

    if profile_dir:
        jax.profiler.stop_trace()
    if pp:
        # canonical (unsharded) layout for the product surface: the
        # returned variables and final_model.msgpack feed Transcriber /
        # single-device resume, whose targets are the unsharded tree.
        # Mid-run checkpoint_step_* files stay in the pipeline layout
        # (same-topology resume keeps optimizer state); the final
        # file's optimizer state is TRANSFORMED to the unsharded layout
        # (pp.from_pipeline_opt_state), so resume-from-final preserves
        # MaxFactor's row/col/v/step statistics across the topology
        # move (tested: test_pipeline.py resume-after-PP).
        params = unstack(params)
        if run.save_interval > 0:
            opt_state = jax.jit(pp.from_pipeline_opt_state)(opt_state)
    if run.save_interval > 0:
        ckpt.save_checkpoint(
            os.path.join(run.checkpoint_dir, "final_model.msgpack"),
            {"params": params, "opt_state": opt_state,
             "batch_stats": batch_stats, "step": global_step})

    logger.info("Training completed after %d steps.", global_step)
    if hasattr(writer, "close"):
        writer.close()
    return {"params": params, "batch_stats": batch_stats}


def evaluate_model(model: Model, tokenizer, eval_loader, variables,
                   eval_steps: int = 0, max_new_tokens: int = 150,
                   suppress_eos: bool = True,
                   metric_fn: Callable = compute_metrics) -> Dict[str, Any]:
    """Standalone free-running evaluation (parity:
    essentials.py:1058-1116, whose encoder/decoder API is stale against
    the reference's own Model — implemented working here): greedy
    decode with EOS suppressed until the budget (generate_predictions
    semantics), returns loss/WER/transcripts/timing."""
    from asr_model_tpu.models.generate import greedy_decode

    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    eval_step = make_eval_step(model)

    start = time.time()
    eval_loss, batches = 0.0, 0
    all_p, all_l = [], []
    for i, batch in enumerate(eval_loader):
        if eval_steps and i >= eval_steps:
            break
        dbatch = _device_batch(batch)
        loss, _ = eval_step(params, batch_stats, dbatch)
        eval_loss += float(loss)
        batches += 1
        if model.cfg.streaming and not model.cfg.chained_blocks \
                and dbatch.get("pitch_tokens") is None:
            # streaming models: O(1)-per-token incremental decode
            # (token-exact vs the buffer path, test_stream_decode.py)
            from asr_model_tpu.models.generate import greedy_decode_stream
            gen = greedy_decode_stream(
                model, {"params": params, "batch_stats": batch_stats},
                spectrogram=dbatch.get("spectrogram"),
                pitch=dbatch.get("pitch"),
                waveform=dbatch.get("waveform"),
                max_new_tokens=max_new_tokens,
                suppress_eos=suppress_eos)
        else:
            gen = greedy_decode(
                model, {"params": params, "batch_stats": batch_stats},
                spectrogram=dbatch.get("spectrogram"),
                pitch=dbatch.get("pitch"),
                waveform=dbatch.get("waveform"),
                pitch_tokens=dbatch.get("pitch_tokens"),
                max_new_tokens=max_new_tokens, suppress_eos=suppress_eos)
        all_p.extend(np.asarray(gen).tolist())
        all_l.extend(np.asarray(batch["labels"]).tolist())

    metrics = metric_fn({"predictions": all_p, "label_ids": all_l},
                        tokenizer=tokenizer)
    preds_text = tokenizer.batch_decode(all_p)
    labels_text = tokenizer.batch_decode(all_l)
    return {
        "loss": eval_loss / max(batches, 1),
        "wer": metrics["wer"],
        "preds": preds_text,
        "labels": labels_text,
        "eval_time": time.time() - start,
    }


class _NullWriter:
    def add_scalar(self, *a, **k):
        pass

    def close(self):
        pass
