"""CLI entry point.

Parity target: main() model.py:721-824 — tokenizer -> dataset -> 80/20
split -> Model -> MaxFactor(bias groups) + FAMScheduler2 ->
train_and_evaluate(max_steps=100, batch_size=1, eval every 10).

Improvements over the reference's hardcoded main: argparse config,
``--synthetic`` mode (no dataset required), checkpoint resume, mesh
axes for DP/TP.
"""

from __future__ import annotations

import argparse
import logging
import os
from datetime import datetime


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("asr_model_tpu")
    p.add_argument("--metadata", type=str, default=None,
                   help="metadata.csv with columns audio,sentence")
    p.add_argument("--data-dir", type=str, default=None)
    p.add_argument("--synthetic", type=int, default=0,
                   help="train on N synthetic utterances instead of files")
    p.add_argument("--tokenizer", type=str, default=None)
    p.add_argument("--max-steps", type=int, default=100)
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--lr", type=float, default=2.5e-3)
    p.add_argument("--warmup-steps", type=int, default=10)
    p.add_argument("--eval-interval", type=int, default=10)
    p.add_argument("--save-interval", type=int, default=0)
    p.add_argument("--log-dir", type=str, default=None)
    p.add_argument("--checkpoint-dir", type=str, default=None)
    p.add_argument("--resume", type=str, default=None)
    p.add_argument("--import-reference", type=str, default=None,
                   metavar="STATE_DICT_PT",
                   help="initialize from a reference (PyTorch) "
                        "Model.state_dict() .pt file via the "
                        "layout-converting importer (asr_model_tpu."
                        "compat) — migrate a reference checkpoint "
                        "into this framework and keep training")
    p.add_argument("--generate", action="store_true",
                   help="free-running greedy eval WER instead of "
                        "teacher-forced")
    p.add_argument("--dims", type=int, default=512)
    p.add_argument("--head", type=int, default=4)
    p.add_argument("--layer", type=int, default=4)
    p.add_argument("--tokens", type=int, default=40000)
    p.add_argument("--mels", type=int, default=128)
    p.add_argument("--act", type=str, default="gelu")
    p.add_argument("--n-type", type=str, default="AbbyNormal")
    p.add_argument("--chained-blocks", action="store_true")
    p.add_argument("--streaming", action="store_true",
                   help="streaming-causal decoder variant: every "
                        "text-side path is prefix-causal, so "
                        "teacher-forced training matches free-running "
                        "decode (the route to real WER; config.py:67)")
    p.add_argument("--causal-all", action="store_true",
                   help="causal mask on every decoder self-attention "
                        "(implied by --streaming)")
    p.add_argument("--moe-experts", type=int, default=0,
                   help="replace each residual block's dense MLP with "
                        "N routed experts of the same shape "
                        "(models/moe.py); 0 = dense parity MLP")
    p.add_argument("--moe-top-k", type=int, default=2,
                   help="experts per token under --moe-experts")
    p.add_argument("--pitch-tokens", action="store_true")
    p.add_argument("--pitch-estimator", type=str, default="dio",
                   choices=["dio", "yin"],
                   help="F0 algorithm for the pitch modality, used by "
                        "BOTH training features and serving frontends")
    p.add_argument("--no-pitch", action="store_true")
    p.add_argument("--no-waveform", action="store_true")
    p.add_argument("--pad-multiple", type=int, default=128,
                   help="length-bucket padding so jit sees few static "
                        "shapes (0 = exact reference padding, recompiles "
                        "per length)")
    p.add_argument("--mesh-data", type=int, default=1,
                   help="data-parallel mesh axis size (batch sharding)")
    p.add_argument("--mesh-model", type=int, default=1,
                   help="tensor-parallel mesh axis size (heads/MLP/vocab "
                        "sharding)")
    p.add_argument("--mesh-seq", type=int, default=1,
                   help="sequence-parallel mesh axis size")
    p.add_argument("--mesh-expert", type=int, default=1,
                   help="expert-parallel mesh axis size (shards "
                        "--moe-experts weights; dispatch rides an "
                        "all-to-all)")
    p.add_argument("--mesh-pipe", type=int, default=1,
                   help="pipeline-parallel stages over the chained "
                        "block stack (needs --chained-blocks and "
                        "layer %% stages == 0); composes with "
                        "--mesh-data")
    p.add_argument("--microbatches", type=int, default=1,
                   help="GPipe microbatches per step under --mesh-pipe "
                        "(bubble fraction (P-1)/(M+P-1))")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize the forward in the backward "
                        "(jax.checkpoint) — fits larger batches in HBM")
    p.add_argument("--remat-policy", type=str, default="dots",
                   choices=["dots", "full"],
                   help="remat save policy: matmul outputs (dots) or "
                        "nothing (full)")
    p.add_argument("--train-dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"],
                   help="mixed-precision training: bfloat16 runs the "
                        "forward/backward at the MXU's native bf16 rate "
                        "with f32 master weights, optimizer state, and "
                        "loss (train/loop.py)")
    p.add_argument("--prefetch", type=int, default=2,
                   help="host input-pipeline overlap: batches prepared "
                        "ahead on a worker thread while the device runs "
                        "the train step (0 = synchronous, the "
                        "reference's num_workers=0 semantics)")
    return p


def default_tokenizer_path() -> str:
    return os.path.join(os.path.dirname(__file__), "assets",
                        "tokenizer.json")


def main(argv=None):
    from asr_model_tpu.config import (Config, DataConfig, Dimensions,
                                      ModelConfig, OptimConfig, RunConfig)
    from asr_model_tpu.data.dataset import (PreparedDataset, Repeated,
                                            SyntheticDataset, random_split)
    from asr_model_tpu.data.tokenizer import setup_tokenizer
    from asr_model_tpu.models.model import Model
    from asr_model_tpu.train.loop import train_and_evaluate

    args = build_argparser().parse_args(argv)
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s - %(levelname)s - %(message)s")

    log_dir = args.log_dir or os.path.join(
        "./logs", datetime.now().strftime("%m-%d_%H_%M_%S"))
    os.makedirs(log_dir, exist_ok=True)

    tokenizer = setup_tokenizer(args.tokenizer or default_tokenizer_path())
    if args.tokens < tokenizer.get_vocab_size():
        raise SystemExit(
            f"--tokens {args.tokens} is smaller than the tokenizer vocab "
            f"({tokenizer.get_vocab_size()}): label ids would index out of "
            "bounds (NaN loss). Use --tokens >= vocab size.")

    extract_args = {
        "spectrogram": True,
        "pitch": not args.no_pitch,
        "waveform": not args.no_waveform,
        "pitch_tokens": args.pitch_tokens,
        "pitch_estimator": args.pitch_estimator,
        "harmonics": False,
        "aperiodics": False,
        "hop_length": 160,
        "sample_rate": 16000,
        "mels": args.mels,
    }

    dims = Dimensions(tokens=args.tokens, mels=args.mels, dims=args.dims,
                      head=args.head, layer=args.layer, act=args.act,
                      n_type=args.n_type)
    cfg = Config(
        model=ModelConfig(dims=dims, chained_blocks=args.chained_blocks,
                          streaming=args.streaming,
                          causal_all=args.causal_all,
                          moe_experts=args.moe_experts,
                          moe_top_k=args.moe_top_k),
        data=DataConfig(**{k: v for k, v in extract_args.items()
                           if k in DataConfig.__dataclass_fields__}),
        optim=OptimConfig(lr=args.lr, warmup_steps=args.warmup_steps,
                          total_steps=args.max_steps),
        run=RunConfig(max_steps=args.max_steps,
                      batch_size=args.batch_size,
                      eval_interval=args.eval_interval,
                      save_interval=args.save_interval,
                      checkpoint_dir=args.checkpoint_dir or log_dir,
                      log_dir=log_dir, generate=args.generate,
                      mesh_data=args.mesh_data, mesh_model=args.mesh_model,
                      mesh_seq=args.mesh_seq, mesh_expert=args.mesh_expert,
                      mesh_pipe=args.mesh_pipe,
                      microbatches=args.microbatches, remat=args.remat,
                      remat_policy=args.remat_policy,
                      train_dtype=args.train_dtype,
                      prefetch_depth=args.prefetch))

    n_mesh = (args.mesh_data * args.mesh_model * args.mesh_seq
              * args.mesh_expert * args.mesh_pipe)
    if n_mesh > 1:
        import jax
        if len(jax.devices()) < n_mesh:
            raise SystemExit(
                f"mesh {args.mesh_data}x{args.mesh_model}x{args.mesh_seq}"
                f"x{args.mesh_expert}x{args.mesh_pipe} needs {n_mesh} "
                f"devices, have {len(jax.devices())}")
        if args.batch_size % args.mesh_data != 0:
            raise SystemExit(
                f"--batch-size {args.batch_size} must be a multiple of "
                f"--mesh-data {args.mesh_data}")
    if args.mesh_expert > 1:
        if args.moe_experts <= 0:
            raise SystemExit("--mesh-expert needs --moe-experts > 0")
        if args.moe_experts % args.mesh_expert:
            raise SystemExit(
                f"--moe-experts {args.moe_experts} must be a multiple "
                f"of --mesh-expert {args.mesh_expert}")
    if args.mesh_pipe > 1:
        if not args.chained_blocks:
            raise SystemExit("--mesh-pipe needs --chained-blocks")
        if args.layer % args.mesh_pipe:
            raise SystemExit(
                f"--layer {args.layer} not divisible by --mesh-pipe "
                f"{args.mesh_pipe}")
        if args.batch_size % args.microbatches:
            raise SystemExit(
                f"--batch-size {args.batch_size} must be a multiple of "
                f"--microbatches {args.microbatches}")

    if args.synthetic:
        dataset = SyntheticDataset(n=args.synthetic, tokenizer=tokenizer,
                                   extract_args=extract_args)
    else:
        if not args.metadata or not args.data_dir:
            raise SystemExit("need --metadata/--data-dir or --synthetic N")
        dataset = PreparedDataset(args.metadata, args.data_dir, tokenizer,
                                  extract_args=extract_args, cache=True)

    train_ds, eval_ds = random_split(dataset, 0.8, seed=cfg.run.seed)
    pad_mult = args.pad_multiple or None
    text_mult = 16 if pad_mult else None
    train_loader = Repeated(train_ds, batch_size=cfg.run.batch_size,
                            pad_to_multiple=pad_mult,
                            text_pad_to_multiple=text_mult)
    eval_loader = Repeated(eval_ds, batch_size=cfg.run.batch_size,
                           pad_to_multiple=pad_mult,
                           text_pad_to_multiple=text_mult)

    model = Model(param=dims, cfg=cfg.model)
    init_variables = None
    if args.import_reference:
        import jax.numpy as jnp
        from asr_model_tpu.compat import import_reference_checkpoint
        mono = jnp.zeros((1, 1, 16), jnp.float32)
        init_kw = {"spectrogram": jnp.zeros((1, args.mels, 16),
                                            jnp.float32)}
        if cfg.data.pitch:
            init_kw["pitch"] = mono
        if cfg.data.waveform:
            init_kw["waveform"] = mono
        if cfg.data.pitch_tokens:
            init_kw["pitch_tokens"] = jnp.zeros((1, 3), jnp.float32)
        init_variables = import_reference_checkpoint(
            args.import_reference, model, init_kw)
        print(f"imported reference state_dict {args.import_reference}")
    variables = train_and_evaluate(model, tokenizer, train_loader,
                                   eval_loader, cfg,
                                   variables=init_variables,
                                   resume_from=args.resume)

    import jax
    n_params = sum(x.size for x in jax.tree.leaves(variables["params"]))
    print(f"Train dataset size: {len(train_ds)}")
    print(f"Test dataset size: {len(eval_ds)}")
    print(f"Trainable parameters: {n_params:,}")
    return variables


if __name__ == "__main__":
    main()
