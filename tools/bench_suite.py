"""Measure the BASELINE.md driver configs #1-#4 on the available
accelerator and record them to docs/BENCH_SUITE_r2.json.

Configs (BASELINE.md "Baselines to establish"):
  #1 single-utterance greedy transcription  -> p50/p95 wall latency
  #2 batched mel-extraction + encoder-only  -> frames/sec, RTFx
  #3 full train step (fwd+bwd+MaxFactor)    -> samples/sec, step ms
  #4 long-form chunked inference (60 s)     -> RTFx

All on the flagship config (tokens=40000, mels=128, dims=512, head=4,
layer=4 — model.py:746), bf16 inference / f32 training, with the live
3-modality frontend (spectrogram + YIN pitch + frame-rate waveform)
except #3 which uses the single-modality spectrogram shape measured in
round 1 (docs/BENCH_NOTES.md) for comparability.

Timing notes (axon tunnel): block_until_ready does not synchronize —
throughput loops enqueue N dispatches and fetch once (amortized);
latency (#1) fetches EVERY call, so p50 includes the ~28 ms host
round-trip (recorded in the JSON).

Run: python tools/bench_suite.py [--iters 10]
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--train-scaling", type=str, default="",
                    help="comma-separated batch sizes; measures ONLY "
                         "the train step at each (BASELINE config #5 "
                         "single-chip scaling curve)")
    ap.add_argument("--remat", action="store_true",
                    help="rematerialized train step (jax.checkpoint) "
                         "for the scaling curve")
    ap.add_argument("--remat-policy", type=str, default="dots",
                    choices=["dots", "full"])
    ap.add_argument("--train-dtype", type=str, default="float32",
                    choices=["float32", "bfloat16"],
                    help="mixed-precision train step for the scaling "
                         "curve (f32 master weights, bf16 compute)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import sys
    sys.path.insert(0, REPO)
    from asr_model_tpu.config import Dimensions, ModelConfig
    from asr_model_tpu.models.generate import greedy_decode
    from asr_model_tpu.models.longform import transcribe_long
    from asr_model_tpu.models.model import (Model, cast_variables,
                                            modality_slots)
    from asr_model_tpu.ops.audio import frame_rate_waveform
    from asr_model_tpu.ops.mel import log_mel_spectrogram
    from asr_model_tpu.ops.pitch import yin_f0

    sr, hop = 16000, 160
    dims = Dimensions()
    model = Model(param=dims, cfg=ModelConfig(dims=dims))
    frame_period = hop / sr * 1000.0
    results = {"hardware": str(jax.devices()[0]),
               "note": "latency numbers include the ~28 ms axon tunnel "
                       "host round-trip per fetch"}

    def make_audio(batch, sec, seed=0):
        rng = np.random.RandomState(seed)
        t = np.arange(int(sr * sec)) / sr
        return np.stack([
            (np.sin(2 * np.pi * (150 + 30 * i) * t)
             + 0.3 * np.sin(2 * np.pi * 2 * (150 + 30 * i) * t)
             + 0.01 * rng.randn(len(t))).astype(np.float32)
            for i in range(batch)])

    @jax.jit
    def frontend(audio):
        mel = jax.vmap(lambda a: log_mel_spectrogram(a, sr, 1024, hop,
                                                     dims.mels))(audio)
        T = mel.shape[-1]
        f0, _ = jax.vmap(lambda a: yin_f0(a, fs=sr,
                                          frame_period=frame_period))(audio)
        f0 = f0[:, None, :]
        f0 = jnp.pad(f0, ((0, 0), (0, 0),
                          (0, max(T - f0.shape[-1], 0))))[..., :T]
        wav = jax.vmap(lambda a: frame_rate_waveform(a, sr, hop))(audio)
        return (mel.astype(jnp.bfloat16), f0.astype(jnp.bfloat16),
                wav.astype(jnp.bfloat16))

    # shared init (B=1 shapes suffice; params are shape-independent)
    a1 = jnp.asarray(make_audio(1, 10.0))
    mel1, f01, wav1 = frontend(a1)
    variables = model.init({"params": jax.random.key(0)},
                           jnp.ones((1, 4), jnp.int32),
                           spectrogram=mel1, pitch=f01, waveform=wav1)
    bf16_vars = cast_variables(variables)

    if args.train_scaling:
        from asr_model_tpu.config import Config
        from asr_model_tpu.train.loop import (make_optimizer,
                                              make_train_step)

        cfg = Config(model=ModelConfig(dims=dims))
        tx, _ = make_optimizer(cfg, variables["params"])
        cdtype = (jnp.bfloat16 if args.train_dtype == "bfloat16"
                  else None)
        step_fn = make_train_step(model, tx, remat=args.remat,
                                  remat_policy=args.remat_policy,
                                  compute_dtype=cdtype)
        scaling = {}
        for b in [int(s) for s in args.train_scaling.split(",")]:
            ab = jnp.asarray(make_audio(b, 10.0))
            melb = jnp.asarray(np.asarray(frontend(ab)[0], np.float32))
            text = jnp.asarray(np.random.RandomState(1).randint(
                3, dims.tokens, (b, 48)), jnp.int32)
            batch_d = {"text_ids": text, "labels": text,
                       "spectrogram": melb}
            # fresh buffers per batch size: the jitted step DONATES
            # params/batch_stats, so reusing variables[...] across
            # sizes references deleted arrays
            params = jax.tree.map(jnp.copy, variables["params"])
            bs = jax.tree.map(jnp.copy, variables.get("batch_stats", {}))
            opt_state = tx.init(params)
            rng = jax.random.key(0)
            params, opt_state, bs, rng, loss, gn, _ = step_fn(
                params, opt_state, bs, rng, batch_d)
            float(loss)                         # compile + sync
            t0 = time.perf_counter()
            for _ in range(args.iters):
                params, opt_state, bs, rng, loss, gn, _ = step_fn(
                    params, opt_state, bs, rng, batch_d)
            float(loss)
            dt = (time.perf_counter() - t0) / args.iters
            scaling[f"B={b}"] = {
                "ms_per_step": round(dt * 1e3, 1),
                "samples_per_sec": round(b / dt, 1),
                "audio_sec_per_sec": round(b * 10.0 / dt, 1),
            }
            print(f"train B={b}", scaling[f"B={b}"], flush=True)
        suffix = "_BF16" if cdtype is not None else ""
        out = os.path.join(REPO, "docs",
                           f"BENCH_TRAIN_SCALING{suffix}.json")
        with open(out, "w") as f:
            json.dump({"hardware": results["hardware"],
                       "workload": "TF=1001 spectrogram, T=48 text, "
                                   "fwd+bwd+MaxFactor, "
                                   + ("bf16 compute / f32 master"
                                      if cdtype is not None else "f32"),
                       "remat": bool(args.remat),
                       "remat_policy": args.remat_policy,
                       "train_dtype": args.train_dtype,
                       "scaling": scaling}, f, indent=2)
        print("wrote", out)
        return

    # ------------------------------------------------ #1 single-utt p50
    def transcribe1(audio):
        mel, f0, wav = frontend(audio)
        return greedy_decode(model, bf16_vars, spectrogram=mel,
                             pitch=f0, waveform=wav, max_new_tokens=64,
                             suppress_eos=True)

    np.asarray(transcribe1(a1))            # compile + sync
    lat = []
    for _ in range(20):
        t0 = time.perf_counter()
        np.asarray(transcribe1(a1))        # fetch => real latency
        lat.append(time.perf_counter() - t0)
    lat_ms = np.sort(np.asarray(lat)) * 1e3
    results["c1_single_utt"] = {
        "workload": "B=1, 10 s utt, 3 modalities, 64-token greedy, bf16",
        "p50_ms": round(float(np.percentile(lat_ms, 50)), 1),
        "p95_ms": round(float(np.percentile(lat_ms, 95)), 1),
        "rtfx_at_b1": round(10.0 / (np.percentile(lat_ms, 50) / 1e3), 1),
    }
    print("c1", results["c1_single_utt"], flush=True)

    # ------------------------------------------- #2 encoder-only batched
    batch = 8
    a8 = jnp.asarray(make_audio(batch, 10.0))
    def _enc(a):
        mel, f0, wav = frontend(a)
        slots = modality_slots(pitch=f0, spectrogram=mel, waveform=wav)
        return model.apply(bf16_vars, slots, method=Model.encode)

    enc_fn = jax.jit(_enc)
    # fetch only a scalar checksum: pulling the full (3, 8, 1001, 512)
    # encoding through the tunnel (~24 MB) would dominate the timing
    sum_fn = jax.jit(lambda e: sum(jnp.sum(v.astype(jnp.float32))
                                   for v in e.values()))

    enc = enc_fn(a8)
    float(sum_fn(enc))                     # compile + sync
    t0 = time.perf_counter()
    for _ in range(args.iters):
        enc = enc_fn(a8)
    float(sum_fn(enc))
    dt = (time.perf_counter() - t0) / args.iters
    frames = batch * int(mel1.shape[-1])
    results["c2_encoder_only"] = {
        "workload": "B=8, 10 s utts, frontend + 3-modality encode, bf16",
        "frames_per_sec": round(frames / dt, 0),
        "rtfx": round(batch * 10.0 / dt, 1),
        "ms_per_batch": round(dt * 1e3, 2),
    }
    print("c2", results["c2_encoder_only"], flush=True)

    # ------------------------------------------------- #3 train step
    from asr_model_tpu.config import Config
    from asr_model_tpu.train.loop import make_optimizer, make_train_step

    mel8 = jnp.asarray(np.asarray(frontend(a8)[0], np.float32))
    text = jnp.asarray(
        np.random.RandomState(1).randint(3, dims.tokens, (batch, 48)),
        jnp.int32)
    cfg = Config(model=ModelConfig(dims=dims))
    tx, _ = make_optimizer(cfg, variables["params"])
    params = variables["params"]
    bs = variables.get("batch_stats", {})
    opt_state = tx.init(params)
    step_fn = make_train_step(model, tx)
    batch_d = {"text_ids": text, "labels": text, "spectrogram": mel8}
    rng = jax.random.key(0)
    params, opt_state, bs, rng, loss, gnorm, _ = step_fn(
        params, opt_state, bs, rng, batch_d)
    float(loss)                            # compile + sync
    t0 = time.perf_counter()
    for _ in range(args.iters):
        params, opt_state, bs, rng, loss, gnorm, _ = step_fn(
            params, opt_state, bs, rng, batch_d)
    float(loss)
    dt = (time.perf_counter() - t0) / args.iters
    results["c3_train_step"] = {
        "workload": "B=8, TF=1001 spectrogram, T=48 text, fwd+bwd+"
                    "MaxFactor, f32",
        "ms_per_step": round(dt * 1e3, 1),
        "samples_per_sec": round(batch / dt, 1),
        "audio_sec_per_sec": round(batch * 10.0 / dt, 1),
    }
    print("c3", results["c3_train_step"], flush=True)

    # ---------------------------------------------- #4 long-form 60 s
    long_audio = make_audio(1, 60.0, seed=2)[0]
    t0 = time.perf_counter()
    ids, _ = transcribe_long(model, bf16_vars, long_audio,
                             max_new_tokens_per_chunk=64)
    compile_plus_run = time.perf_counter() - t0
    t0 = time.perf_counter()
    ids, _ = transcribe_long(model, bf16_vars, long_audio,
                             max_new_tokens_per_chunk=64)
    dt = time.perf_counter() - t0
    results["c4_longform"] = {
        "workload": "60 s audio, 30 s chunks / 2 s overlap, 3 "
                    "modalities, 64-token budget per chunk, bf16",
        "seconds": round(dt, 2),
        "rtfx": round(60.0 / dt, 1),
        "first_call_with_compiles_s": round(compile_plus_run, 1),
        "n_tokens": len(ids),
    }
    print("c4", results["c4_longform"], flush=True)

    def de_np(o):
        if isinstance(o, dict):
            return {k: de_np(v) for k, v in o.items()}
        return float(o) if hasattr(o, "item") else o

    out = os.path.join(REPO, "docs", "BENCH_SUITE_r2.json")
    with open(out, "w") as f:
        json.dump(de_np(results), f, indent=2)
    print("wrote", out)


if __name__ == "__main__":
    main()
