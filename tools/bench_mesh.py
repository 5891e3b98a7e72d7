"""Multi-chip readiness benchmark (VERDICT r2 next-round #8).

Measures, with the same JSON schema as tools/bench_suite.py:

* **DP train scaling** — the flagship train step (fwd+bwd+MaxFactor,
  TF=1001 spectrogram) at a fixed per-chip batch over growing ``data``
  meshes, reporting ms/step, samples/sec and scaling efficiency vs the
  1-chip point (BASELINE config #5);
* **SP long-form RTFx** — single-pass sequence-parallel transcription
  of a 60 s utterance over the ``seq`` axis (transcribe_long_sp).

On real multi-chip hardware the numbers are performance; on this image
(one tunneled v5e chip) the script self-provisions an 8-device virtual
CPU mesh and degrades to a CORRECTNESS pass — same code path, same
schema, ``"correctness_only": true`` — so the day hardware exists the
numbers are one command away:

    python tools/bench_mesh.py [--dp-sizes 1,2,4,8] [--sp 8]
                               [--per-chip-batch 8] [--iters 10]

Writes docs/BENCH_MESH.json.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dp-sizes", type=str, default="1,2,4,8")
    ap.add_argument("--sp", type=int, default=8)
    ap.add_argument("--per-chip-batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--dims", type=int, default=None,
                    help="model width (default: flagship 512 on real "
                         "multi-chip, 64 on the virtual-mesh "
                         "correctness pass)")
    ap.add_argument("--utt-sec", type=float, default=10.0)
    ap.add_argument("--long-sec", type=float, default=60.0)
    args = ap.parse_args()

    dp_sizes = [int(s) for s in args.dp_sizes.split(",")]
    want = max(max(dp_sizes), args.sp)

    # probe the real device count in a SUBPROCESS: the virtual-mesh
    # fallback needs XLA_FLAGS set before this process touches jax
    import subprocess
    try:
        n_real = int(subprocess.check_output(
            [sys.executable, "-c",
             "import jax; print(len(jax.devices()))"],
            stderr=subprocess.DEVNULL, timeout=180).split()[-1])
    except Exception:
        n_real = 1

    correctness_only = n_real < want
    if correctness_only:
        # degrade to the virtual CPU mesh: same code path, no perf claim
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={want}").strip()

    import jax

    if correctness_only:
        # this image presets jax_platforms='axon,cpu' (overrides the
        # env var) — update the config after import, before first use
        jax.config.update("jax_platforms", "cpu")
        assert len(jax.devices()) >= want

    import jax.numpy as jnp

    from asr_model_tpu.config import Config, Dimensions, ModelConfig
    from asr_model_tpu.models.generate import greedy_decode
    from asr_model_tpu.models.longform import transcribe_long_sp
    from asr_model_tpu.models.model import Model
    from asr_model_tpu.ops.mel import log_mel_spectrogram
    from asr_model_tpu.parallel.mesh import make_mesh
    from asr_model_tpu.parallel.sharding import (batch_shardings,
                                                 replicated, shard_params)
    from asr_model_tpu.train.loop import make_optimizer, make_train_step

    sr, hop = 16000, 160
    width = args.dims or (64 if correctness_only else 512)
    mels = 32 if correctness_only else 128
    dims = Dimensions(tokens=40000, mels=mels, dims=width,
                      head=4, layer=2 if correctness_only else 4)
    model = Model(param=dims, cfg=ModelConfig(dims=dims))
    cfg = Config(model=ModelConfig(dims=dims))

    results = {
        "hardware": f"{len(jax.devices())}x {jax.devices()[0]}",
        "correctness_only": correctness_only,
        "model": {"dims": dims.dims, "layer": dims.layer,
                  "mels": dims.mels},
        "workload": f"TF={1 + int(args.utt_sec * sr) // hop} "
                    f"spectrogram, T=48 text, fwd+bwd+MaxFactor, f32; "
                    f"SP long-form {args.long_sec:.0f}s",
    }

    def make_mel(batch, sec, seed=0):
        rng = np.random.RandomState(seed)
        t = np.arange(int(sr * sec)) / sr
        audio = np.stack([
            (np.sin(2 * np.pi * (150 + 30 * i) * t)
             + 0.01 * rng.randn(len(t))).astype(np.float32)
            for i in range(batch)])
        return np.asarray(jax.jit(jax.vmap(
            lambda a: log_mel_spectrogram(a, sr, 1024, hop, mels)))(
                jnp.asarray(audio))), audio

    mel1, _ = make_mel(1, args.utt_sec)
    variables = jax.jit(lambda r: model.init(
        {"params": r}, jnp.ones((1, 4), jnp.int32),
        spectrogram=jnp.asarray(mel1)))(jax.random.key(0))
    # host-side master copy: the train step donates its params/opt
    # buffers, so each mesh size restarts from fresh device arrays
    master = jax.device_get(variables)
    tx, _sched = make_optimizer(cfg, variables["params"])
    step_fn = make_train_step(model, tx)

    # ------------------------------------------------ DP train scaling
    scaling = {}
    base_sps = None
    for d in dp_sizes:
        if len(jax.devices()) < d:
            continue
        B = args.per_chip_batch * d
        mesh = make_mesh(data=d) if d > 1 else None
        melB, _ = make_mel(B, args.utt_sec)
        text = np.random.RandomState(1).randint(3, dims.tokens, (B, 48))
        batch_np = {"text_ids": text.astype(np.int64),
                    "labels": text.astype(np.int64),
                    "spectrogram": melB}
        params = jax.tree.map(jnp.asarray, master["params"])
        bs = jax.tree.map(jnp.asarray, master.get("batch_stats", {}))
        opt_state = tx.init(params)
        rng = jax.random.key(0)
        if mesh is not None:
            params = shard_params(params, mesh)
            opt_state = jax.device_put(opt_state,
                                       replicated(opt_state, mesh))
            bs = jax.device_put(bs, replicated(bs, mesh))
            from jax.sharding import NamedSharding, PartitionSpec
            rng = jax.device_put(rng, NamedSharding(mesh,
                                                    PartitionSpec()))
            dbatch = jax.device_put(batch_np,
                                    batch_shardings(batch_np, mesh))
        else:
            dbatch = {k: jnp.asarray(v) for k, v in batch_np.items()}
        params, opt_state, bs, rng, loss, gn, _ = step_fn(
            params, opt_state, bs, rng, dbatch)
        l0 = float(loss)                          # compile + sync
        assert np.isfinite(l0)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            params, opt_state, bs, rng, loss, gn, _ = step_fn(
                params, opt_state, bs, rng, dbatch)
        float(loss)
        dt = (time.perf_counter() - t0) / args.iters
        sps = B / dt
        if d == dp_sizes[0]:
            base_sps = sps / d
        scaling[f"data={d}"] = {
            "global_batch": B,
            "ms_per_step": round(dt * 1e3, 1),
            "samples_per_sec": round(sps, 1),
            "audio_sec_per_sec": round(B * args.utt_sec / dt, 1),
            "scaling_efficiency": round(sps / (base_sps * d), 3)
            if base_sps else None,
        }
        print(f"DP data={d}", scaling[f"data={d}"], flush=True)
    results["dp_train_scaling"] = scaling

    # ------------------------------------------------ SP long-form
    if args.sp > 1 and len(jax.devices()) >= args.sp:
        from asr_model_tpu.data.tokenizer import setup_tokenizer
        tok = setup_tokenizer(os.path.join(
            REPO, "asr_model_tpu", "assets", "tokenizer.json"))
        mesh = make_mesh(seq=args.sp)
        long_sec = 12.0 if correctness_only else args.long_sec
        t = np.arange(int(sr * long_sec)) / sr
        audio = (np.sin(2 * np.pi * 180 * t)
                 + 0.01 * np.random.RandomState(2).randn(len(t))
                 ).astype(np.float32)
        kw = dict(tokenizer=tok, sample_rate=sr,
                  max_new_tokens=16 if correctness_only else 600,
                  use_pitch=False, use_waveform=False)
        ids, _text = transcribe_long_sp(model, variables, audio, mesh,
                                        **kw)   # compile
        t0 = time.perf_counter()
        ids, _text = transcribe_long_sp(model, variables, audio, mesh,
                                        **kw)
        dt = time.perf_counter() - t0
        results["sp_longform"] = {
            "seq_axis": args.sp,
            "audio_sec": long_sec,
            "wall_sec": round(dt, 2),
            "rtfx": round(long_sec / dt, 1),
        }
        print("SP long-form", results["sp_longform"], flush=True)
        if correctness_only:
            # the SP decode must equal the plain (unsharded) decode on
            # the SAME zero-padded frame count (transcribe_long_sp pads
            # T up to a multiple of the axis size)
            mel = jax.jit(lambda a: log_mel_spectrogram(
                a, sr, 1024, hop, mels))(jnp.asarray(audio))[None]
            T = mel.shape[-1]
            t_local = (T + args.sp - 1) // args.sp
            mel = jnp.pad(mel, ((0, 0), (0, 0),
                                (0, t_local * args.sp - T)))
            plain = greedy_decode(model, variables, spectrogram=mel,
                                  max_new_tokens=16)
            want = [int(x) for x in np.asarray(plain)[0][1:]
                    if x not in (0, 2)]
            results["sp_longform"]["matches_unsharded"] = \
                list(ids) == want
            print("SP tokens match unsharded:", list(ids) == want,
                  flush=True)

    out = os.path.join(REPO, "docs", "BENCH_MESH.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print("wrote", out)


if __name__ == "__main__":
    main()
