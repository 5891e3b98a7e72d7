"""MFU / FLOPs accounting for the three hot programs (VERDICT r4 #5).

Every performance number so far is RTFx against a 1-core-CPU reference
— an honest but nearly content-free denominator.  This tool puts a
hardware ceiling under each hot program:

* 3-modality frontend (log-mel + YIN + waveform downsample)
* encode + cross-KV precompute (the once-per-utterance work)
* ONE decode step at each prefix-bucket width (the serial hot loop)
* full greedy decode (the composition the headline times)
* the training step (``--train``), flagship TF length

FLOPs and HBM bytes come from XLA's own cost model on the COMPILED
executable (``compiled.cost_analysis()`` — the flops the program
actually contains after fusion, not a hand model).  MFU = measured
FLOP/s divided by peak; the roofline side reports achieved HBM GB/s so
a low MFU can be attributed (bandwidth-bound vs dispatch/serial-bound).

Peak numbers (TPU v5e, per chip): 197 TFLOP/s bf16, 819 GB/s HBM.

Timing through the axon tunnel: programs are enqueued back-to-back and
only the final result is fetched (block_until_ready does not
synchronize through the tunnel; a host fetch costs ~28 ms and is
amortized over the chain).  Per-step programs are chained through
their own outputs so the device executes them strictly serially.

Run:  python tools/mfu.py [--batch 8] [--train] [--write-doc]
Writes docs/MFU.json (+ updates the docs/MFU.md table with
--write-doc).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PEAK_FLOPS = {"bf16": 197e12, "f32": 49e12}   # TPU v5e per chip
PEAK_HBM = 819e9                              # bytes/s


def _cost(compiled):
    """(flops, bytes) from XLA's cost analysis of a compiled exe."""
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, list):          # per-device list on some paths
            ca = ca[0]
        return float(ca.get("flops", 0.0)), \
            float(ca.get("bytes accessed", 0.0))
    except Exception:
        return 0.0, 0.0


def _time_chain(fn, args, n_iter, fetch=np.asarray):
    """Enqueue n_iter calls (args fixed), fetch only the last output."""
    out = fn(*args)
    fetch(out if not isinstance(out, tuple) else out[0])  # warm+sync
    start = time.perf_counter()
    for _ in range(n_iter):
        out = fn(*args)
    o = out if not isinstance(out, tuple) else out[0]
    fetch(o)
    return (time.perf_counter() - start) / n_iter


def main():
    import jax
    import jax.numpy as jnp

    from asr_model_tpu.config import Dimensions, ModelConfig
    from asr_model_tpu.models import generate as G
    from asr_model_tpu.models.model import Model, cast_variables
    from asr_model_tpu.ops.audio import frame_rate_waveform
    from asr_model_tpu.ops.mel import log_mel_spectrogram
    from asr_model_tpu.ops.pitch import yin_f0

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--max-new-tokens", type=int, default=64)
    ap.add_argument("--train", action="store_true",
                    help="also measure the flagship train step "
                         "(B x TF=1001, bf16 compute)")
    ap.add_argument("--train-batch", type=int, default=8)
    ap.add_argument("--train-only", action="store_true",
                    help="measure ONLY the train step (one compile, "
                         "~5 min on the tunnel vs ~15 for the full "
                         "serving sweep) and MERGE it into the "
                         "existing docs/MFU.json serving record")
    ap.add_argument("--write-doc", action="store_true")
    args = ap.parse_args()
    if args.train_only:
        args.train = True

    sr, hop = 16000, 160
    utt_sec = 10.0
    batch = args.batch
    T = args.max_new_tokens + 1

    rng = np.random.RandomState(0)
    t = np.arange(int(sr * utt_sec)) / sr
    audio = jnp.asarray(np.stack([
        (np.sin(2 * np.pi * (150 + 30 * i) * t)
         + 0.3 * np.sin(2 * np.pi * 2 * (150 + 30 * i) * t)
         + 0.01 * rng.randn(len(t))).astype(np.float32)
        for i in range(batch)]))

    dims = Dimensions()
    model = Model(param=dims, cfg=ModelConfig(dims=dims))
    frame_period = hop / sr * 1000.0
    results = {"batch": batch, "max_new_tokens": args.max_new_tokens,
               "peak_flops_bf16": PEAK_FLOPS["bf16"],
               "peak_hbm_bytes_per_s": PEAK_HBM, "programs": {}}

    def report(name, sec, flops, bytes_, extra=""):
        mfu = flops / sec / PEAK_FLOPS["bf16"] if sec else 0.0
        bw = bytes_ / sec / PEAK_HBM if sec else 0.0
        results["programs"][name] = {
            "wall_s": sec, "flops": flops, "hbm_bytes": bytes_,
            "mfu": mfu, "hbm_frac": bw,
            "tflops_per_s": flops / sec / 1e12 if sec else 0.0}
        print(f"{name:34s} {sec * 1e3:9.2f} ms  "
              f"{flops / 1e9:9.2f} GF  MFU {mfu * 100:6.2f}%  "
              f"HBM {bw * 100:6.1f}%  {extra}")

    if not args.train_only:
        # ---------------- frontend
        def frontend(audio):
            mel = jax.vmap(lambda a: log_mel_spectrogram(a, sr, 1024, hop,
                                                         dims.mels))(audio)
            Tm = mel.shape[-1]
            f0, _ = jax.vmap(lambda a: yin_f0(a, fs=sr,
                                              frame_period=frame_period))(audio)
            f0 = f0[:, None, :]
            pad = max(Tm - f0.shape[-1], 0)
            f0 = jnp.pad(f0, ((0, 0), (0, 0), (0, pad)))[..., :Tm]
            wav = jax.vmap(lambda a: frame_rate_waveform(a, sr, hop))(audio)
            return (mel.astype(jnp.bfloat16), f0.astype(jnp.bfloat16),
                    wav.astype(jnp.bfloat16))

        def chk(tree):
            return sum(jnp.sum(x.astype(jnp.float32))
                       for x in jax.tree.leaves(tree))

        fe = jax.jit(frontend)
        fe_c = fe.lower(audio).compile()
        fe_flops, fe_bytes = _cost(fe_c)
        mel, f0, wav = jax.tree.map(jnp.asarray, fe(audio))
        # timing fetches a scalar checksum — fetching real outputs through
        # the axon tunnel would dominate (verify-skill rule)
        fe_s = _time_chain(jax.jit(lambda a: chk(frontend(a))),
                           (audio,), 20)
        report("frontend (mel+yin+wave)", fe_s, fe_flops, fe_bytes)

        variables = model.init({"params": jax.random.key(0)},
                               jnp.ones((batch, 4), jnp.int32),
                               spectrogram=mel, pitch=f0, waveform=wav)
        variables = cast_variables(variables)

        # ---------------- encode + cross-KV precompute
        def enc_pre(variables, mel, f0, wav):
            from asr_model_tpu.models.model import modality_slots
            xa = modality_slots(pitch=f0, spectrogram=mel, waveform=wav)
            xa_enc = model.apply(variables, xa, method=Model.encode)

            def _pre(mdl, xa_enc):
                blk = mdl.processor.block[-1]
                re_enc = mdl.processor._encode_xa(blk, xa_enc)
                return mdl.processor._precompute_cross(blk, re_enc)

            return model.apply(variables, xa_enc, method=_pre)

        ep = jax.jit(enc_pre)
        ep_c = ep.lower(variables, mel, f0, wav).compile()
        ep_flops, ep_bytes = _cost(ep_c)
        xa_kv = ep(variables, mel, f0, wav)
        ep_s = _time_chain(
            jax.jit(lambda *a: chk(enc_pre(*a))),
            (variables, mel, f0, wav), 10)
        report("encode + cross-KV precompute", ep_s, ep_flops, ep_bytes)

        # ---------------- one decode step per bucket width
        stages = G._bucket_sizes(T, G._decode_stages())
        from asr_model_tpu.config import BOS_ID, PAD_ID
        step_rows = []
        for s in stages:
            def step(ids, length, done, xa_kv, variables, s=s):
                window = jax.lax.slice_in_dim(ids, 0, s, axis=1)
                valid = jnp.broadcast_to(jnp.arange(s)[None, :] < length,
                                         (batch, s))
                idx = jnp.clip(length - 1, 0, s - 1)
                logits = model.apply(variables, window, xa_kv,
                                     method=G._decode_step,
                                     text_valid=valid, logits_position=idx)
                nxt = jnp.argmax(logits[:, 0], axis=-1).astype(jnp.int32)
                col = jnp.arange(ids.shape[1]) == length
                ids = jnp.where(col[None, :], nxt[:, None], ids)
                return ids, length + 1, done | (nxt == 2)

            fn = jax.jit(step)
            ids0 = jnp.full((batch, T), PAD_ID, jnp.int32).at[:, 0].set(BOS_ID)
            ln0 = jnp.asarray(1, jnp.int32)
            dn0 = jnp.zeros(batch, bool)
            c = fn.lower(ids0, ln0, dn0, xa_kv, variables).compile()
            st_flops, st_bytes = _cost(c)
            # chain through own outputs: strictly serial on device
            ids, ln, dn = fn(ids0, ln0, dn0, xa_kv, variables)
            np.asarray(ids)
            n = 50
            start = time.perf_counter()
            ids, ln, dn = ids0, ln0, dn0
            for _ in range(n):
                ids, ln, dn = fn(ids, ln, dn, xa_kv, variables)
            np.asarray(ids)
            st_s = (time.perf_counter() - start) / n
            report(f"decode step (bucket width {s})", st_s, st_flops,
                   st_bytes)
            step_rows.append((s, st_s, st_flops, st_bytes))

        # serial-floor attribution: per-step wall vs bucket width is
        # ~affine; the intercept is the fixed serial cost per step
        if len(step_rows) >= 2:
            ws = np.asarray([r[0] for r in step_rows], np.float64)
            ts = np.asarray([r[1] for r in step_rows], np.float64)
            A = np.vstack([ws, np.ones_like(ws)]).T
            slope, intercept = np.linalg.lstsq(A, ts, rcond=None)[0]
            results["decode_step_fit"] = {
                "slope_s_per_width": float(slope),
                "intercept_s": float(intercept),
                "serial_floor_frac_at_mean_width": float(
                    intercept / ts.mean())}
            print(f"decode-step affine fit: {intercept * 1e3:.3f} ms fixed "
                  f"+ {slope * 1e6:.2f} us/width  (serial floor "
                  f"{intercept / ts.mean() * 100:.0f}% at mean width)")

        # ---------------- full decode (the headline composition)
        dec = G._build_decode_fn(model, args.max_new_tokens, True, None,
                                 G._decode_stages())
        from asr_model_tpu.models.model import modality_slots
        xa = modality_slots(pitch=f0, spectrogram=mel, waveform=wav)
        d_c = dec.lower(variables, xa).compile()
        d_flops, d_bytes = _cost(d_c)
        np.asarray(dec(variables, xa))
        d_s = _time_chain(lambda v, x: dec(v, x), (variables, xa), 10)
        report("full greedy decode", d_s, d_flops, d_bytes)
        rtfx = batch * utt_sec / (fe_s + d_s)
        results["rtfx_frontend_plus_decode"] = rtfx
        print(f"frontend+decode RTFx: {rtfx:.1f}x")

    # ---------------- train step
    if args.train:
        from asr_model_tpu.config import Config, OptimConfig, RunConfig
        from asr_model_tpu.train.loop import make_optimizer, \
            make_train_step
        Bt = args.train_batch
        TF = 1001
        cfg = Config(optim=OptimConfig(total_steps=1000),
                     run=RunConfig(batch_size=Bt, remat=True,
                                   train_dtype="bfloat16"))
        tb = {
            "text_ids": jnp.asarray(
                rng.randint(3, dims.tokens, (Bt, 48)), jnp.int32),
            "labels": jnp.asarray(
                rng.randint(3, dims.tokens, (Bt, 48)), jnp.int32),
            "spectrogram": jnp.asarray(
                rng.randn(Bt, dims.mels, TF), jnp.float32),
            "pitch": jnp.asarray(np.abs(rng.randn(Bt, 1, TF)),
                                 jnp.float32),
            "waveform": jnp.asarray(rng.randn(Bt, 1, TF), jnp.float32),
        }
        tvars = model.init({"params": jax.random.key(0), "gumbel":
                            jax.random.key(1)}, tb["text_ids"],
                           labels=tb["labels"],
                           spectrogram=tb["spectrogram"],
                           pitch=tb["pitch"], waveform=tb["waveform"])
        tparams = tvars["params"]
        tbs = tvars.get("batch_stats", {})
        tx, _ = make_optimizer(cfg, tparams)
        opt_state = tx.init(tparams)
        tstep = make_train_step(model, tx, remat=True,
                                compute_dtype=jnp.bfloat16)
        rkey = jax.random.key(2)
        t_c = tstep.lower(tparams, opt_state, tbs, rkey, tb).compile()
        t_flops, t_bytes = _cost(t_c)
        out = tstep(tparams, opt_state, tbs, rkey, tb)
        tparams, opt_state, tbs, rkey = out[0], out[1], out[2], out[3]
        float(out[4])
        n = 10
        start = time.perf_counter()
        for _ in range(n):
            out = tstep(tparams, opt_state, tbs, rkey, tb)
            tparams, opt_state, tbs, rkey = out[0], out[1], out[2], out[3]
        float(out[4])
        t_s = (time.perf_counter() - start) / n
        report(f"train step (B={Bt}, TF={TF}, bf16+remat)", t_s,
               t_flops, t_bytes,
               extra=f"{Bt / t_s:.1f} samples/s")

    out_path = os.path.join(REPO, "docs", "MFU.json")
    if args.train_only and os.path.exists(out_path):
        # keep the serving record; graft the train program(s) onto it
        with open(out_path) as f:
            merged = json.load(f)
        merged["programs"].update(results["programs"])
        results = merged
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
