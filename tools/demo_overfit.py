"""End-to-end learning demonstration: train on a handful of synthetic
utterances until the model overfits, then free-running greedy decode
must reproduce the training transcripts (WER -> low).

Run: python tools/demo_overfit.py [--steps 600]
Writes a summary to stdout; used as evidence that the full
train->decode loop learns (BASELINE configs #1+#3 semantics without a
real corpus — no datasets ship in this image).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--dims", type=int, default=64)
    ap.add_argument("--n-utts", type=int, default=4)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--causal-all", action="store_true",
                    help="decode-consistent variant: every decoder "
                         "self-attention causal (non-parity)")
    ap.add_argument("--streaming", action="store_true",
                    help="fully prefix-causal variant (implies causal "
                         "self-attention, causal MSheath pooling, causal "
                         "d||e cross): teacher-forced training matches "
                         "free-running decode (non-parity)")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))
    import jax.numpy as jnp
    import optax

    from asr_model_tpu.config import Config, Dimensions, ModelConfig, OptimConfig
    from asr_model_tpu.data.dataset import SyntheticDataset, data_loader
    from asr_model_tpu.data.tokenizer import setup_tokenizer
    from asr_model_tpu.models.generate import greedy_decode
    from asr_model_tpu.models.model import Model
    from asr_model_tpu.train.loop import make_optimizer, make_train_step
    from asr_model_tpu.train.metrics import wer_batch

    tok = setup_tokenizer(os.path.join(os.path.dirname(__file__), "..",
                                       "asr_model_tpu", "assets",
                                       "tokenizer.json"))
    sentences = ["HELLO WORLD", "THE QUICK BROWN FOX",
                 "SPEECH RECOGNITION WORKS", "JUMPS OVER THE LAZY DOG"]
    ds = SyntheticDataset(
        n=args.n_utts, tokenizer=tok, dur_range=(0.5, 0.5),
        sentences=sentences[:args.n_utts],
        extract_args=dict(spectrogram=True, mels=32))
    batch = next(data_loader(ds, batch_size=args.n_utts,
                             pad_to_multiple=64, text_pad_to_multiple=16))
    dbatch = {k: jnp.asarray(v) for k, v in batch.items()}

    dims = Dimensions(tokens=40000, mels=32, dims=args.dims, head=4,
                      layer=2)
    cfg = Config(model=ModelConfig(dims=dims,
                                   causal_all=args.causal_all,
                                   streaming=args.streaming),
                 optim=OptimConfig(lr=2.5e-3, warmup_steps=20,
                                   total_steps=args.steps * 10))
    model = Model(param=dims, cfg=cfg.model)

    variables = jax.jit(lambda r, b: model.init(
        {"params": r, "gumbel": r, "dropout": r}, b["text_ids"],
        labels=b["labels"], spectrogram=b["spectrogram"]))(
            jax.random.key(0), dbatch)
    params = variables["params"]
    bs = variables.get("batch_stats", {})
    tx, _ = make_optimizer(cfg, params)
    opt_state = tx.init(params)
    step = make_train_step(model, tx)
    rng = jax.random.key(1)

    t0 = time.time()
    losses = []
    for i in range(args.steps):
        params, opt_state, bs, rng, loss, gnorm, _ = step(
            params, opt_state, bs, rng, dbatch)
        if i % 200 == 0 or i == args.steps - 1:
            l = float(loss)
            losses.append(l)
            print(f"step {i:5d}  loss {l:8.4f}  gnorm {float(gnorm):9.2f}"
                  f"  ({time.time()-t0:.0f}s)", flush=True)
            if l < 0.05:
                # early stop at convergence: past this point the
                # decoupled weight decay erodes the saturated fit
                # (grads are ~0 at prob 1.0 but decay keeps shrinking)
                print(f"early stop at step {i} (loss {l:.4f})", flush=True)
                break

    # teacher-forced WER: trim predictions at each label's true length
    # (argmax at PAD positions is arbitrary — the reference never
    # learns them since CE ignores pads; its default B=1 has no pads)
    out = model.apply({"params": params, "batch_stats": bs},
                      dbatch["text_ids"], labels=dbatch["labels"],
                      spectrogram=dbatch["spectrogram"])
    tf_preds = np.asarray(jnp.argmax(out["logits"], -1))
    labels_np = np.asarray(dbatch["labels"])
    lengths = (labels_np != 0).sum(-1)
    refs = tok.batch_decode(labels_np.tolist())
    tf_hyps = tok.batch_decode(
        [list(p[:n]) for p, n in zip(tf_preds, lengths)])
    tf_wer = wer_batch(refs, tf_hyps)

    # free-running greedy WER (stops at EOS)
    ids = greedy_decode(model, {"params": params, "batch_stats": bs},
                        spectrogram=dbatch["spectrogram"],
                        max_new_tokens=int(dbatch["labels"].shape[1]))
    fr_hyps = tok.batch_decode(np.asarray(ids).tolist())
    fr_wer = wer_batch(refs, fr_hyps)

    print("\n== RESULTS ==")
    print(f"loss: {losses[0]:.3f} -> {losses[-1]:.3f}")
    print(f"teacher-forced WER: {tf_wer:.1f}%")
    print(f"free-running  WER: {fr_wer:.1f}%")
    for r, h in zip(refs, fr_hyps):
        print(f"  ref: {r!r}\n  hyp: {h!r}")
    ok = losses[-1] < losses[0] * 0.2 and tf_wer < 50.0
    print("OVERFIT DEMO:", "PASS" if ok else "WEAK")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
