"""Ablate the encode + cross-KV precompute wall time (docs/MFU.md
found it to be ~45% of decode wall at 6.6-9.2% MFU at both B=8 and
B=64).  Times each stage and sub-piece as its own jitted program on
the real chip, so the 537 ms (B=64) attributes to components.

Run: python tools/encode_ablate.py [--batch 64]
"""

import argparse
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def timeit(fn, args, n=10, fetch=None):
    import jax

    def sync(out):
        leaf = out if fetch is None else fetch(out)
        np.asarray(jax.tree.leaves(leaf)[0])

    sync(fn(*args))                      # compile + sync
    start = time.perf_counter()
    out = None
    for _ in range(n):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - start) / n


def main():
    import jax
    import jax.numpy as jnp

    from asr_model_tpu.config import Dimensions, ModelConfig
    from asr_model_tpu.models.model import Model, cast_variables, \
        modality_slots

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    args = ap.parse_args()
    B = args.batch
    T = 1001

    rng = np.random.RandomState(0)
    mel = jnp.asarray(rng.randn(B, 128, T), jnp.bfloat16)
    f0 = jnp.asarray(np.abs(rng.randn(B, 1, T)), jnp.bfloat16)
    wav = jnp.asarray(rng.randn(B, 1, T), jnp.bfloat16)

    dims = Dimensions()
    model = Model(param=dims, cfg=ModelConfig(dims=dims))
    variables = jax.jit(lambda r, m, p, w: model.init(
        {"params": r}, jnp.ones((B, 4), jnp.int32),
        spectrogram=m, pitch=p, waveform=w))(
            jax.random.key(0), mel, f0, wav)
    variables = cast_variables(variables)

    xa = modality_slots(pitch=f0, spectrogram=mel, waveform=wav)

    def report(name, sec):
        print(f"{name:44s} {sec * 1e3:9.2f} ms")

    # stage 1: AudioEncoder
    enc = jax.jit(lambda v, xa: model.apply(v, xa, method=Model.encode))
    t_enc = timeit(enc, (variables, xa),
                   fetch=lambda o: jax.tree.leaves(o)[0])
    report("AudioEncoder (3 slots)", t_enc)
    xa_enc = jax.tree.map(jnp.asarray, enc(variables, xa))

    # encoder sub-pieces: stems vs the deep stack
    def stems(mdl, xa):
        return [mdl.enc._stem(xa[k]) for k in ("a", "b", "c")]

    st = jax.jit(lambda v, xa: model.apply(v, xa, method=stems))
    report("  stems only", timeit(st, (variables, xa),
                                  fetch=lambda o: o[0]))

    def stack_only(mdl, s3):
        return mdl.enc._stack(s3)

    s3 = jnp.asarray(np.concatenate(
        [np.asarray(v) for v in st(variables, xa)], axis=0))
    sk = jax.jit(lambda v, s: model.apply(v, s, method=stack_only))
    report("  deep stack (3B rows, 4 layers)", timeit(sk, (variables, s3)))

    # per-layer stack cost: run k layers only
    def stack_k(mdl, s3, k):
        from asr_model_tpu.models.conv import get_activation
        x = s3
        act = get_activation(mdl.enc.act)
        for blk in mdl.enc.blocks[:k]:
            x = act(x)
            x = blk["wn"](x)
            x = blk["ln"](x)
            x = blk["convlite"](x)
            x = act(x)
            x = blk["dw"](x)
            x = act(x)
        return x

    for k in (1,):
        f = jax.jit(lambda v, s, k=k: model.apply(
            v, s, k, method=stack_k))
        report(f"  stack: {k} layer", timeit(f, (variables, s3)))

    # layer sub-pieces at (3B, T, D)
    def piece(mdl, s3, which):
        blk = mdl.enc.blocks[0]
        if which == "wn":
            return blk["wn"](s3)
        if which == "convlite":
            return blk["convlite"](s3)
        if which == "dw":
            return blk["dw"](s3)
        if which == "ln":
            return blk["ln"](s3)
        raise ValueError(which)

    for which in ("wn", "convlite", "dw", "ln"):
        f = jax.jit(lambda v, s, w=which: model.apply(
            v, s, w, method=piece))
        report(f"    {which} @ (3B,T,512)", timeit(f, (variables, s3)))

    # stage 2: block re-encode (_encode_xa)
    def re_enc(mdl, xa_enc):
        blk = mdl.processor.block[-1]
        return mdl.processor._encode_xa(blk, xa_enc)

    re = jax.jit(lambda v, x: model.apply(v, x, method=re_enc))
    t_re = timeit(re, (variables, xa_enc),
                  fetch=lambda o: jax.tree.leaves(o)[0])
    report("block re-encode (_encode_xa, 3 slots)", t_re)
    re_out = jax.tree.map(jnp.asarray, re(variables, xa_enc))

    # re-encode sub-pieces: one slot through the Residual self path
    def one_slot(mdl, t):
        blk = mdl.processor.block[-1]
        return blk(t)

    os_ = jax.jit(lambda v, t: model.apply(v, t, method=one_slot))
    report("  one slot (full Residual)", timeit(
        os_, (variables, xa_enc["a"])))

    def slot_piece(mdl, t, which):
        blk = mdl.processor.block[-1]
        if which == "jump":
            return blk.jump(blk.ln(t))[0]
        if which == "router":
            return blk.router(*[t] * 3)
        if which == "attn":
            return blk.attn(blk.ln(t), causal=False)
        if which == "mlp":
            return blk._mlp(t)
        if which == "ln":
            return blk.ln(t)
        raise ValueError(which)

    for which in ("jump", "router", "attn", "mlp", "ln"):
        f = jax.jit(lambda v, t, w=which: model.apply(
            v, t, w, method=slot_piece))
        report(f"    {which} @ (B,T,512)", timeit(
            f, (variables, xa_enc["a"])))

    # stage 3: cross-KV projection
    def pre_kv(mdl, re_out):
        blk = mdl.processor.block[-1]
        return mdl.processor._precompute_cross(blk, re_out)

    pk = jax.jit(lambda v, x: model.apply(v, x, method=pre_kv))
    report("cross-KV projection (_precompute_cross)", timeit(
        pk, (variables, re_out),
        fetch=lambda o: jax.tree.leaves(o)[0]))


if __name__ == "__main__":
    main()
