"""Ablate the encode + cross-KV precompute wall time (docs/MFU.md
found it to be ~45% of decode wall at 6.6-9.2% MFU at both B=8 and
B=64).  Times each stage and sub-piece as its own jitted program on
the real chip, so the 537 ms (B=64) attributes to components.  Every
timed program returns a scalar checksum (fetching real outputs
through the ~3 MB/s axon tunnel would dominate the timing).

Run: python tools/encode_ablate.py [--batch 64]
"""

import argparse
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def timeit(fn, args, n=10):
    """``fn`` must be a jitted program returning a SCALAR checksum."""
    np.asarray(fn(*args))                # compile + sync
    start = time.perf_counter()
    out = None
    for _ in range(n):
        out = fn(*args)
    np.asarray(out)
    return (time.perf_counter() - start) / n


def main():
    import jax
    import jax.numpy as jnp

    from asr_model_tpu.config import Dimensions, ModelConfig
    from asr_model_tpu.models.model import Model, cast_variables, \
        modality_slots

    def chk(tree):
        return sum(jnp.sum(x.astype(jnp.float32))
                   for x in jax.tree.leaves(tree))

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
        print(f"{name:44s} {sec * 1e3:9.2f} ms", flush=True)

    # stage 1: AudioEncoder
    enc_f = jax.jit(lambda v, xa: model.apply(v, xa, method=Model.encode))
    report("AudioEncoder (3 slots)", timeit(
        jax.jit(lambda v, xa: chk(model.apply(
            v, xa, method=Model.encode))), (variables, xa)))
    xa_enc = jax.tree.map(jnp.asarray, enc_f(variables, xa))

    def stems(mdl, xa):
        return [mdl.enc._stem(xa[k]) for k in ("a", "b", "c")]

    report("  stems only", timeit(
        jax.jit(lambda v, xa: chk(model.apply(v, xa, method=stems))),
        (variables, xa)))

    st_f = jax.jit(lambda v, xa: model.apply(v, xa, method=stems))
    s3 = jnp.concatenate(list(st_f(variables, xa)), axis=0)

    report("  deep stack (3B rows, 4 layers)", timeit(
        jax.jit(lambda v, s: chk(model.apply(
            v, s, method=lambda m, t: m.enc._stack(t)))),
        (variables, s3)))

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

    report("  stack: 1 layer", timeit(
        jax.jit(lambda v, s: chk(model.apply(
            v, s, 1, method=stack_k))), (variables, s3)))

    def piece(mdl, s3, which):
        blk = mdl.enc.blocks[0]
        return blk[which](s3)

    for which in ("wn", "convlite", "dw", "ln"):
        report(f"    {which} @ (3B,T,512)", timeit(
            jax.jit(lambda v, s, w=which: chk(model.apply(
                v, s, w, method=piece))), (variables, s3)))

    # stage 2: block re-encode (_encode_xa)
    def re_enc(mdl, xa_enc):
        blk = mdl.processor.block[-1]
        return mdl.processor._encode_xa(blk, xa_enc)

    re_f = jax.jit(lambda v, x: model.apply(v, x, method=re_enc))
    report("block re-encode (_encode_xa, 3 slots)", timeit(
        jax.jit(lambda v, x: chk(model.apply(v, x, method=re_enc))),
        (variables, xa_enc)))
    re_out = jax.tree.map(jnp.asarray, re_f(variables, xa_enc))

    def one_slot(mdl, t):
        return mdl.processor.block[-1](t)

    report("  one slot (full Residual)", timeit(
        jax.jit(lambda v, t: chk(model.apply(v, t, method=one_slot))),
        (variables, xa_enc["a"])))

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
        report(f"    {which} @ (B,T,512)", timeit(
            jax.jit(lambda v, t, w=which: chk(model.apply(
                v, t, w, method=slot_piece))), (variables, xa_enc["a"])))

    # stage 3: cross-KV projection
    def pre_kv(mdl, re_out):
        blk = mdl.processor.block[-1]
        return mdl.processor._precompute_cross(blk, re_out)

    report("cross-KV projection (_precompute_cross)", timeit(
        jax.jit(lambda v, x: chk(model.apply(v, x, method=pre_kv))),
        (variables, re_out)))


if __name__ == "__main__":
    main()
