"""Model-level tests: shapes, causality, determinism, decode, and a
tiny overfit run (SURVEY §4 integration strategy)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from asr_model_tpu.config import Dimensions, ModelConfig
from asr_model_tpu.models.generate import greedy_decode
from asr_model_tpu.models.model import (Model, cross_entropy_ignore_pad,
                                        modality_slots)

DIMS = Dimensions(tokens=50, mels=8, dims=16, head=2, layer=2)


@pytest.fixture(scope="module")
def setup():
    model = Model(param=DIMS, cfg=ModelConfig(dims=DIMS))
    B, T, TF = 2, 6, 12
    rng = np.random.RandomState(0)
    batch = {
        "text_ids": jnp.asarray(rng.randint(3, 50, (B, T))),
        "labels": jnp.asarray(rng.randint(3, 50, (B, T))),
        "spectrogram": jnp.asarray(rng.randn(B, 8, TF), jnp.float32),
        "pitch": jnp.asarray(rng.rand(B, 1, TF), jnp.float32),
        "waveform": jnp.asarray(rng.randn(B, 1, TF), jnp.float32),
    }
    variables = jax.jit(lambda r, b: model.init(
        {"params": r, "gumbel": r}, b["text_ids"], labels=b["labels"],
        spectrogram=b["spectrogram"], pitch=b["pitch"],
        waveform=b["waveform"]))(jax.random.key(0), batch)
    # one jitted apply shared by the tests below: eager apply of even
    # the tiny model costs ~10s of op-by-op dispatch per call, while a
    # jitted call compiles once (persistently cached) and replays in ms
    fwd = jax.jit(lambda ids, b: model.apply(
        variables, ids, labels=b["labels"], spectrogram=b["spectrogram"],
        pitch=b["pitch"], waveform=b["waveform"]))
    return model, variables, batch, fwd


def test_forward_shapes_and_loss(setup):
    model, variables, batch, fwd = setup
    out = fwd(batch["text_ids"], batch)
    assert out["logits"].shape == (2, 6, 50)
    assert np.isfinite(float(out["loss"]))


def test_deterministic_without_rng(setup):
    model, variables, batch, fwd = setup
    o1 = fwd(batch["text_ids"], batch)["logits"]
    o2 = fwd(batch["text_ids"], batch)["logits"]
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2))


def test_modality_priority_slots():
    p, s, w = object(), object(), object()
    xa = modality_slots(pitch=p, spectrogram=s, waveform=w)
    assert xa["a"] is p and xa["b"] is s and xa["c"] is w
    xa = modality_slots(spectrogram=s)
    assert xa["a"] is s and xa["b"] is s and xa["c"] is s


def test_ce_ignore_pad():
    logits = jnp.zeros((1, 4, 10))
    labels = jnp.asarray([[5, 5, 0, 0]])
    loss = cross_entropy_ignore_pad(logits, labels)
    # uniform logits -> -log(1/10) per non-pad position
    np.testing.assert_allclose(float(loss), np.log(10), rtol=1e-5)


def test_single_modality_works(setup):
    model, variables, batch, _ = setup
    out = jax.jit(lambda ids, spec: model.apply(
        variables, ids, spectrogram=spec))(
            batch["text_ids"], batch["spectrogram"])
    assert out["logits"].shape == (2, 6, 50)


def test_greedy_decode_shapes_and_eos(setup):
    model, variables, batch, _ = setup
    ids = greedy_decode(model, variables,
                        spectrogram=batch["spectrogram"],
                        pitch=batch["pitch"], waveform=batch["waveform"],
                        max_new_tokens=8)
    ids = np.asarray(ids)
    assert ids.shape == (2, 9)
    assert (ids[:, 0] == 1).all()          # BOS start


def test_prefix_masking_matches_unpadded(setup):
    """A fixed-size masked buffer must reproduce the variable-length
    prefix numerics exactly (the decode-correctness invariant)."""
    model, variables, batch, _ = setup
    xa = modality_slots(pitch=batch["pitch"],
                        spectrogram=batch["spectrogram"],
                        waveform=batch["waveform"])
    xa_enc = jax.jit(lambda v, x: model.apply(v, x, method=Model.encode))(
        variables, xa)

    def run(mdl, ids, valid):
        return mdl.processor(ids, xa_enc, seq=True, text_valid=valid,
                             xa_preencoded=False)

    apply_run = jax.jit(lambda ids, valid: model.apply(
        variables, ids, valid, method=run))
    prefix = batch["text_ids"][:, :3]
    out_short = apply_run(prefix, None)
    padded = jnp.pad(batch["text_ids"][:, :3], ((0, 0), (0, 3)))
    valid = jnp.asarray([[1, 1, 1, 0, 0, 0]] * 2, bool)
    out_masked = apply_run(padded, valid)
    np.testing.assert_allclose(np.asarray(out_short),
                               np.asarray(out_masked)[:, :3], atol=2e-4,
                               rtol=1e-3)


def test_tiny_overfit_one_batch():
    """Loss on one repeated batch must drop substantially under
    MaxFactor (integration smoke, SURVEY §4)."""
    import optax
    from asr_model_tpu.optim.maxfactor import bias_group_tree, maxfactor

    dims = Dimensions(tokens=20, mels=4, dims=16, head=2, layer=2)
    model = Model(param=dims, cfg=ModelConfig(dims=dims))
    rng = np.random.RandomState(1)
    batch = {
        "text_ids": jnp.asarray([[1, 5, 6, 7]]),
        "labels": jnp.asarray([[5, 6, 7, 2]]),
        "spectrogram": jnp.asarray(rng.randn(1, 4, 10), jnp.float32),
    }
    variables = jax.jit(lambda r, b: model.init(
        {"params": r}, b["text_ids"], labels=b["labels"],
        spectrogram=b["spectrogram"]))(jax.random.key(0), batch)
    params = variables["params"]
    bs = variables.get("batch_stats", {})
    tx = maxfactor(lr=0.05, bias=bias_group_tree(params))
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, bs):
        def loss_fn(p):
            out, mut = model.apply(
                {"params": p, "batch_stats": bs},
                batch["text_ids"], labels=batch["labels"],
                spectrogram=batch["spectrogram"], train=True,
                rngs={"dropout": jax.random.key(2)},
                mutable=["batch_stats"])
            return out["loss"], mut["batch_stats"]

        (loss, bs2), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params=params)
        return optax.apply_updates(params, updates), opt_state2, bs2, loss

    losses = []
    for _ in range(60):
        params, opt_state, bs, loss = step(params, opt_state, bs)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.5, (losses[0], losses[-1])


def test_cross_kv_cache_matches_full_path(setup):
    """The decode-time cross-attention K/V cache must be numerics-exact
    vs the full per-step recomputation (parity invariant)."""
    model, variables, batch, _ = setup
    xa = modality_slots(pitch=batch["pitch"],
                        spectrogram=batch["spectrogram"],
                        waveform=batch["waveform"])
    xa_enc = jax.jit(lambda v, x: model.apply(v, x, method=Model.encode))(
        variables, xa)
    ids = batch["text_ids"][:, :4]

    def full(mdl, ids):
        return mdl.processor(ids, xa_enc, seq=True)

    def cached(mdl, ids):
        blk = mdl.processor.block[-1]
        re_enc = mdl.processor._encode_xa(blk, xa_enc)
        kv = mdl.processor._precompute_cross(blk, re_enc)
        return mdl.processor(ids, {}, seq=True, xa_kv=kv)

    a = jax.jit(lambda i: model.apply(variables, i, method=full))(ids)
    b = jax.jit(lambda i: model.apply(variables, i, method=cached))(ids)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=2e-4, rtol=2e-3)


def test_processor_is_not_causal_beyond_attention():
    """Documented property: the processor leaks future-token information
    into earlier positions EVEN with causal_all=True — MSheath's global
    working-memory pooling (model.py:463-465) and the d||e concatenation
    cross-attention (model.py:625-626) are non-causal by construction.
    This is why the reference's default eval metric is teacher-forced
    WER (SURVEY §3.4) and why decode recomputes the whole prefix.  The
    prefix-causal variant is ModelConfig(streaming=True), tested below."""
    dims = Dimensions(tokens=30, mels=4, dims=16, head=2, layer=2)
    rng = np.random.RandomState(0)
    spec = jnp.asarray(rng.randn(1, 4, 10), jnp.float32)
    ids1 = jnp.asarray([[1, 5, 6, 7]])
    ids2 = jnp.asarray([[1, 5, 9, 9]])          # differs only at t>=2
    for causal_all in (False, True):
        model = Model(param=dims,
                      cfg=ModelConfig(dims=dims, causal_all=causal_all))
        variables = jax.jit(lambda r: model.init(
            {"params": r}, ids1, spectrogram=spec))(jax.random.key(0))
        f = jax.jit(lambda i: model.apply(
            variables, i, spectrogram=spec)["logits"])
        l1, l2 = f(ids1), f(ids2)
        assert not np.allclose(np.asarray(l1)[:, :2],
                               np.asarray(l2)[:, :2], atol=1e-5), \
            f"unexpectedly causal (causal_all={causal_all})"


def test_streaming_processor_is_prefix_causal():
    """streaming=True removes every future-token leak: position t's
    logits are a function of tokens <= t only (prefix-causal MSheath
    running means, position-0 jump policy, causal d||e cross)."""
    dims = Dimensions(tokens=30, mels=4, dims=16, head=2, layer=2)
    rng = np.random.RandomState(0)
    spec = jnp.asarray(rng.randn(1, 4, 10), jnp.float32)
    ids1 = jnp.asarray([[1, 5, 6, 7]])
    ids2 = jnp.asarray([[1, 5, 9, 9]])          # differs only at t>=2
    model = Model(param=dims, cfg=ModelConfig(dims=dims, streaming=True))
    variables = jax.jit(lambda r: model.init(
        {"params": r}, ids1, spectrogram=spec))(jax.random.key(0))
    f = jax.jit(lambda i: model.apply(
        variables, i, spectrogram=spec)["logits"])
    l1, l2 = f(ids1), f(ids2)
    np.testing.assert_allclose(np.asarray(l1)[:, :2],
                               np.asarray(l2)[:, :2], atol=1e-5, rtol=1e-4)
    # still sequence-dependent beyond the shared prefix
    assert not np.allclose(np.asarray(l1)[:, 2:], np.asarray(l2)[:, 2:],
                           atol=1e-5)


def test_streaming_prefix_masking_matches_unpadded():
    """The fixed-buffer masked-prefix decode invariant must hold in
    streaming mode too (greedy decode reuses the same buffer path)."""
    dims = Dimensions(tokens=30, mels=4, dims=16, head=2, layer=2)
    rng = np.random.RandomState(0)
    spec = jnp.asarray(rng.randn(2, 4, 10), jnp.float32)
    ids = jnp.asarray(rng.randint(3, 30, (2, 6)))
    model = Model(param=dims, cfg=ModelConfig(dims=dims, streaming=True))
    variables = jax.jit(lambda r: model.init(
        {"params": r}, ids, spectrogram=spec))(jax.random.key(0))
    xa = modality_slots(spectrogram=spec)
    xa_enc = jax.jit(lambda v, x: model.apply(v, x, method=Model.encode))(
        variables, xa)

    def run(mdl, ids, valid):
        return mdl.processor(ids, xa_enc, seq=True, text_valid=valid,
                             xa_preencoded=False)

    apply_run = jax.jit(lambda i, v: model.apply(variables, i, v,
                                                 method=run))
    out_short = apply_run(ids[:, :3], None)
    padded = jnp.pad(ids[:, :3], ((0, 0), (0, 3)))
    valid = jnp.asarray([[1, 1, 1, 0, 0, 0]] * 2, bool)
    out_masked = apply_run(padded, valid)
    np.testing.assert_allclose(np.asarray(out_short),
                               np.asarray(out_masked)[:, :3], atol=2e-4,
                               rtol=1e-3)


def test_staged_bucket_decode_token_exact(setup):
    """The prefix-bucket decode (generate._bucket_sizes: short prefixes
    run in short buffers) must emit EXACTLY the tokens of a full-width
    single-bucket decode — every length-dependent op is masked, so the
    buffer width is numerics-invisible."""
    from asr_model_tpu.models import generate as G

    model, variables, batch, _ = setup
    kw = dict(spectrogram=batch["spectrogram"], pitch=batch["pitch"],
              waveform=batch["waveform"])
    assert len(G._bucket_sizes(1 + 30, G._decode_stages())) > 1  # staged
    staged = np.asarray(G.greedy_decode(model, variables,
                                        max_new_tokens=30,
                                        suppress_eos=True, **kw))
    G._build_decode_fn.cache_clear()
    orig = G._bucket_sizes
    try:
        G._bucket_sizes = lambda T, n_stages=4: [T]
        single = np.asarray(G.greedy_decode(model, variables,
                                            max_new_tokens=30,
                                            suppress_eos=True, **kw))
    finally:
        G._bucket_sizes = orig
        G._build_decode_fn.cache_clear()
    np.testing.assert_array_equal(staged, single)
