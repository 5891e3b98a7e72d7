"""Pallas kernels vs XLA reference numerics (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from asr_model_tpu.models.attention import sdpa
from asr_model_tpu.ops.mel import mel_spectrogram
from asr_model_tpu.ops.pallas.attention_kernel import flash_attention
from asr_model_tpu.ops.pallas.mel_kernel import pallas_mel_spectrogram


def test_pallas_mel_matches_xla_path():
    rng = np.random.RandomState(0)
    n = 16000  # 1s
    t = np.arange(n) / 16000
    audio = (np.sin(2 * np.pi * 440 * t) + 0.01 * rng.randn(n)
             ).astype(np.float32)
    want = np.asarray(mel_spectrogram(jnp.asarray(audio), n_mels=32))
    got = np.asarray(pallas_mel_spectrogram(jnp.asarray(audio), n_mels=32,
                                            interpret=True))
    assert got.shape == want.shape == (32, 101)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("causal", [False, True])
def test_flash_attention_matches_sdpa(causal):
    rng = np.random.RandomState(1)
    B, H, T, D = 2, 2, 48, 16
    q = jnp.asarray(rng.randn(B, H, T, D), jnp.float32)
    k = jnp.asarray(rng.randn(B, H, T, D), jnp.float32)
    v = jnp.asarray(rng.randn(B, H, T, D), jnp.float32)
    want = np.asarray(sdpa(q, k, v, causal=causal))
    got = np.asarray(flash_attention(q, k, v, causal=causal,
                                     interpret=True))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-4)


def test_flash_attention_kv_mask():
    rng = np.random.RandomState(2)
    B, H, Tq, Tk, D = 1, 2, 8, 24, 16
    q = jnp.asarray(rng.randn(B, H, Tq, D), jnp.float32)
    k = jnp.asarray(rng.randn(B, H, Tk, D), jnp.float32)
    v = jnp.asarray(rng.randn(B, H, Tk, D), jnp.float32)
    valid = jnp.asarray(np.arange(Tk)[None] < 10)
    want = np.asarray(sdpa(q, k, v, kv_valid=valid))
    got = np.asarray(flash_attention(q, k, v, kv_valid=valid,
                                     interpret=True))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-4)
    # masked == truncated
    want_trunc = np.asarray(sdpa(q, k[:, :, :10], v[:, :, :10]))
    np.testing.assert_allclose(got, want_trunc, atol=2e-5, rtol=2e-4)


def test_sdpa_flash_routing_matches_and_differentiates():
    """attention.sdpa routes to the flash kernel when FLASH='on'
    (interpret off-TPU) with identical numerics and working grads
    (custom-VJP backward through the XLA math)."""
    from asr_model_tpu.models import attention as A

    rng = np.random.RandomState(4)
    B, H, T, D = 1, 2, 192, 128   # above the routing thresholds
    q = jnp.asarray(rng.randn(B, H, T, D) * 0.1, jnp.float32)
    k = jnp.asarray(rng.randn(B, H, T, D) * 0.1, jnp.float32)
    v = jnp.asarray(rng.randn(B, H, T, D), jnp.float32)

    def loss(q, k, v):
        return jnp.sum(A.sdpa(q, k, v, causal=True) ** 2)

    old = A.FLASH
    try:
        A.FLASH = "off"
        jax.clear_caches()
        want = np.asarray(A.sdpa(q, k, v, causal=True))
        gw = jax.grad(loss)(q, k, v)
        A.FLASH = "on"
        jax.clear_caches()
        got = np.asarray(A.sdpa(q, k, v, causal=True))
        gg = jax.grad(loss)(q, k, v)
    finally:
        A.FLASH = old
        jax.clear_caches()
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gg),
                               atol=5e-4, rtol=5e-3)
    # below the thresholds the XLA path is used (no kernel dispatch):
    assert not A._flash_eligible(q[:, :, :64], k[:, :, :64], None)


def test_log_mel_pallas_routing_matches():
    """ops.mel.log_mel_spectrogram routes to the fused Pallas kernel
    when PALLAS_MEL='on' with tolerance-close numerics."""
    from asr_model_tpu.ops import mel as M

    rng = np.random.RandomState(5)
    audio = jnp.asarray(rng.randn(16000), jnp.float32)
    old = M.PALLAS_MEL
    try:
        M.PALLAS_MEL = "off"
        jax.clear_caches()
        want = np.asarray(M.log_mel_spectrogram(audio, n_mels=32))
        M.PALLAS_MEL = "on"
        jax.clear_caches()
        got = np.asarray(M.log_mel_spectrogram(audio, n_mels=32))
    finally:
        M.PALLAS_MEL = old
        jax.clear_caches()
    assert got.shape == want.shape
    # post-compression scale: (log10 mel + 4)/4
    np.testing.assert_allclose(got, want, atol=5e-2)
    assert np.abs(got - want).mean() < 1e-3


def test_flash_attention_uneven_lengths():
    rng = np.random.RandomState(3)
    B, H, Tq, Tk, D = 1, 1, 130, 200, 16   # crosses tile boundaries
    q = jnp.asarray(rng.randn(B, H, Tq, D), jnp.float32)
    k = jnp.asarray(rng.randn(B, H, Tk, D), jnp.float32)
    v = jnp.asarray(rng.randn(B, H, Tk, D), jnp.float32)
    want = np.asarray(sdpa(q, k, v))
    got = np.asarray(flash_attention(q, k, v, interpret=True))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-4)


@pytest.mark.parametrize("use_valid", [False, True])
def test_fused_sheath_scan_matches_xla(use_valid, monkeypatch):
    """The fused MSheath Pallas program (interpreter mode on CPU) must
    reproduce the XLA lax.scan path exactly: outputs to f32 rounding,
    jump actions and jstat counters bit-equal."""
    import asr_model_tpu.models.sheath as sheath_mod
    from asr_model_tpu.models.sheath import MSheath

    rng = np.random.RandomState(0)
    B, T, D = 2, 6, 128                     # D lane-aligned: kernel gate
    m = MSheath(dims=D, head=2, layer=4)
    x = jnp.asarray(rng.randn(B, T, D), jnp.float32)
    valid = jnp.asarray([[1, 1, 1, 1, 0, 0], [1] * 6], bool) \
        if use_valid else None
    variables = m.init({"params": jax.random.key(0)}, x)

    monkeypatch.setattr(sheath_mod, "_PALLAS_SHEATH", "off")
    want, aux_w = m.apply(variables, x, valid)
    monkeypatch.setattr(sheath_mod, "_PALLAS_SHEATH", "on")
    got, aux_g = m.apply(variables, x, valid)

    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(aux_w["jstat"]),
                                  np.asarray(aux_g["jstat"]))
    np.testing.assert_array_equal(np.asarray(aux_w["actions"]),
                                  np.asarray(aux_g["actions"]))


def test_fused_sheath_scan_bf16(monkeypatch):
    """bf16 storage: the kernel computes in f32 internally and must
    stay within bf16 tolerance of the XLA bf16 path."""
    import asr_model_tpu.models.sheath as sheath_mod
    from asr_model_tpu.models.sheath import MSheath

    rng = np.random.RandomState(1)
    B, T, D = 2, 5, 128                     # D lane-aligned: kernel gate
    m = MSheath(dims=D, head=2, layer=4)
    x32 = jnp.asarray(rng.randn(B, T, D), jnp.float32)
    variables = m.init({"params": jax.random.key(0)}, x32)
    bf_vars = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if a.dtype == jnp.float32 else a, variables)
    x = x32.astype(jnp.bfloat16)

    monkeypatch.setattr(sheath_mod, "_PALLAS_SHEATH", "off")
    want, _ = m.apply(bf_vars, x)
    monkeypatch.setattr(sheath_mod, "_PALLAS_SHEATH", "on")
    got, _ = m.apply(bf_vars, x)
    assert got.dtype == want.dtype
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=5e-2, rtol=5e-2)


@pytest.mark.parametrize("D,shape", [(128, (2, 6, 128)),
                                     (256, (2, 4, 5, 256)),
                                     # N=4000 rows (N*D > 400k):
                                     # exercises the row grid (TN=256)
                                     # incl. a partial 160-row edge
                                     # block — the forced-large-N path
                                     # (PALLAS_ABBY=on bypasses the
                                     # x.size production gate);
                                     # production-gated sizes take the
                                     # single-block path
                                     (128, (40, 100, 128))])
def test_fused_abby_tail_matches_xla(D, shape, monkeypatch):
    """The fused AbbyNormal tail (stats + hard routing + windowed
    channel reductions + normalizer) must match the XLA path at eval,
    including 4-D head-norm shapes and grid-tiled row counts."""
    import asr_model_tpu.models.norms as norms_mod
    import asr_model_tpu.ops.pallas.abby_kernel as abby_mod
    from asr_model_tpu.models.norms import AbbyNormal

    rng = np.random.RandomState(0)
    m = AbbyNormal(dims=D)
    x = jnp.asarray(rng.randn(*shape), jnp.float32) * 2.0
    variables = m.init({"params": jax.random.key(0)}, x)
    monkeypatch.setattr(norms_mod, "_PALLAS_ABBY", "off")
    want = m.apply(variables, x)
    monkeypatch.setattr(norms_mod, "_PALLAS_ABBY", "on")
    calls = []
    real = abby_mod.fused_abby

    def spy(*a, **kw):
        calls.append(a[0].shape)
        return real(*a, **kw)

    monkeypatch.setattr(abby_mod, "fused_abby", spy)
    got = m.apply(variables, x)
    assert calls, "PALLAS_ABBY=on must engage the fused kernel"
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)


def test_fused_abby_tail_short_wide_block_clamp():
    """Direct-call case for the tn=min(N, 256) clamp: N < 256 rows but
    N*D past the single-block budget (D=2048) must not request a block
    taller than the array."""
    from asr_model_tpu.ops.pallas.abby_kernel import fused_abby_tail

    rng = np.random.RandomState(3)
    N, D = 250, 2048
    x2 = jnp.asarray(rng.randn(N, D), jnp.float32)
    logits2 = jnp.asarray(rng.randn(N, 3), jnp.float32)
    size = max(3, int(D * 0.05)) | 1
    got = fused_abby_tail(x2, logits2, size=size, alpha=1e-4, k=1.0,
                          beta=0.75, interpret=True)

    # XLA reference (the eval-mode deterministic routing of norms.py)
    from asr_model_tpu.models.norms import window_reduce_last
    div = x2 * x2
    mean_val = jnp.mean(jnp.abs(x2), axis=-1, keepdims=True)
    cv = jnp.std(x2, axis=-1, keepdims=True, ddof=1) / (mean_val + 1e-6)
    choice = jnp.argmax(logits2 + cv, axis=-1, keepdims=True)
    avg_d = window_reduce_last(div, size, "mean")
    max_d = window_reduce_last(div, size, "max")
    div2 = jnp.where(max_d > 2.0 * avg_d, max_d, avg_d)
    mix = jnp.where(choice == 1, div2, avg_d)
    want = x2 / (mix * 1e-4 + 1.0) ** 0.75
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)


def test_fused_abby_tail_gumbel_rng_falls_back(monkeypatch):
    """With a gumbel rng (training) the stochastic XLA path must run —
    the fused tail is eval-only."""
    import asr_model_tpu.models.norms as norms_mod
    from asr_model_tpu.models.norms import AbbyNormal

    m = AbbyNormal(dims=64)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 4, 64), jnp.float32)
    variables = m.init({"params": jax.random.key(0)}, x)
    monkeypatch.setattr(norms_mod, "_PALLAS_ABBY", "on")
    o1 = m.apply(variables, x, rngs={"gumbel": jax.random.key(1)})
    o2 = m.apply(variables, x, rngs={"gumbel": jax.random.key(2)})
    # different gumbel keys can route differently -> just check it runs
    assert o1.shape == o2.shape == x.shape


# ---- fused whole-call decode attention (ops/pallas/xattn_kernel) ----

def _attn_module_and_vars(dims=256, head=2, T=10, Ta=None, seed=0):
    from asr_model_tpu.models.attention import Attention

    rng = np.random.RandomState(seed)
    m = Attention(dims=dims, head=head, layer=2, n_type="AbbyNormal")
    x = jnp.asarray(rng.randn(2, T, dims) * 0.5, jnp.float32)
    xa = (None if Ta is None
          else jnp.asarray(rng.randn(2, Ta, dims) * 0.5, jnp.float32))
    variables = m.init({"params": jax.random.key(3)}, x, xa=xa)
    return m, variables, x, xa


@pytest.mark.parametrize("causal", [False, True])
def test_fused_attn_full_self_matches_xla(causal, monkeypatch):
    """The whole-call fused self-attention kernel (q/kv AbbyNormals,
    projections, signal-adaptive rotary, per-head norms, softmax,
    out_proj in ONE program) must match the XLA path at eval."""
    import asr_model_tpu.models.attention as am

    m, variables, x, _ = _attn_module_and_vars()
    valid = jnp.asarray(np.arange(x.shape[1])[None, :] < 8
                        ).repeat(2, axis=0)
    monkeypatch.setattr(am, "_PALLAS_XATTN", "off")
    want = m.apply(variables, x, causal=causal, kv_valid=valid)
    monkeypatch.setattr(am, "_PALLAS_XATTN", "on")
    got = m.apply(variables, x, causal=causal, kv_valid=valid)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-5, rtol=5e-4)


def test_fused_attn_full_cross_matches_xla(monkeypatch):
    """Full cross-attention (the g-block call: kv side computed from
    xa) through the fused kernel."""
    import asr_model_tpu.models.attention as am

    m, variables, x, xa = _attn_module_and_vars(T=10, Ta=12, seed=1)
    monkeypatch.setattr(am, "_PALLAS_XATTN", "off")
    want = m.apply(variables, x, xa=xa)
    monkeypatch.setattr(am, "_PALLAS_XATTN", "on")
    got = m.apply(variables, x, xa=xa)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-5, rtol=5e-4)


def test_fused_attn_cached_matches_xla(monkeypatch):
    """Cached-KV cross-attention (the b/c/d decode calls against the
    per-utterance audio KV cache) through the fused kernel, with and
    without a kv validity mask."""
    import asr_model_tpu.models.attention as am
    from asr_model_tpu.models.attention import Attention

    m, variables, x, xa = _attn_module_and_vars(T=6, Ta=20, seed=2)
    kv = m.apply(variables, xa, method=Attention.precompute_kv)
    valid = jnp.asarray(np.arange(20)[None, :] < 15).repeat(2, axis=0)
    for kv_valid in (None, valid):
        monkeypatch.setattr(am, "_PALLAS_XATTN", "off")
        want = m.apply(variables, x, cached_kv=kv, kv_valid=kv_valid)
        monkeypatch.setattr(am, "_PALLAS_XATTN", "on")
        got = m.apply(variables, x, cached_kv=kv, kv_valid=kv_valid)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=5e-5, rtol=5e-4)


def test_fused_attn_gates(monkeypatch):
    """The fused call must NOT engage with a gumbel rng (training), at
    encoder sizes, or at non-lane-aligned head dims."""
    import asr_model_tpu.models.attention as am

    m, variables, x, _ = _attn_module_and_vars()
    monkeypatch.setattr(am, "_PALLAS_XATTN", "on")
    calls = []

    def boom(*a, **kw):
        calls.append(1)
        raise AssertionError("fused path engaged")

    monkeypatch.setattr(am.Attention, "_fused_full", boom)
    # training (gumbel rng present) -> XLA path
    m.apply(variables, x, causal=True,
            rngs={"gumbel": jax.random.key(0)})
    # hd = 64 (not lane-aligned) -> XLA path
    m2, v2, x2, _ = _attn_module_and_vars(dims=128, head=2, seed=4)
    m2.apply(v2, x2, causal=True)
    assert not calls


# ---- fused residual-MLP tail (ops/pallas/mlp_kernel) ----

@pytest.mark.parametrize("shape", [(2, 6, 128),
                                   # N*D past the single-block budget:
                                   # row grid incl. a partial block
                                   (4, 400, 128)])
def test_fused_mlp_residual_matches_xla(shape, monkeypatch):
    """x + Residual._mlp(x) as ONE dispatch (shared-AbbyNormal ln,
    TGate, exact-gelu MLP pair) must match the XLA path at eval."""
    import asr_model_tpu.models.decoder as dm
    from asr_model_tpu.models.decoder import Residual

    rng = np.random.RandomState(7)
    m = Residual(dims=128, head=2, layer=2, act="gelu",
                 n_type="AbbyNormal")
    x = jnp.asarray(rng.randn(*shape) * 0.5, jnp.float32)
    variables = m.init({"params": jax.random.key(0)}, x)
    monkeypatch.setattr(dm, "_PALLAS_MLP", "off")
    want = m.apply(variables, x)
    monkeypatch.setattr(dm, "_PALLAS_MLP", "on")
    got = m.apply(variables, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-5, rtol=5e-4)


def test_fused_mlp_gates(monkeypatch):
    """No fused MLP with a gumbel rng (training), non-gelu acts, or
    MoE blocks."""
    import asr_model_tpu.models.decoder as dm
    from asr_model_tpu.models.decoder import Residual

    rng = np.random.RandomState(8)
    x = jnp.asarray(rng.randn(2, 4, 128), jnp.float32)
    monkeypatch.setattr(dm, "_PALLAS_MLP", "on")

    def boom(self, x):
        raise AssertionError("fused mlp engaged")

    monkeypatch.setattr(dm.Residual, "_mlp_residual_fused", boom)
    m = Residual(dims=128, head=2, layer=2, act="gelu",
                 n_type="AbbyNormal")
    variables = m.init({"params": jax.random.key(0)}, x)
    m.apply(variables, x, rngs={"gumbel": jax.random.key(1)})
    m2 = Residual(dims=128, head=2, layer=2, act="relu",
                  n_type="AbbyNormal")
    v2 = m2.init({"params": jax.random.key(0)}, x)
    m2.apply(v2, x)


# ---- fused identical-input Router (ops/pallas/router_kernel) ----

@pytest.mark.parametrize("shape,n_mod", [((2, 6, 128), 3),
                                         ((4, 500, 256), 3),
                                         # layer=2 models route ONE
                                         # modality (n_router=layer-1)
                                         ((2, 6, 128), 1)])
def test_fused_router_matches_xla(shape, n_mod, monkeypatch):
    """Router(*[x]*n_mod) as ONE dispatch (collapsed concat
    contraction + in-kernel top-2 scatter) must match the XLA path at
    eval, including the n_mod != num_types case (kernel width follows
    the stacked input, bias bound follows num_types — the reference's
    lazy-Dense split)."""
    import asr_model_tpu.models.gates as gm
    from asr_model_tpu.models.gates import Router

    rng = np.random.RandomState(9)
    m = Router(dims=shape[-1], num_types=3)
    x = jnp.asarray(rng.randn(*shape), jnp.float32)
    mods = (x,) * n_mod
    variables = m.init({"params": jax.random.key(0)}, *mods)
    monkeypatch.setattr(gm, "_PALLAS_ROUTER", "off")
    want = m.apply(variables, *mods)
    monkeypatch.setattr(gm, "_PALLAS_ROUTER", "on")
    got = m.apply(variables, *mods)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-5, rtol=5e-4)


def test_fused_router_distinct_inputs_fall_back(monkeypatch):
    """Distinct modalities must use the full stacked XLA math even
    when the kernel is forced on."""
    import asr_model_tpu.models.gates as gm
    from asr_model_tpu.models.gates import Router

    rng = np.random.RandomState(10)
    m = Router(dims=128, num_types=3)
    a = jnp.asarray(rng.randn(1, 4, 128), jnp.float32)
    b = jnp.asarray(rng.randn(1, 4, 128), jnp.float32)
    variables = m.init({"params": jax.random.key(0)}, a, b, a)
    monkeypatch.setattr(gm, "_PALLAS_ROUTER", "on")

    def boom(*args, **kw):
        raise AssertionError("fused router engaged on distinct inputs")

    import asr_model_tpu.ops.pallas.router_kernel as rk
    monkeypatch.setattr(rk, "fused_router_same", boom)
    out = m.apply(variables, a, b, a)
    assert out.shape == a.shape


def test_all_decode_kernels_compose_in_model_forward(monkeypatch):
    """Eval-mode Model.forward with EVERY decode kernel forced on
    (sheath, abby, whole-call attention, MLP tail, router — interpret
    mode on CPU) must match the all-XLA logits: the kernels compose
    through the full a/b/c/d/e/(d||e->g) block flow."""
    import asr_model_tpu.models.attention as am
    import asr_model_tpu.models.decoder as dm
    import asr_model_tpu.models.gates as gm
    import asr_model_tpu.models.norms as nm
    import asr_model_tpu.models.sheath as sm
    from asr_model_tpu.config import Dimensions, ModelConfig
    from asr_model_tpu.models.model import Model

    dims = Dimensions(tokens=96, mels=8, dims=256, head=2, layer=2)
    model = Model(param=dims, cfg=ModelConfig(dims=dims))
    rng = np.random.RandomState(11)
    batch = {
        "text_ids": jnp.asarray(rng.randint(3, 96, (2, 5)), jnp.int32),
        "spectrogram": jnp.asarray(rng.randn(2, 8, 12), jnp.float32),
    }
    variables = jax.jit(lambda r, b: model.init(
        {"params": r}, b["text_ids"],
        spectrogram=b["spectrogram"]))(jax.random.key(0), batch)

    def run():
        out = model.apply(variables, batch["text_ids"],
                          spectrogram=batch["spectrogram"])
        return np.asarray(out["logits"])

    for mod, name in ((sm, "_PALLAS_SHEATH"), (nm, "_PALLAS_ABBY"),
                      (am, "_PALLAS_XATTN"), (dm, "_PALLAS_MLP"),
                      (gm, "_PALLAS_ROUTER")):
        monkeypatch.setattr(mod, name, "off")
    want = run()
    for mod, name in ((sm, "_PALLAS_SHEATH"), (nm, "_PALLAS_ABBY"),
                      (am, "_PALLAS_XATTN"), (dm, "_PALLAS_MLP"),
                      (gm, "_PALLAS_ROUTER")):
        monkeypatch.setattr(mod, name, "on")
    got = run()
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=2e-3)
