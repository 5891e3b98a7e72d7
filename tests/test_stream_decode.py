"""Incremental streaming decode == buffer decode, token for token.

greedy_decode re-evaluates the full prefix buffer every step (the only
exact option for the non-causal parity model); the streaming variant
is prefix-causal everywhere, so greedy_decode_stream carries per-site
KV caches + MSheath running-mean state and does O(1) work per token.
These tests pin the equivalence that makes that optimization sound.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from asr_model_tpu.config import Dimensions, ModelConfig
from asr_model_tpu.models.generate import greedy_decode, greedy_decode_stream
from asr_model_tpu.models.model import Model

DIMS = Dimensions(tokens=128, mels=8, dims=32, head=2, layer=2)


def _build(streaming=True, seed=0, batch=2, t_audio=24):
    model = Model(param=DIMS, cfg=ModelConfig(dims=DIMS,
                                              streaming=streaming))
    rng = np.random.RandomState(seed)
    spec = jnp.asarray(rng.randn(batch, DIMS.mels, t_audio), jnp.float32)
    pitch = jnp.asarray(np.abs(rng.randn(batch, 1, t_audio)), jnp.float32)
    variables = jax.jit(lambda r: model.init(
        {"params": r}, jnp.ones((batch, 2), jnp.int32),
        spectrogram=spec, pitch=pitch))(jax.random.key(seed))
    return model, variables, spec, pitch


@pytest.mark.parametrize("suppress_eos", [False, True])
def test_stream_decode_matches_buffer_decode(suppress_eos):
    model, variables, spec, pitch = _build()
    kw = dict(spectrogram=spec, pitch=pitch, max_new_tokens=6,
              suppress_eos=suppress_eos)
    want = np.asarray(greedy_decode(model, variables, **kw))
    got = np.asarray(greedy_decode_stream(model, variables, **kw))
    np.testing.assert_array_equal(got, want)


def test_stream_decode_matches_buffer_decode_bf16():
    from asr_model_tpu.models.model import cast_variables

    model, variables, spec, pitch = _build(seed=3)
    v16 = cast_variables(variables)
    kw = dict(spectrogram=spec.astype(jnp.bfloat16),
              pitch=pitch.astype(jnp.bfloat16), max_new_tokens=5)
    want = np.asarray(greedy_decode(model, v16, **kw))
    got = np.asarray(greedy_decode_stream(model, v16, **kw))
    # bf16 carries may differ in the last ulp between cumsum and
    # running-sum orders; token agreement is the contract
    np.testing.assert_array_equal(got, want)


def test_stream_decode_rejects_non_streaming():
    model, variables, spec, _ = _build(streaming=False)
    with pytest.raises(ValueError, match="streaming"):
        greedy_decode_stream(model, variables, spectrogram=spec,
                             max_new_tokens=2)
