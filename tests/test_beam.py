"""Beam-search tests: shapes, greedy-equivalence at K=1, monotone
scores."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from asr_model_tpu.config import Dimensions, ModelConfig
from asr_model_tpu.models.beam import beam_search
from asr_model_tpu.models.generate import greedy_decode
from asr_model_tpu.models.model import Model

DIMS = Dimensions(tokens=50, mels=8, dims=16, head=2, layer=2)


@pytest.fixture(scope="module")
def setup():
    model = Model(param=DIMS, cfg=ModelConfig(dims=DIMS))
    rng = np.random.RandomState(0)
    mel = jnp.asarray(rng.randn(2, 8, 12), jnp.float32)
    variables = jax.jit(lambda r: model.init(
        {"params": r}, jnp.ones((2, 4), jnp.int32),
        spectrogram=mel))(jax.random.key(0))
    return model, variables, mel


def test_beam_shapes_and_scores(setup):
    model, variables, mel = setup
    ids, scores = beam_search(model, variables, spectrogram=mel,
                              beam_size=3, max_new_tokens=6)
    ids = np.asarray(ids)
    assert ids.shape == (2, 7)
    assert (ids[:, 0] == 1).all()
    assert np.isfinite(np.asarray(scores)).all()


def test_beam1_matches_greedy(setup):
    """K=1 beam search must produce the greedy transcript."""
    model, variables, mel = setup
    g = np.asarray(greedy_decode(model, variables, spectrogram=mel,
                                 max_new_tokens=6))
    b, _ = beam_search(model, variables, spectrogram=mel,
                       beam_size=1, max_new_tokens=6, length_penalty=0.0)
    np.testing.assert_array_equal(np.asarray(b), g)


def test_wider_beam_not_worse(setup):
    """A wider beam's (unnormalized) best score >= greedy's path score."""
    model, variables, mel = setup
    _, s1 = beam_search(model, variables, spectrogram=mel,
                        beam_size=1, max_new_tokens=6, length_penalty=0.0)
    _, s4 = beam_search(model, variables, spectrogram=mel,
                        beam_size=4, max_new_tokens=6, length_penalty=0.0)
    assert (np.asarray(s4) >= np.asarray(s1) - 1e-4).all()
