"""Long-form chunked inference tests (BASELINE config #4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from asr_model_tpu.config import Dimensions, ModelConfig
from asr_model_tpu.models.generate import greedy_decode, greedy_decode_prompted
from asr_model_tpu.models.longform import chunk_audio, transcribe_long
from asr_model_tpu.models.model import Model


def test_chunk_audio_coverage_and_overlap():
    sr = 16000
    audio = np.arange(sr * 7, dtype=np.float32)  # 7s, identifiable values
    chunks = chunk_audio(audio, sr, chunk_sec=3.0, overlap_sec=1.0)
    assert all(len(c) == 3 * sr for c in chunks)
    # stride = 2s: chunks start at 0, 2, 4; the chunk at 4 reaches the
    # end (4+3 >= 7) so coverage completes with 3 chunks
    assert len(chunks) == 3
    assert chunks[1][0] == 2 * sr          # overlap region starts 1s early
    assert chunks[-1][-1] == audio[-1]     # full coverage, no padding here
    # an 8s input needs a padded final chunk
    chunks8 = chunk_audio(np.ones(sr * 8, np.float32), sr, 3.0, 1.0)
    assert len(chunks8) == 4 and chunks8[-1][-1] == 0.0


def test_chunk_audio_short_input_single_chunk():
    chunks = chunk_audio(np.ones(100, np.float32), 16000, 3.0, 1.0)
    assert len(chunks) == 1 and len(chunks[0]) == 48000


@pytest.fixture(scope="module")
def tiny():
    dims = Dimensions(tokens=50, mels=8, dims=16, head=2, layer=2)
    model = Model(param=dims, cfg=ModelConfig(dims=dims))
    rng = np.random.RandomState(0)
    mel = jnp.asarray(rng.randn(1, 8, 20), jnp.float32)
    variables = jax.jit(lambda r: model.init(
        {"params": r}, jnp.ones((1, 4), jnp.int32),
        spectrogram=mel))(jax.random.key(0))
    return model, variables, mel


def test_prompted_decode_echoes_prompt(tiny):
    model, variables, mel = tiny
    prompt = jnp.asarray([[7, 8, 9]], jnp.int32)
    ids = greedy_decode_prompted(model, variables, prompt,
                                 spectrogram=mel, max_new_tokens=4)
    row = np.asarray(ids)[0]
    assert row[0] == 1
    np.testing.assert_array_equal(row[1:4], [7, 8, 9])
    assert ids.shape == (1, 1 + 3 + 4)


def test_prompted_decode_empty_prompt_matches_plain(tiny):
    model, variables, mel = tiny
    a = greedy_decode(model, variables, spectrogram=mel, max_new_tokens=5)
    b = greedy_decode_prompted(model, variables,
                               jnp.zeros((1, 0), jnp.int32),
                               spectrogram=mel, max_new_tokens=5)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_transcribe_long_runs(tiny):
    model, variables, _ = tiny
    sr = 16000
    t = np.arange(sr * 3) / sr
    audio = (0.5 * np.sin(2 * np.pi * 200 * t)).astype(np.float32)
    ids, text = transcribe_long(model, variables, audio,
                                sample_rate=sr, chunk_sec=1.0,
                                overlap_sec=0.25,
                                max_new_tokens_per_chunk=4,
                                use_pitch=False, use_waveform=False)
    assert isinstance(ids, list)
    assert all(i not in (0, 2) for i in ids)   # no PAD/EOS in output


def test_transcribe_long_sp_runs():
    """Single-pass SP long-form returns token ids (8-way seq mesh)."""
    import jax
    import jax.numpy as jnp

    from asr_model_tpu.config import Dimensions, ModelConfig
    from asr_model_tpu.models.longform import transcribe_long_sp
    from asr_model_tpu.models.model import Model
    from asr_model_tpu.parallel.mesh import make_mesh

    dims = Dimensions(tokens=32, mels=8, dims=16, head=2, layer=2)
    model = Model(param=dims, cfg=ModelConfig(dims=dims))
    sr = 16000
    audio = np.sin(2 * np.pi * 220 *
                   np.arange(int(sr * 3.0)) / sr).astype(np.float32)
    spec0 = jnp.zeros((1, dims.mels, 64), jnp.float32)
    variables = jax.jit(lambda r: model.init(
        {"params": r}, jnp.ones((1, 2), jnp.int32),
        spectrogram=spec0))(jax.random.key(0))
    mesh = make_mesh(data=1, model=1, seq=8)
    ids, _ = transcribe_long_sp(model, variables, audio, mesh,
                                max_new_tokens=4, use_pitch=False,
                                use_waveform=False)
    assert isinstance(ids, list)


def test_transcribe_long_bf16_variables(tiny):
    """bf16 inference mode (cast_variables) must work through the
    long-form path — the chunk frontend follows the param dtype
    (regression: f32 features vs bf16 conv kernels is a dtype error)."""
    from asr_model_tpu.models.model import cast_variables

    model, variables, _ = tiny
    sr = 16000
    audio = np.sin(2 * np.pi * 220 *
                   np.arange(int(sr * 1.5)) / sr).astype(np.float32)
    ids, _ = transcribe_long(model, cast_variables(variables), audio,
                             chunk_sec=1.0, overlap_sec=0.25,
                             max_new_tokens_per_chunk=3,
                             use_pitch=False, use_waveform=False)
    assert isinstance(ids, list)
