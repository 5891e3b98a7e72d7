"""Long-form chunked inference (BASELINE config #4).

The reference handles long audio only by padding to the 2048-ctx cap
(SURVEY §5.7) — 30s+ utterances need chunking.  Design:

* split the waveform into fixed ``chunk_sec`` windows with
  ``overlap_sec`` acoustic overlap (context for the encoder convs at
  chunk boundaries);
* run the on-device frontend + encoder + greedy decode per chunk —
  every chunk has the SAME static shape, so XLA compiles exactly one
  program reused across chunks and utterances;
* carry decoding state across chunks by seeding each chunk's decode
  with the last ``carry_tokens`` tokens of the previous chunk's
  transcript (prompt-conditioned decode: the fixed-size buffer starts
  with BOS + prompt instead of BOS alone) — the decoder keeps lexical
  continuity without attending across chunk boundaries;
* strip the prompt echo from each chunk's output and concatenate.
"""

from __future__ import annotations

import functools
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from asr_model_tpu.config import BOS_ID, EOS_ID, PAD_ID
from asr_model_tpu.models.generate import greedy_decode_prompted
from asr_model_tpu.models.model import Model
from asr_model_tpu.ops.audio import frame_rate_waveform
from asr_model_tpu.ops.mel import log_mel_spectrogram
from asr_model_tpu.ops.pitch import yin_f0


def chunk_audio(audio: np.ndarray, sample_rate: int = 16000,
                chunk_sec: float = 30.0, overlap_sec: float = 2.0
                ) -> List[np.ndarray]:
    """Fixed-size overlapping chunks (the last one zero-padded)."""
    n = len(audio)
    size = int(chunk_sec * sample_rate)
    stride = size - int(overlap_sec * sample_rate)
    chunks = []
    start = 0
    while start < n:
        c = audio[start:start + size]
        if len(c) < size:
            c = np.pad(c, (0, size - len(c)))
        chunks.append(np.asarray(c, np.float32))
        if start + size >= n:
            break
        start += stride
    return chunks


def _frontend(audio: jnp.ndarray, sample_rate: int, hop: int, mels: int,
              dtype=jnp.float32, pitch_mode: Optional[str] = "yin"):
    """Feature frontend for one chunk; ``dtype`` must match the
    variables' parameter dtype (bf16 inference mode casts params, so
    features follow — mixed conv input/kernel dtypes are an error).
    ``pitch_mode``: "yin" or "dio" run the F0 estimator ON DEVICE
    inside this jitted program (ops/pitch.yin_f0 / ops/dio.
    dio_pitch_track — the latter is the reference's DIO+StoneMask pair,
    parity-tested <0.1 Hz MAE vs the native host implementation);
    None skips pitch (the caller supplies a host track instead)."""
    mel = log_mel_spectrogram(audio, sample_rate, 1024, hop, mels)
    wave = frame_rate_waveform(audio, sample_rate, hop)
    T = mel.shape[-1]
    if pitch_mode is None:
        return mel[None].astype(dtype), None, wave[None].astype(dtype)
    if pitch_mode == "dio":
        from asr_model_tpu.ops.dio import dio_pitch_track
        f0, _ = dio_pitch_track(audio, sample_rate,
                                frame_period=hop / sample_rate * 1000.0)
    else:
        f0, _ = yin_f0(audio, fs=sample_rate,
                       frame_period=hop / sample_rate * 1000.0)
    f0 = jnp.pad(f0[None, :], ((0, 0), (0, max(T - f0.shape[-1], 0))))
    return (mel[None].astype(dtype), f0[None, :, :T].astype(dtype),
            wave[None].astype(dtype))


def _param_dtype(variables):
    return jax.tree.leaves(variables["params"])[0].dtype


@functools.lru_cache(maxsize=8)
def _jit_frontend(sample_rate: int, hop: int, mels: int,
                  dtype_name: str, pitch_mode: Optional[str] = "yin"):
    """One jitted frontend per (sr, hop, mels, dtype, pitch mode) — a
    fresh ``jax.jit(lambda ...)`` per transcribe call would miss jax's
    C++ fast path and re-trace on every call."""
    dtype = jnp.dtype(dtype_name)
    return jax.jit(
        lambda a: _frontend(a, sample_rate, hop, mels, dtype, pitch_mode))


def _host_pitch(chunk: np.ndarray, sample_rate: int, hop: int, T: int,
                dtype) -> jnp.ndarray:
    """Host DIO+StoneMask pitch for one chunk — identical to the
    train-time feature path (ops/pitch.pitch_track)."""
    from asr_model_tpu.ops.pitch import pitch_track

    f0 = pitch_track(np.asarray(chunk), sample_rate, hop,
                     estimator="dio")
    f0 = np.pad(f0, ((0, 0), (0, max(T - f0.shape[-1], 0))))[:, :T]
    return jnp.asarray(f0[None], dtype)


def transcribe_long(model: Model, variables, audio: np.ndarray,
                    tokenizer=None, sample_rate: int = 16000,
                    chunk_sec: float = 30.0, overlap_sec: float = 2.0,
                    max_new_tokens_per_chunk: int = 150,
                    carry_tokens: int = 8, hop: int = 160,
                    use_pitch: bool = True, use_waveform: bool = True,
                    pitch_estimator: str = "dio"):
    """Transcribe arbitrarily long audio.  Returns (ids, text?).

    ``pitch_estimator``: "dio" (ON-DEVICE DIO+StoneMask, ops/dio.py —
    the reference's estimator pair computed inside the frontend jit;
    <0.1 Hz MAE vs the native host track, tests/test_pitch.py),
    "dio_host" (host native C++ — the round-4 default, kept for exact
    train-feature byte parity; ~0.6-2 s of host work per 30 s chunk on
    a 1-core box, overlapped but still the serial floor), or "yin"
    (on-device YIN)."""
    mels = model.param.mels
    chunks = chunk_audio(audio, sample_rate, chunk_sec, overlap_sec)
    host_pitch = pitch_estimator == "dio_host"
    frontend = _jit_frontend(
        sample_rate, hop, mels, str(_param_dtype(variables)),
        pitch_mode=None if (host_pitch or not use_pitch)
        else pitch_estimator)

    # host-DIO prefetch ("dio_host"): pitch depends only on the audio,
    # not on the decode, so a worker thread computes every chunk's F0
    # track while the device decodes earlier chunks (native DIO
    # releases the GIL for the ctypes call; ~0.6 s per 30 s chunk on a
    # 1-core host — serial it dominates the steady-state long-form time)
    pitch_futs = None
    if use_pitch and host_pitch:
        from concurrent.futures import ThreadPoolExecutor

        def dio(c):
            from asr_model_tpu.ops.pitch import pitch_track
            return pitch_track(np.asarray(c), sample_rate, hop,
                               estimator="dio")
        pool = ThreadPoolExecutor(max_workers=1)
        pitch_futs = [pool.submit(dio, c) for c in chunks]
        pool.shutdown(wait=False)

    out_ids: List[int] = []
    prompt = np.zeros((0,), np.int32)
    for k, c in enumerate(chunks):
        mel, pitch, wave = frontend(jnp.asarray(c))
        if pitch_futs is not None:
            T = mel.shape[-1]
            f0 = pitch_futs[k].result()
            f0 = np.pad(f0, ((0, 0), (0, max(T - f0.shape[-1], 0))))[:, :T]
            pitch = jnp.asarray(f0[None], mel.dtype)
        ids = greedy_decode_prompted(
            model, variables, jnp.asarray(prompt[None]),
            spectrogram=mel,
            pitch=pitch if use_pitch else None,
            waveform=wave if use_waveform else None,
            max_new_tokens=max_new_tokens_per_chunk)
        row = np.asarray(ids)[0]
        # strip BOS + prompt echo, stop at EOS/PAD
        gen = row[1 + len(prompt):]
        gen = gen[(gen != PAD_ID) & (gen != EOS_ID)]
        out_ids.extend(int(t) for t in gen)
        prompt = np.asarray(out_ids[-carry_tokens:], np.int32) \
            if carry_tokens else np.zeros((0,), np.int32)

    text = tokenizer.decode(out_ids) if tokenizer is not None else None
    return out_ids, text


def transcribe_long_sp(model: Model, variables, audio: np.ndarray,
                       mesh, tokenizer=None, sample_rate: int = 16000,
                       hop: int = 160, axis: str = "seq",
                       max_new_tokens: int = 600,
                       use_pitch: bool = True, use_waveform: bool = True,
                       pitch_estimator: str = "dio"):
    """Single-pass sequence-parallel long-form transcription
    (SURVEY §5.7 / §2.5 item 4 at scale): instead of chunking, the
    whole utterance is encoded time-sharded over the mesh's ``axis``
    (parallel/seq.py:sp_encode, halo-exact) and decoded with every
    cross-attention distributed (online-softmax over ICI) — one
    utterance spans the slice, no chunk-boundary effects, one decode
    pass.  Feature frames are zero-padded up to a multiple of the axis
    size (the reference attends over pad frames; parity-consistent).

    Returns (ids, text?) like ``transcribe_long``."""
    from asr_model_tpu.models.generate import greedy_decode_sp
    from asr_model_tpu.parallel.seq import encoder_halo

    mels = model.param.mels
    n = mesh.shape[axis]
    host_pitch = pitch_estimator == "dio_host"
    frontend = _jit_frontend(
        sample_rate, hop, mels, str(_param_dtype(variables)),
        pitch_mode=None if (host_pitch or not use_pitch)
        else pitch_estimator)
    audio_np = np.asarray(audio, np.float32)
    mel, pitch, wave = frontend(jnp.asarray(audio_np))
    if use_pitch and host_pitch:
        pitch = _host_pitch(audio_np, sample_rate, hop, mel.shape[-1],
                            mel.dtype)

    T = mel.shape[-1]
    halo = encoder_halo(model.param.layer)
    t_local = max((T + n - 1) // n, halo)
    T_pad = t_local * n

    def pad(x):
        return jnp.pad(x, ((0, 0),) * (x.ndim - 1)
                       + ((0, T_pad - x.shape[-1]),))

    ids = greedy_decode_sp(
        model, variables, mesh, spectrogram=pad(mel),
        pitch=pad(pitch) if use_pitch else None,
        waveform=pad(wave) if use_waveform else None,
        axis=axis, max_new_tokens=max_new_tokens)
    row = np.asarray(ids)[0]
    out = [int(t) for t in row[1:] if t not in (PAD_ID, EOS_ID)]
    text = tokenizer.decode(out) if tokenizer is not None else None
    return out, text
