"""Benchmark: end-to-end ASR throughput on the available accelerator.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric (BASELINE.md): RTFx = audio-seconds processed per
wall-second per chip for the full transcription path — on-device log-mel
frontend + AudioEncoder over all three modality slots + greedy decode
(fixed token budget).  The reference publishes no numbers
(BASELINE.md: "published: none"), so ``vs_baseline`` is measured
against a recorded reference-implementation throughput when
BASELINE_MEASURED.json exists, else reported as 0.0 (not comparable).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from asr_model_tpu.config import Dimensions, ModelConfig
    from asr_model_tpu.models.generate import greedy_decode
    from asr_model_tpu.models.model import Model
    from asr_model_tpu.ops.audio import frame_rate_waveform
    from asr_model_tpu.ops.mel import log_mel_spectrogram
    from asr_model_tpu.ops.pitch import yin_f0

    sr, hop = 16000, 160
    utt_sec = 10.0
    batch = 8
    max_new_tokens = 32

    rng = np.random.RandomState(0)
    t = np.arange(int(sr * utt_sec)) / sr
    audio_np = np.stack([
        (np.sin(2 * np.pi * (150 + 30 * i) * t)
         + 0.3 * np.sin(2 * np.pi * 2 * (150 + 30 * i) * t)
         + 0.01 * rng.randn(len(t))).astype(np.float32)
        for i in range(batch)])
    audio = jnp.asarray(audio_np)

    dims = Dimensions()          # flagship: 40k vocab, 512 dims, 4 heads
    model = Model(param=dims, cfg=ModelConfig(dims=dims))

    @jax.jit
    def frontend(audio):
        mel = jax.vmap(lambda a: log_mel_spectrogram(a, sr, 1024, hop,
                                                     dims.mels))(audio)
        wave = jax.vmap(lambda a: frame_rate_waveform(a, sr, hop))(audio)
        f0 = jax.vmap(lambda a: yin_f0(a, fs=sr, frame_period=10.0)[0])(
            audio)[:, None, :]
        # pad/trim pitch to the mel frame count
        T = mel.shape[-1]
        f0 = jnp.pad(f0, ((0, 0), (0, 0), (0, max(T - f0.shape[-1], 0))))
        return mel, f0[..., :T], wave

    mel, pitch, wave = jax.block_until_ready(frontend(audio))

    variables = model.init({"params": jax.random.key(0)},
                           jnp.ones((batch, 4), jnp.int32),
                           spectrogram=mel, pitch=pitch, waveform=wave)
    from asr_model_tpu.models.model import cast_variables
    variables = cast_variables(variables)     # bf16 inference mode

    def transcribe(audio):
        mel, pitch, wave = frontend(audio)    # frontend stays f32
        cast = lambda t: t.astype(jnp.bfloat16)
        # suppress_eos forces the full token budget: random-init params
        # would otherwise emit EOS immediately and undercount the decode
        return greedy_decode(model, variables, spectrogram=cast(mel),
                             pitch=cast(pitch), waveform=cast(wave),
                             max_new_tokens=max_new_tokens,
                             suppress_eos=True)

    # warm-up/compile; np.asarray forces a host fetch — on tunneled TPU
    # runtimes block_until_ready does not actually synchronize
    ids = np.asarray(transcribe(audio))

    # async-enqueue n_iter dispatches, fetch only the last result: one
    # tunnel round-trip (~28 ms here) amortized over the batch
    n_iter = 10
    start = time.perf_counter()
    for _ in range(n_iter):
        ids = transcribe(audio)
    np.asarray(ids)
    elapsed = (time.perf_counter() - start) / n_iter

    audio_seconds = batch * utt_sec
    rtfx = audio_seconds / elapsed

    vs_baseline = 0.0
    base_path = os.path.join(os.path.dirname(__file__),
                             "BASELINE_MEASURED.json")
    if os.path.exists(base_path):
        with open(base_path) as f:
            base = json.load(f)
        ref = base.get("rtfx")
        if ref:
            vs_baseline = rtfx / ref

    print(json.dumps({
        "metric": "transcription RTFx (audio-sec/sec/chip, frontend+encode+greedy-decode)",
        "value": round(rtfx, 3),
        "unit": "x realtime",
        "vs_baseline": round(vs_baseline, 3),
    }))


if __name__ == "__main__":
    main()
