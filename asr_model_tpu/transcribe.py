"""High-level transcription API.

The reference has no serving surface (SURVEY §1: "Not present at any
layer: serving/API") — this is the deliberate capability addition: a
warm-compiled end-to-end transcriber covering BASELINE configs #1
(single-utterance greedy) and #4 (long-form chunked).

    t = Transcriber.from_checkpoint(ckpt, tokenizer_path)
    text = t(audio)                      # np.ndarray or wav path
    text = t.transcribe_long(audio)     # 30s+ audio
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Union

import numpy as np

import jax
import jax.numpy as jnp

from asr_model_tpu.config import Config, Dimensions, ModelConfig
from asr_model_tpu.data.audio_io import load_wave
from asr_model_tpu.data.tokenizer import Tokenizer, setup_tokenizer
from asr_model_tpu.models.generate import greedy_decode
from asr_model_tpu.models.longform import transcribe_long
from asr_model_tpu.models.model import Model, cast_variables
from asr_model_tpu.ops.audio import frame_rate_waveform
from asr_model_tpu.ops.mel import log_mel_spectrogram
from asr_model_tpu.ops.pitch import yin_f0


class Transcriber:
    def __init__(self, model: Model, variables, tokenizer: Tokenizer,
                 sample_rate: int = 16000, hop: int = 160,
                 use_pitch: bool = True, use_waveform: bool = True,
                 bf16: bool = True, max_new_tokens: int = 150,
                 beam_size: int = 1, length_penalty: float = 1.0,
                 pitch_estimator: str = "dio"):
        """``beam_size > 1`` routes transcription through length-
        normalized beam search (models/beam.py) — a capability the
        reference lacks (SURVEY §1).

        ``pitch_estimator`` must match the training features'
        ``DataConfig.pitch_estimator`` (from_checkpoint wires it
        automatically): "dio" computes DIO+StoneMask ON DEVICE inside
        the jitted frontend (ops/dio.py — <0.1 Hz MAE vs the native
        host track, tests/test_pitch.py); "dio_host" runs the native
        C++ exactly like data/features.py (byte-parity with training
        features, at ~0.6 s host time per 10 s of audio on a 1-core
        box); "yin" is the on-device YIN estimator."""
        self.model = model
        self.variables = cast_variables(variables) if bf16 else variables
        self.dtype = jnp.bfloat16 if bf16 else jnp.float32
        self.tokenizer = tokenizer
        self.sample_rate = sample_rate
        self.hop = hop
        self.use_pitch = use_pitch
        self.use_waveform = use_waveform
        self.max_new_tokens = max_new_tokens
        self.beam_size = int(beam_size)
        self.length_penalty = float(length_penalty)
        if pitch_estimator not in ("dio", "dio_host", "yin"):
            raise ValueError(f"unknown pitch estimator {pitch_estimator!r}")
        self.pitch_estimator = pitch_estimator
        self._frontend = jax.jit(self._features)
        self._batch_frontend = jax.jit(jax.vmap(self._features_row))

    @classmethod
    def from_checkpoint(cls, ckpt_path: str, tokenizer_path: str,
                        cfg: Optional[Config] = None, **kw):
        """``cfg=None`` loads the ``config.json`` the training loop
        writes next to its checkpoints (train/loop.py), so model
        variants (streaming, chained blocks, modality flags) restore
        without re-stating them; a bare checkpoint with no config.json
        falls back to the default ``Config()``."""
        from asr_model_tpu.train.checkpoint import restore_checkpoint
        if cfg is None:
            cfg_path = os.path.join(os.path.dirname(os.path.abspath(
                ckpt_path)), "config.json")
            if os.path.exists(cfg_path):
                with open(cfg_path) as f:
                    cfg = Config.from_json(f.read())
        cfg = cfg or Config()
        model = Model(param=cfg.model.dims, cfg=cfg.model)
        tok = setup_tokenizer(tokenizer_path)
        # Init a skeleton to get the treedef, then restore into it.  The
        # skeleton must create every parameter the checkpoint holds, so
        # the dummy inputs follow cfg.data's modality flags (a
        # spectrogram-only skeleton would be missing the mono conv stem
        # and pitch-token embedding params of a default-config training
        # run and flax from_bytes would fail on the structure mismatch).
        mels = cfg.model.dims.mels
        dummy = jnp.zeros((1, mels, 16), jnp.float32)
        mono = jnp.zeros((1, 1, 16), jnp.float32)
        init_kw = {"spectrogram": dummy}
        if cfg.data.pitch:
            init_kw["pitch"] = mono
        if cfg.data.waveform:
            init_kw["waveform"] = mono
        if cfg.data.pitch_tokens:
            init_kw["pitch_tokens"] = jnp.zeros((1, 3), jnp.float32)
        variables = jax.jit(lambda r: model.init(
            {"params": r}, jnp.ones((1, 2), jnp.int32),
            **init_kw))(jax.random.key(0))
        kw.setdefault("use_pitch", cfg.data.pitch)
        kw.setdefault("use_waveform", cfg.data.waveform)
        kw.setdefault("pitch_estimator", cfg.data.pitch_estimator)
        from asr_model_tpu.train.loop import make_optimizer
        tx, _ = make_optimizer(cfg, variables["params"])
        target = {"params": variables["params"],
                  "opt_state": tx.init(variables["params"]),
                  "batch_stats": variables.get("batch_stats", {}),
                  "step": 0}
        restored = restore_checkpoint(ckpt_path, target)
        return cls(model, {"params": restored["params"],
                           "batch_stats": restored["batch_stats"]},
                   tok, **kw)

    def _features_row(self, audio: jnp.ndarray):
        """Features for ONE (L,) waveform, no batch dim: spectrogram
        (mels, T), pitch/waveform (1, T).  vmapped by the batch
        frontend; wrapped by the single-utterance one."""
        mels = self.model.param.mels
        mel = log_mel_spectrogram(audio, self.sample_rate, 1024,
                                  self.hop, mels)
        out = {"spectrogram": mel.astype(self.dtype)}
        T = mel.shape[-1]
        if self.use_pitch and self.pitch_estimator in ("yin", "dio"):
            if self.pitch_estimator == "dio":
                from asr_model_tpu.ops.dio import dio_pitch_track
                f0, _ = dio_pitch_track(
                    audio, self.sample_rate,
                    frame_period=self.hop / self.sample_rate * 1000)
            else:
                f0, _ = yin_f0(
                    audio, fs=self.sample_rate,
                    frame_period=self.hop / self.sample_rate * 1000)
            f0 = jnp.pad(f0[None, :],
                         ((0, 0), (0, max(T - f0.shape[-1], 0))))
            out["pitch"] = f0[:, :T].astype(self.dtype)
        if self.use_waveform:
            w = frame_rate_waveform(audio, self.sample_rate, self.hop)
            out["waveform"] = w.astype(self.dtype)
        return out

    def _features(self, audio: jnp.ndarray):
        return jax.tree.map(lambda x: x[None], self._features_row(audio))

    def _add_host_pitch(self, feats: dict, wav: np.ndarray) -> dict:
        """"dio_host": DIO pitch runs on the host (native C++), exactly
        the train-time path (features.py -> ops/pitch.pitch_track)."""
        if not self.use_pitch or self.pitch_estimator != "dio_host":
            return feats
        from asr_model_tpu.ops.pitch import pitch_track
        T = feats["spectrogram"].shape[-1]
        f0 = pitch_track(wav, self.sample_rate, self.hop,
                         estimator="dio")          # (1, T0)
        f0 = np.pad(f0, ((0, 0), (0, max(T - f0.shape[-1], 0))))[:, :T]
        feats = dict(feats)
        feats["pitch"] = jnp.asarray(f0[None], self.dtype)
        return feats

    def _load(self, audio: Union[str, np.ndarray]) -> np.ndarray:
        if isinstance(audio, str):
            wav, sr = load_wave(audio, self.sample_rate)
            return np.asarray(wav, np.float32)
        return np.asarray(audio, np.float32)

    def __call__(self, audio: Union[str, np.ndarray],
                 max_new_tokens: Optional[int] = None,
                 beam_size: Optional[int] = None) -> str:
        """Single-utterance transcription (BASELINE config #1): greedy,
        or beam search when ``beam_size`` (here or on the ctor) > 1."""
        wav = self._load(audio)
        feats = self._add_host_pitch(self._frontend(jnp.asarray(wav)), wav)
        k = self.beam_size if beam_size is None else int(beam_size)
        if k > 1:
            from asr_model_tpu.models.beam import beam_search
            ids, _scores = beam_search(
                self.model, self.variables,
                spectrogram=feats.get("spectrogram"),
                pitch=feats.get("pitch"),
                waveform=feats.get("waveform"), beam_size=k,
                max_new_tokens=max_new_tokens or self.max_new_tokens,
                length_penalty=self.length_penalty)
        elif self.model.cfg.streaming and not self.model.cfg.chained_blocks:
            # streaming models take the O(1)-per-token incremental
            # decode (token-exact vs the buffer path,
            # tests/test_stream_decode.py)
            from asr_model_tpu.models.generate import greedy_decode_stream
            ids = greedy_decode_stream(self.model, self.variables,
                                       spectrogram=feats.get("spectrogram"),
                                       pitch=feats.get("pitch"),
                                       waveform=feats.get("waveform"),
                                       max_new_tokens=max_new_tokens
                                       or self.max_new_tokens)
        else:
            ids = greedy_decode(self.model, self.variables,
                                spectrogram=feats.get("spectrogram"),
                                pitch=feats.get("pitch"),
                                waveform=feats.get("waveform"),
                                max_new_tokens=max_new_tokens
                                or self.max_new_tokens)
        return self.tokenizer.decode(list(np.asarray(ids)[0]))

    def transcribe_batch(self, audios: Sequence[Union[str, np.ndarray]],
                         max_new_tokens: Optional[int] = None) -> list:
        """Batch transcription — the max-throughput serving surface.
        Waveforms are zero-padded to the batch max (the reference
        attends over pad frames; parity-consistent), features run as
        ONE vmapped jitted frontend program, and the decode is a single
        batched program: streaming checkpoints take the O(1)-per-token
        incremental decode (the framework's best throughput AND
        real-WER path, docs/BENCH_NOTES.md), parity checkpoints the
        prefix-bucket buffer decode."""
        wavs = [self._load(a) for a in audios]
        L = max(len(w) for w in wavs)
        stacked = np.stack([np.pad(w, (0, L - len(w))) for w in wavs])
        feats = self._batch_frontend(jnp.asarray(stacked))
        if self.use_pitch and self.pitch_estimator == "dio_host":
            T = feats["spectrogram"].shape[-1]
            from asr_model_tpu.ops.pitch import pitch_track
            f0 = np.stack([pitch_track(w if len(w) == L
                                       else np.pad(w, (0, L - len(w))),
                                       self.sample_rate, self.hop,
                                       estimator="dio_host")
                           for w in wavs])          # (B, 1, T0)
            f0 = np.pad(f0, ((0, 0), (0, 0),
                             (0, max(T - f0.shape[-1], 0))))[..., :T]
            feats = dict(feats, pitch=jnp.asarray(f0, self.dtype))
        mnt = max_new_tokens or self.max_new_tokens
        if self.model.cfg.streaming and not self.model.cfg.chained_blocks:
            from asr_model_tpu.models.generate import greedy_decode_stream
            ids = greedy_decode_stream(self.model, self.variables,
                                       spectrogram=feats.get("spectrogram"),
                                       pitch=feats.get("pitch"),
                                       waveform=feats.get("waveform"),
                                       max_new_tokens=mnt)
        else:
            ids = greedy_decode(self.model, self.variables,
                                spectrogram=feats.get("spectrogram"),
                                pitch=feats.get("pitch"),
                                waveform=feats.get("waveform"),
                                max_new_tokens=mnt)
        return [self.tokenizer.decode(list(row))
                for row in np.asarray(ids)]

    def transcribe_long(self, audio: Union[str, np.ndarray],
                        chunk_sec: float = 30.0, **kw) -> str:
        """Chunked long-form transcription (BASELINE config #4)."""
        wav = self._load(audio)
        _, text = transcribe_long(self.model, self.variables, wav,
                                  tokenizer=self.tokenizer,
                                  sample_rate=self.sample_rate,
                                  chunk_sec=chunk_sec,
                                  use_pitch=self.use_pitch,
                                  use_waveform=self.use_waveform,
                                  pitch_estimator=self.pitch_estimator,
                                  **kw)
        return text

    def encode_only(self, audio: Union[str, np.ndarray]):
        """Batched mel + encoder-only forward (BASELINE config #2)."""
        wav = self._load(audio)
        feats = self._add_host_pitch(self._frontend(jnp.asarray(wav)), wav)
        xa = {"a": feats.get("pitch", feats["spectrogram"]),
              "b": feats["spectrogram"],
              "c": feats.get("waveform", feats["spectrogram"])}
        return self.model.apply(self.variables, xa, method=Model.encode)
