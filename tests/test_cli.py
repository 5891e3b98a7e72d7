"""CLI end-to-end smoke: synthetic training through the argparse
surface (L6 parity, model.py:721-824)."""

import os

import numpy as np
import pytest

from asr_model_tpu import cli


def test_cli_synthetic_end_to_end(tmp_path):
    variables = cli.main([
        "--synthetic", "4", "--max-steps", "3", "--dims", "16",
        "--head", "2", "--layer", "2", "--mels", "8",
        "--batch-size", "2", "--eval-interval", "2",
        "--warmup-steps", "1", "--save-interval", "2",
        "--no-pitch", "--no-waveform", "--pad-multiple", "64",
        "--log-dir", str(tmp_path), "--checkpoint-dir", str(tmp_path),
    ])
    assert variables["params"] is not None
    saved = [f for f in os.listdir(tmp_path) if f.endswith(".msgpack")]
    assert saved, "expected checkpoints from --save-interval"


def test_cli_streaming_train_to_transcriber_roundtrip(tmp_path):
    """VERDICT r2 #4: the streaming variant end to end through the
    product surface — CLI --streaming train -> checkpoint + persisted
    config.json -> Transcriber.from_checkpoint (no cfg argument)
    rebuilds the streaming model and transcribes."""
    from asr_model_tpu.transcribe import Transcriber

    cli.main([
        "--synthetic", "3", "--max-steps", "2", "--dims", "16",
        "--head", "2", "--layer", "2", "--mels", "8",
        "--streaming", "--save-interval", "2", "--eval-interval", "0",
        "--no-pitch", "--no-waveform", "--pad-multiple", "64",
        "--log-dir", str(tmp_path), "--checkpoint-dir", str(tmp_path),
    ])
    assert os.path.exists(tmp_path / "config.json")
    ckpt = tmp_path / "final_model.msgpack"
    assert ckpt.exists()
    t = Transcriber.from_checkpoint(
        str(ckpt),
        os.path.join(os.path.dirname(cli.__file__), "assets",
                     "tokenizer.json"),
        bf16=False, max_new_tokens=3)
    assert t.model.cfg.streaming is True
    assert t.use_pitch is False and t.use_waveform is False
    sr = 16000
    tone = (0.5 * np.sin(2 * np.pi * 220 * np.arange(sr // 4) / sr)) \
        .astype(np.float32)
    assert isinstance(t(tone), str)


def test_cli_vocab_guard():
    with pytest.raises(SystemExit, match="tokenizer vocab"):
        cli.main(["--synthetic", "2", "--tokens", "1000"])


def test_cli_requires_data_source():
    with pytest.raises(SystemExit, match="synthetic"):
        cli.main(["--max-steps", "1"])
