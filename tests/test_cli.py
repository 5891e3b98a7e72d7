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


def test_cli_vocab_guard():
    with pytest.raises(SystemExit, match="tokenizer vocab"):
        cli.main(["--synthetic", "2", "--tokens", "1000"])


def test_cli_requires_data_source():
    with pytest.raises(SystemExit, match="synthetic"):
        cli.main(["--max-steps", "1"])
