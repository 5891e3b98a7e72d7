"""Native C++ BPE engine: build, load, and bit-parity vs the Python
merge loop (which is itself golden-tested against the HF crate)."""

import os

import numpy as np
import pytest

from asr_model_tpu import native
from asr_model_tpu.data.tokenizer import setup_tokenizer

ASSET = os.path.join(os.path.dirname(__file__), "..", "asr_model_tpu",
                     "assets", "tokenizer.json")

SAMPLES = [
    "MISTER QUILTER IS THE APOSTLE OF THE MIDDLE CLASSES",
    "the quick brown fox jumps over the lazy dog 42 times!",
    "unicode café naïve — ½",
    "",
]


@pytest.fixture(scope="module")
def libs():
    path = native.build("bpe")
    if path is None:
        pytest.skip("g++ unavailable")
    return path


def test_native_builds(libs):
    assert os.path.exists(libs)


@pytest.mark.parametrize("text", SAMPLES)
def test_native_matches_python(libs, text):
    py_tok = setup_tokenizer(ASSET)
    nat_tok = setup_tokenizer(ASSET)
    assert nat_tok.enable_native()
    assert nat_tok.encode(text) == py_tok.encode(text)


def test_native_throughput_sane(libs):
    import time
    tok = setup_tokenizer(ASSET)
    assert tok.enable_native()
    text = ("THE BIRCH CANOE SLID ON THE SMOOTH PLANKS "
            "GLUE THE SHEET TO THE DARK BLUE BACKGROUND ") * 20
    tok.encode(text)  # warm cache
    t0 = time.perf_counter()
    for _ in range(50):
        tok.encode(text)
    dt = time.perf_counter() - t0
    # ~80k chars in well under a second
    assert dt < 2.0


def test_native_wer_matches_python():
    from asr_model_tpu import native
    from asr_model_tpu.train import metrics
    if native.build("wer") is None:
        pytest.skip("g++ unavailable")
    cases = [
        (["a", "b", "c"], ["a", "x", "c"]),          # 1 sub
        (["hello", "world"], ["hello", "there", "world"]),  # 1 ins
        ([], ["a"]),
        (["a"] * 50, ["a"] * 49 + ["b"]),
        (["the", "quick", "brown", "fox"], []),
    ]
    for ref, hyp in cases:
        # force-compare both paths
        native_d = metrics.levenshtein(ref, hyp)
        # python path: bypass the native lib
        import unittest.mock as mock
        with mock.patch.object(metrics, "_native_wer", lambda: None):
            py_d = metrics.levenshtein(ref, hyp)
        assert native_d == py_d, (ref, hyp, native_d, py_d)
