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


# ---------------------------------------------------------------- FLAC

def _flac_tools():
    import importlib.util
    import os
    path = os.path.join(os.path.dirname(__file__), "..", "tools",
                        "flac_encoder.py")
    spec = importlib.util.spec_from_file_location("flac_encoder", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _tone_pcm(n=16000, seed=0):
    rng = np.random.RandomState(seed)
    t = np.arange(n) / 16000.0
    sig = 0.5 * np.sin(2 * np.pi * 220 * t) + 0.05 * rng.randn(n)
    return np.clip(sig * 32767, -32768, 32767).astype(np.int16)


@pytest.mark.parametrize("kw", [
    dict(),                                  # per-block auto pick
    dict(subframe="verbatim"),
    dict(subframe="constant"),
    dict(subframe="fixed0"),
    dict(subframe="fixed1"),
    dict(subframe="fixed2"),
    dict(subframe="lpc2"),
    dict(subframe="lpc8"),
    dict(subframe="lpc12", partition_order=2),
    dict(partition_order=3),
    dict(force_escape=True),
    dict(block_size=256),
    dict(block_size=1000),                   # non-power-of-two blocks
    dict(wasted_bits=3),
])
def test_flac_roundtrip_bit_exact(tmp_path, kw):
    """Native C++ decoder reproduces the source PCM bit-exactly across
    subframe types, Rice partitions, escapes, LPC and wasted bits (the
    encoder is an independent implementation of RFC 9639; CRC-8/16 are
    verified by the decoder, so bit-level disagreement fails loudly)."""
    from asr_model_tpu import native
    if native.build("flac") is None:
        pytest.skip("g++ unavailable")
    enc = _flac_tools()
    pcm = _tone_pcm()
    if kw.get("subframe") == "constant":
        pcm = np.full(5000, -321, np.int16)
    if kw.get("wasted_bits"):
        pcm = pcm & ~((1 << kw["wasted_bits"]) - 1)
    path = str(tmp_path / "t.flac")
    enc.write_flac(path, pcm, 16000, **kw)
    data, sr = native.read_flac(path)
    assert sr == 16000
    got = np.round(data * 32768).astype(np.int64)
    np.testing.assert_array_equal(got, pcm.astype(np.int64))


@pytest.mark.parametrize("mode", ["independent", "left_side",
                                  "right_side", "mid_side"])
def test_flac_stereo_decorrelation(tmp_path, mode):
    from asr_model_tpu import native
    if native.build("flac") is None:
        pytest.skip("g++ unavailable")
    enc = _flac_tools()
    left = _tone_pcm(8000, seed=1)
    right = (left // 2).astype(np.int16)
    st = np.stack([left, right], 1)
    path = str(tmp_path / "st.flac")
    enc.write_flac(path, st, 16000, stereo_mode=mode)
    data, sr = native.read_flac(path)
    got = np.round(data * 32768).astype(np.int64)
    assert got.shape == (2, 8000)
    np.testing.assert_array_equal(got.T, st.astype(np.int64))


def test_load_wave_flac_equals_wav_twin(tmp_path):
    """audio_io.load_wave decodes a FLAC fixture bit-equal to its WAV
    twin — the LibriSpeech L0->L1 path works without soundfile
    (VERDICT r1 item 5; corpus is FLAC, librispeech_asr.py:104)."""
    import wave as wave_mod

    from asr_model_tpu import native
    from asr_model_tpu.data.audio_io import load_wave
    if native.build("flac") is None:
        pytest.skip("g++ unavailable")
    enc = _flac_tools()
    pcm = _tone_pcm(12000, seed=2)

    fpath = str(tmp_path / "utt.flac")
    enc.write_flac(fpath, pcm, 16000)
    wpath = str(tmp_path / "utt.wav")
    with wave_mod.open(wpath, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(pcm.tobytes())

    wf, sr_f = load_wave(fpath)
    ww, sr_w = load_wave(wpath)
    assert sr_f == sr_w == 16000
    np.testing.assert_array_equal(wf, ww)


def test_native_flac_rejects_garbage_without_crashing():
    """Malformed input must fail cleanly (error code / RuntimeError),
    never crash the process — the native decoder guards the L0 path."""
    import ctypes

    lib = native.load("flac")
    assert lib is not None
    rng = np.random.RandomState(0)
    cases = [
        b"",                                     # empty
        b"fLaC",                                 # magic only
        b"RIFF" + b"\x00" * 64,                  # wrong container
        rng.bytes(256),                          # random noise
        b"fLaC" + rng.bytes(512),                # magic + noise
    ]
    for raw in cases:
        sr = ctypes.c_int()
        ch = ctypes.c_int()
        bps = ctypes.c_int()
        tot = ctypes.c_longlong()
        rc = lib.flac_info(raw, len(raw), ctypes.byref(sr),
                           ctypes.byref(ch), ctypes.byref(bps),
                           ctypes.byref(tot))
        if rc == 0:
            out = np.empty(1 << 16, dtype=np.int32)
            got = lib.flac_decode(
                raw, len(raw),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                out.size)
            assert got <= 0, "garbage stream decoded frames"


def test_native_flac_truncated_stream(tmp_path):
    """A valid header with a truncated frame section must not crash
    (and must not report success past the available data)."""
    from tools.flac_encoder import encode_flac

    sr = 16000
    x = (np.sin(2 * np.pi * 220 * np.arange(sr // 4) / sr)
         * 20000).astype(np.int16)
    raw = encode_flac(x, sr)
    import ctypes
    lib = native.load("flac")
    sr_ = ctypes.c_int()
    ch = ctypes.c_int()
    bps_ = ctypes.c_int()
    tot = ctypes.c_longlong()
    for cut in (len(raw) // 2, len(raw) - 7, 30):
        trunc = raw[:cut]
        rc = lib.flac_info(trunc, len(trunc), ctypes.byref(sr_),
                           ctypes.byref(ch), ctypes.byref(bps_),
                           ctypes.byref(tot))
        if rc != 0:
            continue
        out = np.empty(max(int(tot.value), 1) * 2 + 65536, np.int32)
        lib.flac_decode(trunc, len(trunc),
                        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                        out.size)        # must simply not crash


def test_native_bpe_malformed_utf8_no_crash():
    """Truncated multi-byte UTF-8 at end of input must not read out of
    bounds (regression: ADVICE r1, utf8_split clamp)."""
    from asr_model_tpu.data.tokenizer import setup_tokenizer

    tok = setup_tokenizer(os.path.join(
        os.path.dirname(__file__), "..", "asr_model_tpu", "assets",
        "tokenizer.json"))
    for bad in (b"\xe4\xb8", b"hello \xf0\x9f\x98", b"\xc3"):
        s = bad.decode("utf-8", errors="surrogateescape")
        try:
            ids = tok.encode(s)
            assert isinstance(ids, list)
        except (UnicodeError, ValueError):
            pass                          # clean rejection is fine
