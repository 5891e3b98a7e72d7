"""Native (C++) runtime components.

``build()`` compiles the shared libraries with g++ (cached; no-op when
up to date).  Components degrade gracefully to the pure-Python paths
when the toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import Optional

logger = logging.getLogger(__name__)

_DIR = os.path.dirname(__file__)
_SOURCES = {
    "bpe": ("bpe.cpp", "libbpe.so"),
    "wer": ("wer.cpp", "libwer.so"),
    "flac": ("flac.cpp", "libflac_native.so"),
    "world": ("world.cpp", "libworld_native.so"),
}
_handles = {}


def lib_path(name: str) -> str:
    return os.path.join(_DIR, _SOURCES[name][1])


def build(name: str = "bpe", force: bool = False) -> Optional[str]:
    """Compile one native component; returns the .so path or None."""
    src, out = _SOURCES[name]
    src_path = os.path.join(_DIR, src)
    out_path = os.path.join(_DIR, out)
    if not force and os.path.exists(out_path) \
            and os.path.getmtime(out_path) >= os.path.getmtime(src_path):
        return out_path
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
           src_path, "-o", out_path]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
        return out_path
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        logger.warning("native build of %s failed: %s", name, e)
        return None


def load(name: str = "bpe", auto_build: bool = True
         ) -> Optional[ctypes.CDLL]:
    """dlopen a native component, building it first if needed."""
    if name in _handles:
        return _handles[name]
    path = lib_path(name)
    if not os.path.exists(path) and auto_build:
        path = build(name)
    if not path or not os.path.exists(path):
        _handles[name] = None
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError as e:          # pragma: no cover
        logger.warning("failed to load %s: %s", path, e)
        _handles[name] = None
        return None
    if name == "wer":
        lib.wer_levenshtein.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int]
        lib.wer_levenshtein.restype = ctypes.c_int
    if name == "flac":
        lib.flac_info.argtypes = [
            ctypes.c_char_p, ctypes.c_longlong,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_longlong)]
        lib.flac_info.restype = ctypes.c_int
        lib.flac_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_longlong,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_longlong]
        lib.flac_decode.restype = ctypes.c_longlong
    if name == "world":
        lib.world_dio.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_longlong,
            ctypes.c_int, ctypes.c_double, ctypes.c_double,
            ctypes.c_double, ctypes.c_double, ctypes.c_double,
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double)]
        lib.world_dio.restype = ctypes.c_longlong
        lib.world_stonemask.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_longlong,
            ctypes.c_int, ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double), ctypes.c_longlong,
            ctypes.POINTER(ctypes.c_double)]
        lib.world_stonemask.restype = ctypes.c_int
        for fname in ("world_cheaptrick", "world_d4c"):
            fn = getattr(lib, fname)
            fn.argtypes = [
                ctypes.POINTER(ctypes.c_double), ctypes.c_longlong,
                ctypes.c_int, ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_double), ctypes.c_longlong,
                ctypes.c_int, ctypes.c_double,
                ctypes.POINTER(ctypes.c_double)]
            fn.restype = ctypes.c_int
    if name == "bpe":
        lib.bpe_new.restype = ctypes.c_void_p
        lib.bpe_free.argtypes = [ctypes.c_void_p]
        lib.bpe_add_token.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                      ctypes.c_int]
        lib.bpe_add_merge.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                      ctypes.c_char_p, ctypes.c_int]
        lib.bpe_encode_word.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int), ctypes.c_int]
        lib.bpe_encode_word.restype = ctypes.c_int
    _handles[name] = lib
    return lib


def read_flac(path: str):
    """Decode a FLAC file with the native decoder.

    Returns (data, sample_rate): data float32 in [-1, 1), shape
    (samples,) mono or (channels, samples).  Raises RuntimeError when
    the native decoder is unavailable or the stream is malformed."""
    import numpy as np

    lib = load("flac")
    if lib is None:
        raise RuntimeError("native FLAC decoder unavailable "
                           "(g++ build failed)")
    with open(path, "rb") as f:
        raw = f.read()
    sr = ctypes.c_int()
    ch = ctypes.c_int()
    bps = ctypes.c_int()
    total = ctypes.c_longlong()
    rc = lib.flac_info(raw, len(raw), ctypes.byref(sr), ctypes.byref(ch),
                       ctypes.byref(bps), ctypes.byref(total))
    if rc != 0:
        raise RuntimeError(f"not a FLAC stream: {path}")
    # total_samples may be 0 (unknown): over-allocate from the byte size
    n = int(total.value) or (len(raw) * 8 // max(bps.value, 1) + 65536)
    cap = n * ch.value
    out = np.empty(cap, dtype=np.int32)
    got = lib.flac_decode(raw, len(raw),
                          out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                          cap)
    if got < 0:
        raise RuntimeError(f"FLAC decode failed ({got}) for {path}")
    data = (out[: got * ch.value].astype(np.float32)
            / float(1 << (bps.value - 1)))
    if ch.value > 1:
        data = data.reshape(-1, ch.value).T
    return data, int(sr.value)


def world_dio(x, fs: int, frame_period: float = 10.0,
              f0_floor: float = 71.0, f0_ceil: float = 800.0,
              channels_in_octave: float = 2.0,
              allowed_range: float = 0.1):
    """Native DIO F0 estimation (pyworld.dio-shaped).

    Returns (f0, t) float64 arrays of length 1 + floor(1000*n/fs/fp).
    Raises RuntimeError when the native library is unavailable."""
    import numpy as np

    lib = load("world")
    if lib is None:
        raise RuntimeError("native WORLD library unavailable "
                           "(g++ build failed)")
    x = np.ascontiguousarray(np.asarray(x, dtype=np.float64).reshape(-1))
    n = x.shape[0]
    nf = int(1000.0 * n / fs / frame_period) + 1
    f0 = np.empty(nf, dtype=np.float64)
    t = np.empty(nf, dtype=np.float64)
    got = lib.world_dio(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n, fs,
        frame_period, f0_floor, f0_ceil, channels_in_octave,
        allowed_range,
        f0.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        t.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    if got < 0:
        raise RuntimeError("world_dio failed")
    return f0[:got], t[:got]


def _world_spectral(fname: str, x, f0, t, fs: int, fft_size: int,
                    knob: float):
    import numpy as np

    lib = load("world")
    if lib is None:
        raise RuntimeError("native WORLD library unavailable "
                           "(g++ build failed)")
    x = np.ascontiguousarray(np.asarray(x, dtype=np.float64).reshape(-1))
    f0 = np.ascontiguousarray(np.asarray(f0, dtype=np.float64))
    t = np.ascontiguousarray(np.asarray(t, dtype=np.float64))
    out = np.empty((f0.shape[0], fft_size // 2 + 1), dtype=np.float64)
    rc = getattr(lib, fname)(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), x.shape[0], fs,
        f0.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        t.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), f0.shape[0],
        fft_size, knob,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    if rc != 0:
        raise RuntimeError(f"{fname} failed")
    return out


def world_cheaptrick(x, f0, t, fs: int, fft_size: int = 256,
                     q1: float = -0.15):
    """Native CheapTrick spectral envelope (pyworld.cheaptrick-shaped).

    Returns (n_frames, fft_size//2 + 1) float64 power envelope."""
    return _world_spectral("world_cheaptrick", x, f0, t, fs, fft_size, q1)


def world_d4c(x, f0, t, fs: int, fft_size: int = 256,
              threshold: float = 0.85):
    """Native D4C band aperiodicity (pyworld.d4c-shaped).

    Returns (n_frames, fft_size//2 + 1) float64 aperiodicity in
    [0, 1]."""
    return _world_spectral("world_d4c", x, f0, t, fs, fft_size, threshold)


def world_stonemask(x, f0, t, fs: int):
    """Native StoneMask refinement (pyworld.stonemask-shaped)."""
    import numpy as np

    lib = load("world")
    if lib is None:
        raise RuntimeError("native WORLD library unavailable "
                           "(g++ build failed)")
    x = np.ascontiguousarray(np.asarray(x, dtype=np.float64).reshape(-1))
    f0 = np.ascontiguousarray(np.asarray(f0, dtype=np.float64))
    t = np.ascontiguousarray(np.asarray(t, dtype=np.float64))
    out = np.empty_like(f0)
    rc = lib.world_stonemask(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), x.shape[0], fs,
        f0.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        t.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), f0.shape[0],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    if rc != 0:
        raise RuntimeError("world_stonemask failed")
    return out
