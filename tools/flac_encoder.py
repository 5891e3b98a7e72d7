"""Minimal FLAC *encoder* — test-fixture generator only.

No FLAC tooling exists in this image (no flac CLI, no ffmpeg, no
libsndfile), so the decoder tests (tests/test_native.py) generate their
own spec-compliant streams with this module and check the native C++
decoder (asr_model_tpu/native/flac.cpp) reproduces the source PCM
bit-exactly.  The two implementations are written independently against
RFC 9639 — the encoder writes CRC-8/CRC-16 which the decoder verifies,
so any bit-level disagreement fails loudly rather than cancelling out.

Supports: 16-bit PCM, mono/stereo (independent, left/side, right/side,
mid/side), CONSTANT / VERBATIM / FIXED(0-2) subframes chosen per block,
partitioned Rice residuals with 4-bit parameters and the escape-code
raw path, arbitrary block sizes (written with the 16-bit end-of-header
form).
"""

from __future__ import annotations

import numpy as np


class BitWriter:
    def __init__(self):
        self.bytes = bytearray()
        self.cur = 0
        self.nbits = 0

    def write(self, value: int, bits: int):
        for i in range(bits - 1, -1, -1):
            self.cur = (self.cur << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.bytes.append(self.cur)
                self.cur = 0
                self.nbits = 0

    def write_signed(self, value: int, bits: int):
        self.write(value & ((1 << bits) - 1), bits)

    def write_unary(self, q: int):
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)          # q zeros then a one

    def align(self):
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def data(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.bytes)


def _crc8(data: bytes) -> int:
    c = 0
    for b in data:
        c ^= b
        for _ in range(8):
            c = ((c << 1) ^ 0x07) & 0xFF if c & 0x80 else (c << 1) & 0xFF
    return c


def _crc16(data: bytes) -> int:
    c = 0
    for b in data:
        c ^= b << 8
        for _ in range(8):
            c = ((c << 1) ^ 0x8005) & 0xFFFF if c & 0x8000 \
                else (c << 1) & 0xFFFF
    return c


def _utf8_number(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    # payload capacity: 2 bytes 11 bits, 3:16, 4:21, 5:26, 6:31, 7:36
    for nbytes, cap in ((2, 11), (3, 16), (4, 21), (5, 26), (6, 31),
                        (7, 36)):
        if n < (1 << cap):
            break
    payload_bits = 6 * (nbytes - 1)
    if nbytes == 7:
        lead = 0xFE
    else:
        lead = ((0xFF << (8 - nbytes)) & 0xFF) | (n >> payload_bits)
    out = [lead]
    for i in range(nbytes - 2, -1, -1):
        out.append(0x80 | ((n >> (6 * i)) & 0x3F))
    return bytes(out)


def _rice_param(res: np.ndarray) -> int:
    if len(res) == 0:
        return 0
    mean = float(np.mean(np.abs(res.astype(np.float64)))) + 1e-9
    k = max(0, int(np.ceil(np.log2(mean + 1))))
    return min(k, 14)


def _write_residual(bw: BitWriter, res: np.ndarray, blocksize: int,
                    order: int, partition_order: int,
                    force_escape: bool = False):
    bw.write(0, 2)                      # 4-bit Rice parameters
    bw.write(partition_order, 4)
    nparts = 1 << partition_order
    idx = 0
    for p in range(nparts):
        count = blocksize >> partition_order
        if p == 0:
            count -= order
        seg = res[idx: idx + count]
        idx += count
        if force_escape:
            raw = max(1, int(np.max(np.abs(seg)) if len(seg) else 0)
                      .bit_length() + 1)
            raw = min(raw, 31)
            bw.write(0xF, 4)            # escape
            bw.write(raw, 5)
            for v in seg:
                bw.write_signed(int(v), raw)
            continue
        k = _rice_param(seg)
        bw.write(k, 4)
        for v in seg:
            # zigzag: v>=0 -> 2v, v<0 -> -2v-1
            u = (abs(int(v)) << 1) - (1 if int(v) < 0 else 0)
            bw.write_unary(u >> k)
            bw.write(u & ((1 << k) - 1), k)


def _lpc_coeffs(x: np.ndarray, order: int, precision: int = 12):
    """Levinson-Durbin -> quantized integer predictor (coefs, shift)."""
    xf = x.astype(np.float64)
    ac = np.correlate(xf, xf, "full")[len(xf) - 1: len(xf) + order]
    if ac[0] == 0:
        return [0] * order, 0
    err = ac[0]
    a = np.zeros(order)
    for i in range(order):
        k = (ac[i + 1] - np.dot(a[:i], ac[i:0:-1])) / err
        a[: i + 1] = np.concatenate([a[:i] - k * a[:i][::-1], [k]])
        err *= (1 - k * k)
        if err <= 0:
            break
    cmax = np.max(np.abs(a)) or 1.0
    shift = min(15, max(0, precision - 1 - int(np.ceil(np.log2(cmax)))
                        - 1))
    q = np.clip(np.round(a * (1 << shift)),
                -(1 << (precision - 1)), (1 << (precision - 1)) - 1)
    return [int(v) for v in q], shift


def _encode_subframe(bw: BitWriter, x: np.ndarray, bps: int,
                     partition_order: int, subframe: str,
                     force_escape: bool, wasted: int = 0) -> None:
    blocksize = len(x)
    bw.write(0, 1)                      # pad
    if wasted:
        x = x >> wasted                 # caller guarantees divisibility

    def write_wasted():
        if wasted:
            bw.write(1, 1)
            bw.write_unary(wasted - 1)  # unary-coded count - 1
        else:
            bw.write(0, 1)

    bps = bps - wasted
    if subframe == "constant":
        bw.write(0, 6)
        write_wasted()
        bw.write_signed(int(x[0]), bps)
        return
    if subframe == "verbatim":
        bw.write(1, 6)
        write_wasted()
        for v in x:
            bw.write_signed(int(v), bps)
        return
    if subframe.startswith("lpc"):
        order = int(subframe[3:])       # "lpc1".."lpc32"
        precision = 12
        coefs, shift = _lpc_coeffs(x, order, precision)
        bw.write(31 + order, 6)
        write_wasted()
        for i in range(order):
            bw.write_signed(int(x[i]), bps)
        bw.write(precision - 1, 4)
        bw.write_signed(shift, 5)
        for c in coefs:
            bw.write_signed(c, precision)
        xl = x.astype(np.int64)
        res = np.empty(blocksize - order, np.int64)
        for i in range(order, blocksize):
            acc = 0
            for j in range(order):
                acc += coefs[j] * int(xl[i - 1 - j])
            res[i - order] = int(xl[i]) - (acc >> shift)
        _write_residual(bw, res, blocksize, order, partition_order,
                        force_escape)
        return
    order = int(subframe[-1])           # "fixed0".."fixed2"
    bw.write(8 + order, 6)
    write_wasted()
    for i in range(order):
        bw.write_signed(int(x[i]), bps)
    xl = x.astype(np.int64)
    if order == 0:
        res = xl
    elif order == 1:
        res = xl[1:] - xl[:-1]
    else:
        res = xl[2:] - 2 * xl[1:-1] + xl[:-2]
    _write_residual(bw, res, blocksize, order, partition_order,
                    force_escape)


def _pick_subframe(x: np.ndarray) -> str:
    if np.all(x == x[0]):
        return "constant"
    xl = x.astype(np.int64)
    costs = {"fixed0": np.sum(np.abs(xl)),
             "fixed1": np.sum(np.abs(np.diff(xl)))
             if len(xl) > 1 else 1 << 60,
             "fixed2": np.sum(np.abs(np.diff(xl, 2)))
             if len(xl) > 2 else 1 << 60}
    return min(costs, key=costs.get)


def encode_flac(pcm: np.ndarray, sample_rate: int = 16000,
                block_size: int = 4096, partition_order: int = 0,
                subframe: str | None = None, force_escape: bool = False,
                stereo_mode: str = "independent",
                wasted_bits: int = 0) -> bytes:
    """Encode int16 PCM — (samples,) mono or (samples, 2) stereo — to a
    FLAC stream.  ``subframe`` forces a type ('constant'/'verbatim'/
    'fixed0'..'fixed2'/'lpc<order>'); None picks per block.
    ``stereo_mode``: 'independent', 'left_side', 'right_side',
    'mid_side'.  ``wasted_bits`` > 0 requires all samples divisible by
    2^wasted_bits."""
    pcm = np.asarray(pcm, np.int64)
    if pcm.ndim == 1:
        pcm = pcm[:, None]
    n, channels = pcm.shape
    assert channels in (1, 2)
    bps = 16

    out = bytearray(b"fLaC")
    # STREAMINFO (last metadata block)
    si = BitWriter()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(channels - 1, 3)
    si.write(bps - 1, 5)
    si.write(n, 36)
    for _ in range(16):
        si.write(0, 8)                  # MD5 unknown
    body = si.data()
    out += bytes([0x80]) + len(body).to_bytes(3, "big") + body

    frame_no = 0
    for start in range(0, n, block_size):
        blk = pcm[start: start + block_size]
        bs = len(blk)

        if channels == 2 and stereo_mode != "independent":
            left, right = blk[:, 0], blk[:, 1]
            if stereo_mode == "left_side":
                ch_asgn, subs = 8, [(left, bps), (left - right, bps + 1)]
            elif stereo_mode == "right_side":
                ch_asgn, subs = 9, [(left - right, bps + 1), (right, bps)]
            else:                        # mid_side
                mid = (left + right) >> 1
                side = left - right
                ch_asgn, subs = 10, [(mid, bps), (side, bps + 1)]
        else:
            ch_asgn = channels - 1
            subs = [(blk[:, c], bps) for c in range(channels)]

        bw = BitWriter()
        bw.write(0x3FFE, 14)            # sync
        bw.write(0, 1)                  # reserved
        bw.write(0, 1)                  # fixed blocking
        bw.write(7, 4)                  # blocksize: 16 bit at end
        bw.write(5, 4)                  # 16 kHz table code (ignored by us)
        bw.write(ch_asgn, 4)
        bw.write(4, 3)                  # 16 bps
        bw.write(0, 1)                  # reserved
        for b in _utf8_number(frame_no):
            bw.write(b, 8)
        bw.write(bs - 1, 16)
        hdr = bw.data()                 # header is byte-aligned here
        bw.write(_crc8(hdr), 8)

        for x, ch_bps in subs:
            sf = subframe or _pick_subframe(x)
            # partition order must divide the block size
            po = partition_order if (bs >> partition_order) \
                << partition_order == bs else 0
            _encode_subframe(bw, x, ch_bps, po, sf, force_escape,
                             wasted=wasted_bits)
        bw.align()
        frame = bw.data()
        bw.write(_crc16(frame), 16)
        out += bw.data()
        frame_no += 1

    return bytes(out)


def write_flac(path: str, pcm: np.ndarray, sample_rate: int = 16000,
               **kw) -> None:
    with open(path, "wb") as f:
        f.write(encode_flac(pcm, sample_rate, **kw))
