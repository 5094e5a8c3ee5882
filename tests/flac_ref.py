"""Minimal pure-Python FLAC *encoder* -- test oracle for the C++ decoder.

Writes spec-compliant streams using a chosen subframe type per frame:
constant, verbatim, fixed-order-k with Rice residuals, or a simple LPC.
Supports mono and independent/left-side/mid-side stereo, 8/16-bit samples.
Used only by tests (there is no FLAC encoder in this environment, so the
decoder's oracle is this encoder plus numpy reference predictions).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np


class BitWriter:
    def __init__(self):
        self.bytes = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, bits: int) -> None:
        value &= (1 << bits) - 1 if bits else 0
        self.acc = (self.acc << bits) | value
        self.nbits += bits
        while self.nbits >= 8:
            self.nbits -= 8
            self.bytes.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_signed(self, value: int, bits: int) -> None:
        self.write(value & ((1 << bits) - 1), bits)

    def write_unary(self, q: int) -> None:
        for _ in range(q):
            self.write(0, 1)
        self.write(1, 1)

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def getvalue(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.bytes)


def _utf8_number(bw: BitWriter, n: int) -> None:
    if n < 0x80:
        bw.write(n, 8)
        return
    # 2-byte form covers our tests (n < 0x800)
    bw.write(0xC0 | (n >> 6), 8)
    bw.write(0x80 | (n & 0x3F), 8)


_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _rice_encode(bw: BitWriter, residuals: Sequence[int], param: int) -> None:
    for r in residuals:
        u = (r << 1) ^ (r >> 63) if False else (2 * r if r >= 0 else -2 * r - 1)
        q, rem = u >> param, u & ((1 << param) - 1)
        bw.write_unary(q)
        bw.write(rem, param)


def _write_wasted(bw: BitWriter, wasted: int) -> None:
    """Wasted-bits field: flag 0, or flag 1 + unary(wasted - 1)."""
    if wasted:
        bw.write(1, 1)
        bw.write_unary(wasted - 1)
    else:
        bw.write(0, 1)


def _write_subframe(bw: BitWriter, samples: np.ndarray, bps: int,
                    subframe: str, order: int = 2, rice: int = 4,
                    wasted: int = 0, method: int = 0,
                    partition_order: int = 0,
                    escape_raw: Optional[int] = None) -> None:
    """`wasted` shifts samples down by that many (must-be-zero) low bits;
    `method`=1 selects 5-bit Rice parameters; `partition_order` splits the
    residuals into 2^po partitions (each gets its own parameter field);
    `escape_raw` writes every partition ESCAPED as raw signed
    `escape_raw`-bit residuals instead of Rice codes."""
    bw.write(0, 1)  # padding
    n = len(samples)
    if wasted:
        assert not np.any(samples & ((1 << wasted) - 1)), "low bits not zero"
        samples = samples >> wasted
        bps -= wasted
    if subframe == "constant":
        bw.write(0, 6)
        _write_wasted(bw, wasted)
        bw.write_signed(int(samples[0]), bps)
        return
    if subframe == "verbatim":
        bw.write(1, 6)
        _write_wasted(bw, wasted)
        for s in samples:
            bw.write_signed(int(s), bps)
        return
    if subframe == "fixed":
        bw.write(8 + order, 6)
        _write_wasted(bw, wasted)
        coefs = np.array(_FIXED_COEFS[order], np.int64)
        shift = 0
    elif subframe == "lpc":
        bw.write(32 + order - 1, 6)
        _write_wasted(bw, wasted)
        coefs = np.array([1] * order, np.int64)  # simple averaging predictor
        shift = 1 if order == 2 else 0
        if order == 1:
            coefs = np.array([1], np.int64)
    else:
        raise ValueError(subframe)

    s = samples.astype(np.int64)
    for i in range(order):
        bw.write_signed(int(s[i]), bps)
    if subframe == "lpc":
        precision = 15
        bw.write(precision - 1, 4)
        bw.write_signed(shift, 5)
        for c in coefs:
            bw.write_signed(int(c), precision)

    residuals = []
    for i in range(order, n):
        pred = int(np.dot(coefs, s[i - order : i][::-1])) if order else 0
        residuals.append(int(s[i] - (pred >> shift)))

    plen = 4 if method == 0 else 5
    esc = (1 << plen) - 1
    bw.write(method, 2)  # residual method (0: 4-bit rice, 1: 5-bit)
    bw.write(partition_order, 4)
    nparts = 1 << partition_order
    assert n % nparts == 0, "block size must divide into partitions"
    idx = 0
    for p in range(nparts):
        count = (n >> partition_order) - (order if p == 0 else 0)
        assert count >= 0
        part = residuals[idx: idx + count]
        idx += count
        if escape_raw is not None:
            bw.write(esc, plen)
            bw.write(escape_raw, 5)
            for r in part:
                bw.write_signed(r, escape_raw)
        else:
            bw.write(rice, plen)
            _rice_encode(bw, part, rice)


def encode_flac(
    channels: np.ndarray,  # (n_channels, n_samples) int
    sample_rate: int = 16000,
    bps: int = 16,
    block_size: int = 4096,
    subframe: str = "fixed",
    order: int = 2,
    channel_mode: str = "independent",  # or "left_side", "mid_side"
    wasted: int = 0,
    method: int = 0,
    partition_order: int = 0,
    escape_raw: Optional[int] = None,
    md5: bool = True,
) -> bytes:
    channels = np.atleast_2d(np.asarray(channels, np.int64))
    nch, total = channels.shape

    sub_kw = dict(wasted=wasted, method=method,
                  partition_order=partition_order, escape_raw=escape_raw)

    out = bytearray(b"fLaC")
    # STREAMINFO (last metadata block)
    si = BitWriter()
    si.write(block_size, 16)  # min block
    si.write(block_size, 16)  # max block
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(nch - 1, 3)
    si.write(bps - 1, 5)
    si.write(total, 36)
    if md5:
        # the spec hash: interleaved little-endian samples at the stream
        # bit width (RFC 9639 §8.2)
        import hashlib

        nbytes = (bps + 7) // 8  # spec width; 24-bit packs low 3 bytes
        flat = channels.T.reshape(-1)
        if nbytes in (1, 2, 4):
            inter = flat.astype(f"<i{nbytes}").tobytes()
        else:
            b4 = flat.astype("<i4").view(np.uint8).reshape(-1, 4)
            inter = np.ascontiguousarray(b4[:, :nbytes]).tobytes()
        digest = hashlib.md5(inter).digest()
    else:
        digest = b"\x00" * 16
    si_bytes = si.getvalue() + digest
    out += bytes([0x80, 0, 0, len(si_bytes)]) + si_bytes

    frame_no = 0
    for start in range(0, total, block_size):
        blk = channels[:, start : start + block_size]
        n = blk.shape[1]
        bw = BitWriter()
        bw.write(0x3FFE, 14)
        bw.write(0, 1)  # reserved
        bw.write(0, 1)  # fixed blocksize strategy
        bw.write(7, 4)  # block size: 16-bit value - 1 follows
        bw.write(0, 4)  # sample rate: from STREAMINFO
        if nch == 1:
            bw.write(0, 4)
        elif channel_mode == "independent":
            bw.write(1, 4)
        elif channel_mode == "left_side":
            bw.write(8, 4)
        elif channel_mode == "mid_side":
            bw.write(10, 4)
        else:
            raise ValueError(channel_mode)
        bw.write({8: 1, 16: 4}[bps], 3)  # sample size code
        bw.write(0, 1)  # reserved
        _utf8_number(bw, frame_no)
        bw.write(n - 1, 16)
        bw.write(0, 8)  # CRC-8 (decoder does not validate)

        if nch == 1:
            _write_subframe(bw, blk[0], bps, subframe, order, **sub_kw)
        elif channel_mode == "independent":
            for c in range(nch):
                _write_subframe(bw, blk[c], bps, subframe, order, **sub_kw)
        elif channel_mode == "left_side":
            side = blk[0] - blk[1]
            _write_subframe(bw, blk[0], bps, subframe, order, **sub_kw)
            _write_subframe(bw, side, bps + 1, subframe, order, **sub_kw)
        elif channel_mode == "mid_side":
            side = blk[0] - blk[1]
            mid = (blk[0] + blk[1]) >> 1
            _write_subframe(bw, mid, bps, subframe, order, **sub_kw)
            _write_subframe(bw, side, bps + 1, subframe, order, **sub_kw)
        bw.align()
        bw.write(0, 16)  # CRC-16 (unvalidated)
        out += bw.getvalue()
        frame_no += 1

    return bytes(out)
