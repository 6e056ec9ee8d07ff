"""Pure-numpy FLAC codec (public xiph.org / RFC 9639 spec).

FLAC is lossless integer math end-to-end — fixed predictors with exact
integer coefficients, Rice-coded residuals, computable CRC polynomials —
so a REAL codec needs no library and the decoded samples must equal the
source EXACTLY (the same checksum-oracle story as PNG/BMP/GIF/TIFF).

Encoder: 16-bit mono/stereo, fixed blocksize, CONSTANT / VERBATIM / FIXED
order 0-4 subframes chosen per block by residual cost, stereo
decorrelation (independent / left-side / right-side / mid-side, chosen by
cost), single-partition Rice residuals with escape, CRC-8 / CRC-16 frame
protection, STREAMINFO with MD5 (hashlib).

Decoder: everything the encoder writes PLUS the rest of the subset a real
16-bit file uses — LPC subframes (arbitrary order, shifted integer
coefficients), multi-partition Rice (methods 0 and 1), wasted bits, UTF-8
frame numbers, CRC-8 header verification.

Vectorization: Rice encode is fully vectorized (np.repeat bit assembly);
Rice decode walks values serially on a local int accumulator (the unary
lengths are data-dependent — same bounded shape as the JPEG entropy
loop); fixed-predictor reconstruction is a cumsum cascade (order-k
prediction = k successive prefix sums), fully vectorized.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np


# ------------------------------------------------------------------ CRC --

def _crc_table(poly: int, width: int) -> np.ndarray:
    table = np.zeros(256, dtype=np.uint32)
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    for i in range(256):
        c = i << (width - 8)
        for _ in range(8):
            c = ((c << 1) ^ poly) if c & top else (c << 1)
        table[i] = c & mask
    return table


_CRC8 = _crc_table(0x07, 8)
_CRC16 = _crc_table(0x8005, 16)


def _crc8(data: bytes) -> int:
    c = 0
    for b in data:
        c = int(_CRC8[(c ^ b) & 0xFF])
    return c


def _crc16(data: bytes) -> int:
    c = 0
    for b in data:
        c = int(_CRC16[((c >> 8) ^ b) & 0xFF]) ^ ((c << 8) & 0xFFFF)
    return c


# ------------------------------------------------------------ bit utils --

class _BitWriter:
    def __init__(self):
        self.chunks: list[np.ndarray] = []

    def write(self, value: int, nbits: int):
        if nbits == 0:
            return
        v = value & ((1 << nbits) - 1)
        bits = (v >> np.arange(nbits - 1, -1, -1, dtype=np.int64)) & 1
        self.chunks.append(bits.astype(np.uint8))

    def write_unary(self, q: int):
        if q:
            self.chunks.append(np.zeros(q, dtype=np.uint8))
        self.chunks.append(np.ones(1, dtype=np.uint8))

    def write_rice_block(self, vals: np.ndarray, k: int):
        """Vectorized Rice: zigzag -> (unary quotient, k low bits)."""
        u = ((vals.astype(np.int64) << 1) ^ (vals.astype(np.int64) >> 63))
        q = (u >> k).astype(np.int64)
        lengths = q + 1 + k
        total = int(lengths.sum())
        out = np.zeros(total, dtype=np.uint8)
        ends = np.cumsum(lengths)
        term = ends - k - 1  # position of each unary terminator '1'
        out[term] = 1
        if k:
            low = (u & ((1 << k) - 1)).astype(np.int64)
            kbits = (low[:, None] >> np.arange(k - 1, -1, -1)[None, :]) & 1
            idx = (term[:, None] + 1 + np.arange(k)[None, :]).ravel()
            out[idx] = kbits.ravel().astype(np.uint8)
        self.chunks.append(out)

    def pad_to_byte(self):
        n = int(sum(len(c) for c in self.chunks))
        pad = (-n) % 8
        if pad:
            self.chunks.append(np.zeros(pad, dtype=np.uint8))

    def tobytes(self) -> bytes:
        if not self.chunks:
            return b""
        return np.packbits(np.concatenate(self.chunks)).tobytes()


class _BitReader:
    def __init__(self, data: bytes, pos_bytes: int = 0):
        self.data = data
        self.pos = pos_bytes  # byte position
        self.acc = 0
        self.nbits = 0

    def read(self, n: int) -> int:
        while self.nbits < n:
            self.acc = (self.acc << 8) | (self.data[self.pos]
                                          if self.pos < len(self.data) else 0)
            self.pos += 1
            self.nbits += 8
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v

    def read_unary(self) -> int:
        q = 0
        while True:
            if self.nbits == 0:
                self.acc = (self.data[self.pos]
                            if self.pos < len(self.data) else 1)
                self.pos += 1
                self.nbits = 8
            if self.acc == 0:  # whole register is zeros
                q += self.nbits
                self.nbits = 0
                continue
            top = self.acc.bit_length()
            zeros = self.nbits - top
            q += zeros
            self.nbits = top - 1
            self.acc &= (1 << self.nbits) - 1
            return q

    def align_byte(self):
        self.nbits = 0
        self.acc = 0


def _signed(v: int, bits: int) -> int:
    return v - (1 << bits) if v >= (1 << (bits - 1)) else v


# ---------------------------------------------------------------- encode --

_FIXED_COEF = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def _fixed_residual(x: np.ndarray, order: int) -> np.ndarray:
    r = x.astype(np.int64)
    for _ in range(order):
        r = np.diff(r)
    return r


def _best_fixed_order(x: np.ndarray) -> int:
    best, best_cost = 0, None
    for o in range(5):
        if len(x) <= o:
            break
        cost = np.abs(_fixed_residual(x, o)).sum()
        if best_cost is None or cost < best_cost:
            best, best_cost = o, cost
    return best


def _rice_k(res: np.ndarray) -> int:
    if len(res) == 0:
        return 0
    mean = max(float(np.abs(res).mean()), 0.1)
    return int(np.clip(np.ceil(np.log2(mean + 1)) + 1, 0, 14))


def _write_subframe(bw: _BitWriter, x: np.ndarray, bps: int):
    n = len(x)
    if n and (x == x[0]).all():
        bw.write(0, 1)
        bw.write(0, 6)  # CONSTANT
        bw.write(0, 1)
        bw.write(int(x[0]) & ((1 << bps) - 1), bps)
        return
    order = _best_fixed_order(x)
    res = _fixed_residual(x, order)
    k = _rice_k(res)
    bw.write(0, 1)
    bw.write(0b001000 | order, 6)  # FIXED
    bw.write(0, 1)  # no wasted bits
    for i in range(order):
        bw.write(int(x[i]) & ((1 << bps) - 1), bps)
    bw.write(0, 2)   # residual method 0 (4-bit rice)
    bw.write(0, 4)   # partition order 0
    if k < 15 and len(res):
        bw.write(k, 4)
        bw.write_rice_block(res, k)
    else:  # escape: raw residuals (order-o differences span bps+o+1 bits)
        raw = min(bps + order + 1, 31)
        bw.write(15, 4)
        bw.write(raw, 5)
        for v in res.tolist():
            bw.write(v & ((1 << raw) - 1), raw)


def _utf8_number(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    out = []
    nbytes = 6
    for nb in range(2, 7):  # smallest length whose payload bits fit n
        if n < (1 << (6 - nb + 1 + 6 * (nb - 1))):
            nbytes = nb
            break
    lead = (0xFF << (8 - nbytes)) & 0xFF
    shift = 6 * (nbytes - 1)
    out.append(lead | (n >> shift))
    for i in range(nbytes - 1):
        shift -= 6
        out.append(0x80 | ((n >> shift) & 0x3F))
    return bytes(out)


def _read_utf8_number(br: _BitReader) -> int:
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    nbytes = 8 - (255 - b0).bit_length()  # count of leading 1s
    n = b0 & ((1 << (7 - nbytes)) - 1)
    for _ in range(nbytes - 1):
        n = (n << 6) | (br.read(8) & 0x3F)
    return n


_BS_CODE = {192: 1, 576: 2, 1152: 3, 2304: 4, 4608: 5, 256: 8, 512: 9,
            1024: 10, 2048: 11, 4096: 12, 8192: 13, 16384: 14, 32768: 15}
_SR_CODE = {88200: 1, 176400: 2, 192000: 3, 8000: 4, 16000: 5, 22050: 6,
            24000: 7, 32000: 8, 44100: 9, 48000: 10, 96000: 11}


def encode_flac(samples: np.ndarray, rate: int = 16000,
                block_size: int = 4096) -> bytes:
    """(n[, channels]) int16 -> FLAC bytes (16-bit, fixed blocksize)."""
    samples = np.asarray(samples, dtype=np.int16)
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    if ch not in (1, 2):
        raise ValueError("mono or stereo only")
    md5 = hashlib.md5(samples.astype("<i2").tobytes()).digest()

    out = bytearray(b"fLaC")
    si = bytearray()
    si += struct.pack(">HH", block_size, block_size)
    si += b"\x00\x00\x00" * 2  # min/max framesize unknown
    packed = (rate << 12) | ((ch - 1) << 9) | ((16 - 1) << 4) | (n >> 32)
    si += struct.pack(">I", packed)
    si += struct.pack(">I", n & 0xFFFFFFFF)
    si += md5
    out += bytes([0x80]) + len(si).to_bytes(3, "big") + si  # last metadata

    for fi, start in enumerate(range(0, n, block_size)):
        blk = samples[start:start + block_size]
        bs = len(blk)
        # stereo decorrelation choice by |residual| cost
        if ch == 2:
            left = blk[:, 0].astype(np.int64)
            right = blk[:, 1].astype(np.int64)
            side = left - right
            mid = (left + right) >> 1
            costs = {
                1: abs(left).sum() + abs(right).sum(),   # independent
                8: abs(left).sum() + abs(side).sum(),    # left/side
                9: abs(side).sum() + abs(right).sum(),   # right/side
                10: abs(mid).sum() + abs(side).sum(),    # mid/side
            }
            mode = min(costs, key=costs.get)
        else:
            mode = 0

        bw = _BitWriter()
        hdr = _BitWriter()
        hdr.write(0b11111111111110, 14)
        hdr.write(0, 1)  # reserved
        hdr.write(0, 1)  # fixed blocksize strategy
        bs_code = _BS_CODE.get(bs, 7)  # 7: 16-bit at end of header
        hdr.write(bs_code, 4)
        hdr.write(_SR_CODE.get(rate, 0), 4)
        ca = {0: 0, 1: 0b1000, 8: 0b1000, 9: 0b1001, 10: 0b1010}[mode] \
            if ch == 2 else 0
        if ch == 2 and mode == 1:
            ca = 1  # 2 independent channels
        hdr.write(ca, 4)
        hdr.write(0b100, 3)  # 16 bits/sample
        hdr.write(0, 1)
        hdr_bytes = bytearray(hdr.tobytes())
        hdr_bytes += _utf8_number(fi)
        if bs_code == 7:
            hdr_bytes += struct.pack(">H", bs - 1)
        if _SR_CODE.get(rate, 0) == 0:
            pass  # rate 0 = from STREAMINFO
        hdr_bytes.append(_crc8(bytes(hdr_bytes)))
        frame = bytearray(hdr_bytes)

        if ch == 1:
            _write_subframe(bw, blk[:, 0].astype(np.int64), 16)
        elif mode == 1:
            _write_subframe(bw, blk[:, 0].astype(np.int64), 16)
            _write_subframe(bw, blk[:, 1].astype(np.int64), 16)
        elif mode == 8:
            _write_subframe(bw, left, 16)
            _write_subframe(bw, side, 17)
        elif mode == 9:
            _write_subframe(bw, side, 17)
            _write_subframe(bw, right, 16)
        else:
            _write_subframe(bw, mid, 16)
            _write_subframe(bw, side, 17)
        bw.pad_to_byte()
        frame += bw.tobytes()
        frame += struct.pack(">H", _crc16(bytes(frame)))
        out += frame
    return bytes(out)


# ---------------------------------------------------------------- decode --

def _read_residual(br: _BitReader, bs: int, order: int) -> np.ndarray:
    method = br.read(2)
    if method > 1:
        raise ValueError("reserved residual coding method")
    plen = 4 if method == 0 else 5
    escape = (1 << plen) - 1
    po = br.read(4)
    res = np.empty(bs - order, dtype=np.int64)
    pos = 0
    for part in range(1 << po):
        count = (bs >> po) - (order if part == 0 else 0)
        k = br.read(plen)
        if k == escape:
            raw = br.read(5)
            for i in range(count):
                res[pos + i] = _signed(br.read(raw), raw) if raw else 0
        else:
            for i in range(count):
                q = br.read_unary()
                u = (q << k) | br.read(k)
                res[pos + i] = (u >> 1) ^ -(u & 1)
        pos += count
    return res


def _read_subframe(br: _BitReader, bs: int, bps: int) -> np.ndarray:
    if br.read(1):
        raise ValueError("invalid subframe padding bit")
    t = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = 1 + br.read_unary()
    eff = bps - wasted
    if t == 0:  # CONSTANT
        x = np.full(bs, _signed(br.read(eff), eff), dtype=np.int64)
    elif t == 1:  # VERBATIM
        x = np.array([_signed(br.read(eff), eff) for _ in range(bs)],
                     dtype=np.int64)
    elif 8 <= t <= 12:  # FIXED
        order = t - 8
        warm = np.array([_signed(br.read(eff), eff) for _ in range(order)],
                        dtype=np.int64)
        res = _read_residual(br, bs, order)
        if order == 0:
            x = res
        else:
            # invert the difference cascade: at level j, cur is the j-th
            # difference series from index j; seeding with the warmup's
            # (j-1)-th difference at index j-1 and prefix-summing yields
            # the (j-1)-th series — after `order` levels, cur IS x
            cur = res
            for j in range(order, 0, -1):
                seed = np.diff(warm, n=j - 1)[0]
                cur = np.cumsum(np.concatenate([[seed], cur]))
            x = cur
    elif t >= 32:  # LPC
        order = (t & 0x1F) + 1
        warm = [_signed(br.read(eff), eff) for _ in range(order)]
        prec = br.read(4) + 1
        shift = _signed(br.read(5), 5)
        coefs = [_signed(br.read(prec), prec) for _ in range(order)]
        res = _read_residual(br, bs, order)
        x = np.empty(bs, dtype=np.int64)
        x[:order] = warm
        c = np.array(coefs[::-1], dtype=np.int64)
        for i in range(order, bs):  # true serial recurrence
            x[i] = res[i - order] + ((x[i - order:i] * c).sum() >> shift)
    else:
        raise ValueError(f"reserved subframe type {t}")
    return x << wasted


_BS_DECODE = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608, 8: 256, 9: 512,
              10: 1024, 11: 2048, 12: 4096, 13: 8192, 14: 16384, 15: 32768}


def decode_flac(data: bytes) -> tuple[np.ndarray, int]:
    """FLAC bytes -> ((n, channels) int16, sample_rate). 16-bit subset."""
    if data[:4] != b"fLaC":
        raise ValueError("not a FLAC payload")
    pos = 4
    rate = channels = total = None
    while True:
        hdr = data[pos:pos + 4]
        last = hdr[0] & 0x80
        btype = hdr[0] & 0x7F
        size = int.from_bytes(hdr[1:4], "big")
        body = data[pos + 4:pos + 4 + size]
        if btype == 0:  # STREAMINFO
            packed = struct.unpack(">I", body[10:14])[0]
            rate = packed >> 12
            channels = ((packed >> 9) & 7) + 1
            bps = ((packed >> 4) & 0x1F) + 1
            if bps != 16:
                raise ValueError("only 16-bit FLAC supported")
            total = ((packed & 0xF) << 32) | struct.unpack(">I", body[14:18])[0]
        pos += 4 + size
        if last:
            break
    # STREAMINFO total_samples = 0 is spec-legal "unknown": decode frames
    # until the byte stream runs out instead of trusting the header
    known = total if total else None
    chunks: list = []
    n_out = 0
    while (known is None or n_out < known) and pos + 2 <= len(data):
        br = _BitReader(data, pos)
        sync = br.read(14)
        if sync != 0b11111111111110:
            raise ValueError("lost frame sync")
        br.read(1)
        br.read(1)  # blocking strategy
        bs_code = br.read(4)
        sr_code = br.read(4)
        ca = br.read(4)
        if br.read(3) != 0b100:
            raise ValueError("only 16-bit frames supported")
        br.read(1)
        _read_utf8_number(br)
        if bs_code == 6:
            bs = br.read(8) + 1
        elif bs_code == 7:
            bs = br.read(16) + 1
        else:
            bs = _BS_DECODE[bs_code]
        if sr_code == 12:
            br.read(8)
        elif sr_code in (13, 14):
            br.read(16)
        hdr_len = br.pos - pos
        expect = _crc8(data[pos:pos + hdr_len])
        got = br.read(8)
        if got != expect:
            raise ValueError("frame header CRC mismatch")
        if known is not None:
            bs = min(bs, known - n_out)
        if ca < 8:  # independent channels
            chans = [_read_subframe(br, bs, 16) for _ in range(channels)]
        elif ca == 8:  # left/side
            left = _read_subframe(br, bs, 16)
            side = _read_subframe(br, bs, 17)
            chans = [left, left - side]
        elif ca == 9:  # right/side
            side = _read_subframe(br, bs, 17)
            right = _read_subframe(br, bs, 16)
            chans = [right + side, right]
        elif ca == 10:  # mid/side
            mid = _read_subframe(br, bs, 16)
            side = _read_subframe(br, bs, 17)
            m2 = (mid << 1) | (side & 1)
            chans = [(m2 + side) >> 1, (m2 - side) >> 1]
        else:
            raise ValueError("reserved channel assignment")
        br.align_byte()
        br.read(16)  # frame CRC-16 (already covered by the md5 contract)
        frame = np.empty((bs, channels), dtype=np.int16)
        for c in range(channels):
            frame[:, c] = chans[c].astype(np.int16)
        chunks.append(frame)
        n_out += bs
        pos = br.pos
    out = (np.concatenate(chunks) if chunks
           else np.empty((0, channels), dtype=np.int16))
    return out, int(rate)
