"""Pure-numpy baseline JPEG codec (ITU-T T.81 sequential DCT, Huffman).

No codec library exists in this container, but baseline JPEG is pure math:
BT.601 colour transform, 8x8 DCT-II, Annex-K quantization scaled by the
IJG quality formula, zigzag + DC-differential + run-length Huffman entropy
coding. Both directions are implemented from the public spec:

- ``encode_jpeg``: 4:4:4 / 4:2:2 / 4:4:0 / 4:2:0 subsampling, gray or
  RGB, JFIF headers.
- ``decode_jpeg``: baseline SOF0 (gray / YCbCr, any 1-or-2 luma sampling),
  DHT canonical Huffman, DRI/RSTn restart markers, 0xFF00 byte unstuffing.

Verification contract (see tests): the analysis half (colour transform /
subsample / DCT / quantize) and the synthesis half (dequantize / IDCT /
upsample / colour restore) are shared, pure functions — so
``decode_jpeg(encode_jpeg(img))`` must be BIT-EXACT equal to
``jpeg_reference_reconstruct(img)`` (the same math with no bitstream in
between). Any entropy-layer bug breaks that equality; lossy-ness is then
bounded separately by a PSNR assertion against the source.

Vectorization: DCT/IDCT/quantization run as one einsum over all blocks of
a component; only the entropy layer walks symbols serially (a true bit-
stream dependency), bounded by coefficient count, not pixel count.

Reference semantics analog: GeoMesa rasters decode through Java ImageIO
(jpeg included); this is the Ray engine's from-scratch equivalent for
media spans (stages/media.py).
"""

from __future__ import annotations

import struct

import numpy as np

# ------------------------------------------------------------ constants --

_QL = np.array([  # Annex K.1 luminance quantization (row-major)
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.float64)

_QC = np.array([  # Annex K.2 chrominance quantization
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.float64)


def _make_zigzag() -> np.ndarray:
    out = []
    for s in range(15):
        rr = range(0, s + 1) if s % 2 == 1 else range(s, -1, -1)
        for r in rr:
            c = s - r
            if r < 8 and c < 8:
                out.append(r * 8 + c)
    return np.array(out, dtype=np.int64)


_ZZ = _make_zigzag()  # zigzag position k -> row-major index

# Annex K.3 typical Huffman tables: (bits[1..16], values)
_DC_L = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0], list(range(12)))
_DC_C = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0], list(range(12)))
_AC_L = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
_AC_C = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])


#: luma:chroma sampling factors (fx, fy) per JFIF subsampling name
_SUB_FACTORS = {"444": (1, 1), "422": (2, 1), "440": (1, 2), "420": (2, 2)}


def _dct_matrix() -> np.ndarray:
    k = np.arange(8)[:, None]
    n = np.arange(8)[None, :]
    m = np.cos((2 * n + 1) * k * np.pi / 16) * 0.5
    m[0] *= 1 / np.sqrt(2)
    return m


_M = _dct_matrix()


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """IJG quality scaling (libjpeg jcparam.c, public) -> (luma, chroma)."""
    quality = min(100, max(1, int(quality)))
    scale = 5000 / quality if quality < 50 else 200 - 2 * quality
    ql = np.clip(np.floor((_QL * scale + 50) / 100), 1, 255)
    qc = np.clip(np.floor((_QC * scale + 50) / 100), 1, 255)
    return ql, qc


# ---------------------------------------------------- shared pure halves --

def _rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    r, g, b = (img[:, :, i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.round(np.clip(np.dstack([y, cb, cr]), 0, 255))


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y = ycc[:, :, 0]
    cb = ycc[:, :, 1] - 128.0
    cr = ycc[:, :, 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.dstack([r, g, b])), 0, 255).astype(np.uint8)


def _pad_edge(plane: np.ndarray, mh: int, mw: int) -> np.ndarray:
    h, w = plane.shape
    ph = (mh - h % mh) % mh
    pw = (mw - w % mw) % mw
    return np.pad(plane, ((0, ph), (0, pw)), mode="edge")


def _to_blocks(plane: np.ndarray) -> np.ndarray:
    h, w = plane.shape
    return (plane.reshape(h // 8, 8, w // 8, 8)
            .transpose(0, 2, 1, 3).reshape(-1, 8, 8))


def _from_blocks(blocks: np.ndarray, h: int, w: int) -> np.ndarray:
    return (blocks.reshape(h // 8, w // 8, 8, 8)
            .transpose(0, 2, 1, 3).reshape(h, w))


def _analyze(img: np.ndarray, quality: int, subsample: str):
    """Image -> quantized integer DCT coefficients per component.

    Returns (coeff_list, qtab_list, plane_shapes, (H, W), gray). Shared by
    the encoder and the reference reconstruction so the bit-exactness test
    isolates the entropy layer."""
    img = np.asarray(img, dtype=np.uint8)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    ql, qc = _quality_tables(quality)
    if gray:
        planes = [np.round(img.astype(np.float64))]
        qts = [ql]
    else:
        ycc = _rgb_to_ycbcr(img)
        y, cb, cr = ycc[:, :, 0], ycc[:, :, 1], ycc[:, :, 2]
        if subsample not in _SUB_FACTORS:
            raise ValueError("subsample must be one of " + "/".join(_SUB_FACTORS))
        fx, fy = _SUB_FACTORS[subsample]
        y = _pad_edge(y, 8 * fy, 8 * fx)
        cb = _pad_edge(cb, 8 * fy, 8 * fx)
        cr = _pad_edge(cr, 8 * fy, 8 * fx)
        if fx > 1 or fy > 1:
            def box(p):
                return np.round(p.reshape(p.shape[0] // fy, fy,
                                          p.shape[1] // fx, fx).mean(axis=(1, 3)))
            cb, cr = box(cb), box(cr)
        planes = [y, cb, cr]
        qts = [ql, qc, qc]
    if gray:
        planes = [_pad_edge(planes[0], 8, 8)]
    shapes = [p.shape for p in planes]
    coeffs = []
    for p, q in zip(planes, qts):
        blocks = _to_blocks(p - 128.0)
        dct = np.einsum("ij,njk,lk->nil", _M, blocks, _M)
        coeffs.append(np.round(dct / q.reshape(8, 8)).astype(np.int32))
    return coeffs, qts, shapes, (h, w), gray


def _synthesize(coeffs, qts, shapes, hw, gray, subsample: str) -> np.ndarray:
    """Quantized coefficients -> uint8 image (the decoder's math half)."""
    h, w = hw
    planes = []
    for c, q, shp in zip(coeffs, qts, shapes):
        deq = c.astype(np.float64) * q.reshape(8, 8)
        idct = np.einsum("ji,njk,kl->nil", _M, deq, _M) + 128.0
        planes.append(np.clip(np.round(_from_blocks(idct, *shp)), 0, 255))
    if gray:
        return planes[0][:h, :w].astype(np.uint8)
    y, cb, cr = planes
    fx, fy = _SUB_FACTORS[subsample]
    if fy > 1:
        cb = np.repeat(cb, fy, axis=0)
        cr = np.repeat(cr, fy, axis=0)
    if fx > 1:
        cb = np.repeat(cb, fx, axis=1)
        cr = np.repeat(cr, fx, axis=1)
    ycc = np.dstack([y, cb[: y.shape[0], : y.shape[1]],
                     cr[: y.shape[0], : y.shape[1]]])
    return _ycbcr_to_rgb(ycc)[:h, :w]


def jpeg_reference_reconstruct(img: np.ndarray, quality: int = 75,
                               subsample: str = "420") -> np.ndarray:
    """What a lossless entropy layer must reproduce: analysis + synthesis
    with no bitstream in between. ``decode_jpeg(encode_jpeg(x, q, s))``
    must equal this EXACTLY."""
    coeffs, qts, shapes, hw, gray = _analyze(img, quality, subsample)
    return _synthesize(coeffs, qts, shapes, hw, gray, subsample)


# -------------------------------------------------------------- encoder --

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int):
        if length == 0:
            return
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)
        self.acc &= (1 << self.nbits) - 1

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)


def _build_codes(bits, vals) -> dict:
    """Canonical Huffman: symbol -> (code, length)."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _encode_block(bw: _BitWriter, coef_zz: np.ndarray, pred: int,
                  dc_codes: dict, ac_codes: dict) -> int:
    dc = int(coef_zz[0])
    diff = dc - pred
    s = _category(diff)
    code, ln = dc_codes[s]
    bw.write(code, ln)
    if s:
        bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    nz = np.nonzero(coef_zz[1:])[0]
    last = nz[-1] + 1 if len(nz) else 0
    for k in range(1, last + 1):
        v = int(coef_zz[k])
        if v == 0:
            run += 1
            continue
        while run >= 16:
            code, ln = ac_codes[0xF0]
            bw.write(code, ln)
            run -= 16
        s = _category(v)
        code, ln = ac_codes[(run << 4) | s]
        bw.write(code, ln)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last < 63:
        code, ln = ac_codes[0x00]
        bw.write(code, ln)
    return dc


def encode_jpeg(img: np.ndarray, quality: int = 75, subsample: str = "420",
                restart_interval: int = 0) -> bytes:
    """(H, W) gray or (H, W, 3) RGB uint8 -> baseline JFIF JPEG bytes.

    ``restart_interval`` > 0 emits a DRI segment and RSTn markers every
    that many MCUs (what a parallel/streaming encoder would do so a reader
    can resync mid-scan)."""
    coeffs, qts, shapes, (h, w), gray = _analyze(img, quality, subsample)
    ql = qts[0]
    out = bytearray(b"\xFF\xD8")  # SOI
    out += b"\xFF\xE0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"

    def dqt(tid: int, q: np.ndarray) -> bytes:
        zz = q.reshape(-1)[_ZZ].astype(np.uint8)
        return b"\xFF\xDB" + struct.pack(">HB", 67, tid) + zz.tobytes()

    out += dqt(0, ql)
    if not gray:
        out += dqt(1, qts[1])

    ncomp = 1 if gray else 3
    # (id, sampling h<<4|v, qtab)
    if gray:
        comps = [(1, 0x11, 0)]
    else:
        fx, fy = _SUB_FACTORS[subsample]
        comps = [(1, (fx << 4) | fy, 0), (2, 0x11, 1), (3, 0x11, 1)]
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for cid, samp, qt in comps:
        sof += struct.pack(">BBB", cid, samp, qt)
    out += b"\xFF\xC0" + struct.pack(">H", 2 + len(sof)) + sof

    def dht(cls: int, tid: int, table) -> bytes:
        bits, vals = table
        body = bytes([cls << 4 | tid]) + bytes(bits) + bytes(vals)
        return b"\xFF\xC4" + struct.pack(">H", 2 + len(body)) + body

    out += dht(0, 0, _DC_L) + dht(1, 0, _AC_L)
    if not gray:
        out += dht(0, 1, _DC_C) + dht(1, 1, _AC_C)

    if restart_interval:
        out += b"\xFF\xDD" + struct.pack(">HH", 4, restart_interval)

    sos = struct.pack(">B", ncomp)
    for cid, _, _ in comps:
        tid = 0 if cid == 1 else 1
        sos += struct.pack(">BB", cid, tid << 4 | tid)
    sos += b"\x00\x3F\x00"
    out += b"\xFF\xDA" + struct.pack(">H", 2 + len(sos)) + sos

    dc_tabs = [_build_codes(*_DC_L)] + [_build_codes(*_DC_C)] * 2
    ac_tabs = [_build_codes(*_AC_L)] + [_build_codes(*_AC_C)] * 2
    zz_coeffs = [c.reshape(len(c), 64)[:, _ZZ] for c in coeffs]

    bw = _BitWriter()
    preds = [0] * ncomp
    ph, pw = shapes[0]
    mcu_count = 0

    def maybe_restart():
        nonlocal preds, mcu_count
        if restart_interval and mcu_count and mcu_count % restart_interval == 0:
            bw.flush()
            bw.out += bytes([0xFF, 0xD0 + (mcu_count // restart_interval - 1) % 8])
            preds = [0] * ncomp
        mcu_count += 1

    if gray:
        n_blocks = (ph // 8) * (pw // 8)
        for b in range(n_blocks):
            maybe_restart()
            preds[0] = _encode_block(bw, zz_coeffs[0][b], preds[0],
                                     dc_tabs[0], ac_tabs[0])
    else:
        # MCU = fx*fy luma blocks + 1 Cb + 1 Cr
        fx, fy = _SUB_FACTORS[subsample]
        yw = pw // 8
        cw = shapes[1][1] // 8
        for my in range(ph // (8 * fy)):
            for mx in range(pw // (8 * fx)):
                maybe_restart()
                for dy in range(fy):
                    for dx in range(fx):
                        b = (my * fy + dy) * yw + mx * fx + dx
                        preds[0] = _encode_block(bw, zz_coeffs[0][b], preds[0],
                                                 dc_tabs[0], ac_tabs[0])
                cb_b = my * cw + mx
                preds[1] = _encode_block(bw, zz_coeffs[1][cb_b], preds[1],
                                         dc_tabs[1], ac_tabs[1])
                preds[2] = _encode_block(bw, zz_coeffs[2][cb_b], preds[2],
                                         dc_tabs[2], ac_tabs[2])
    bw.flush()
    out += bw.out
    out += b"\xFF\xD9"  # EOI
    return bytes(out)


# -------------------------------------------------------------- decoder --

def _split_entropy(data: bytes, pos: int) -> list[bytes]:
    """The scan's entropy bytes -> unstuffed segments split at RSTn
    markers (numpy scan — one pass over the buffer instead of per-byte
    Python stuffing checks in the hot bit reader)."""
    arr = np.frombuffer(data, dtype=np.uint8, offset=pos)
    ff = np.nonzero(arr == 0xFF)[0]
    segments: list[bytes] = []
    seg_start = 0
    drop: list[int] = []  # stuffed 0x00 positions within the current segment

    def flush(end_):
        keep = np.ones(end_ - seg_start, dtype=bool)
        for d in drop:
            keep[d - seg_start] = False
        segments.append(arr[seg_start:end_][keep].tobytes())
        drop.clear()

    i = 0
    while i < len(ff):
        p = int(ff[i])
        nxt = int(arr[p + 1]) if p + 1 < len(arr) else 0xD9
        if nxt == 0x00:
            drop.append(p + 1)
            # consecutive 0xFF? the next 0xFF position is independent
        elif 0xD0 <= nxt <= 0xD7:
            flush(p)
            seg_start = p + 2
        else:  # a real marker (EOI / next scan) ends the entropy data
            flush(p)
            return segments
        i += 1
    flush(len(arr))
    return segments


class _BitReader:
    """Bit reader over pre-unstuffed entropy segments; `align_restart`
    advances to the next RSTn segment."""

    def __init__(self, segments: list[bytes]):
        self.segments = segments
        self.seg = 0
        self.data = segments[0] if segments else b""
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self, need: int):
        d = self.data
        n = len(d)
        while self.nbits < need:
            if self.pos < n:
                self.acc = (self.acc << 8) | d[self.pos]
                self.pos += 1
            else:
                self.acc <<= 8  # zero padding past segment end
            self.nbits += 8

    def peek16(self) -> int:
        if self.nbits < 16:
            self._fill(16)
        return (self.acc >> (self.nbits - 16)) & 0xFFFF

    def skip(self, n: int):
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        if self.nbits < n:
            self._fill(n)
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v

    def align_restart(self):
        """Jump to the start of the next restart segment."""
        self.seg += 1
        self.data = (self.segments[self.seg]
                     if self.seg < len(self.segments) else b"")
        self.pos = 0
        self.acc = 0
        self.nbits = 0


_HUFF_CACHE: dict = {}


def _huff_table(bits, vals) -> "_HuffTable":
    """LUT construction is ~40% of a small-image decode; identical (bits,
    vals) — e.g. the Annex-K tables every encoder here emits — hit a
    module-level cache."""
    key = (bytes(bits), bytes(vals))
    t = _HUFF_CACHE.get(key)
    if t is None:
        t = _HUFF_CACHE[key] = _HuffTable(bits, vals)
    return t


class _HuffTable:
    """Canonical Huffman with a 16-bit lookahead LUT: one list index per
    symbol instead of a per-bit tree walk."""

    def __init__(self, bits, vals):
        sym = np.zeros(1 << 16, dtype=np.int32)
        ln_ = np.zeros(1 << 16, dtype=np.int32)
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                lo = code << (16 - length)
                hi = (code + 1) << (16 - length)
                sym[lo:hi] = vals[k]
                ln_[lo:hi] = length
                code += 1
                k += 1
            code <<= 1
        self.sym = sym.tolist()
        self.len = ln_.tolist()

    def decode(self, br: _BitReader) -> int:
        v = br.peek16()
        length = self.len[v]
        if length == 0:
            raise ValueError("corrupt Huffman stream")
        br.skip(length)
        return self.sym[v]


def _extend(v: int, s: int) -> int:
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _decode_block(br: _BitReader, dc: _HuffTable, ac: _HuffTable,
                  pred: int) -> tuple[list, int]:
    """One 8x8 block's Huffman symbols -> zigzag coefficient list.

    The bit-reader state is manipulated locally (acc/nbits/pos as plain
    ints, LUTs as lists) — the entropy loop is the decoder's only serial
    hot path, and Python attribute/method dispatch per symbol costs more
    than the arithmetic itself (measured ~2x)."""
    out = [0] * 64
    acc, nbits = br.acc, br.nbits
    data, pos, n = br.data, br.pos, len(br.data)
    # DC symbol
    while nbits < 16:
        acc = (acc << 8) | data[pos] if pos < n else acc << 8
        pos += 1 if pos < n else 0
        nbits += 8
    v16 = (acc >> (nbits - 16)) & 0xFFFF
    s = dc.sym[v16]
    nbits -= dc.len[v16]
    if dc.len[v16] == 0:
        raise ValueError("corrupt Huffman stream")
    acc &= (1 << nbits) - 1
    if s:
        while nbits < s:
            acc = (acc << 8) | data[pos] if pos < n else acc << 8
            pos += 1 if pos < n else 0
            nbits += 8
        nbits -= s
        v = (acc >> nbits) & ((1 << s) - 1)
        acc &= (1 << nbits) - 1
        diff = v if v >= (1 << (s - 1)) else v - (1 << s) + 1
    else:
        diff = 0
    val = pred + diff
    out[0] = val
    asym, alen = ac.sym, ac.len
    k = 1
    while k < 64:
        while nbits < 16:
            acc = (acc << 8) | data[pos] if pos < n else acc << 8
            pos += 1 if pos < n else 0
            nbits += 8
        v16 = (acc >> (nbits - 16)) & 0xFFFF
        rs = asym[v16]
        ln = alen[v16]
        if ln == 0:
            raise ValueError("corrupt Huffman stream")
        nbits -= ln
        acc &= (1 << nbits) - 1
        s = rs & 0xF
        if s == 0:
            if rs == 0xF0:
                k += 16
                continue
            break  # EOB
        k += rs >> 4
        if k > 63:
            raise ValueError("corrupt AC run")
        while nbits < s:
            acc = (acc << 8) | data[pos] if pos < n else acc << 8
            pos += 1 if pos < n else 0
            nbits += 8
        nbits -= s
        v = (acc >> nbits) & ((1 << s) - 1)
        acc &= (1 << nbits) - 1
        out[k] = v if v >= (1 << (s - 1)) else v - (1 << s) + 1
        k += 1
    br.acc, br.nbits, br.pos = acc, nbits, pos
    return out, val


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JPEG bytes -> (H, W) gray or (H, W, 3) RGB uint8."""
    if data[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG payload")
    i = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], _HuffTable] = {}
    sof = None
    restart_interval = 0
    scan = None
    while i + 4 <= len(data):
        if data[i] != 0xFF:
            i += 1
            continue
        marker = data[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker == 0xD9:
            break
        seg_len = struct.unpack(">H", data[i + 2:i + 4])[0]
        body = data[i + 4:i + 2 + seg_len]
        if marker == 0xDB:
            j = 0
            while j < len(body):
                pq, tq = body[j] >> 4, body[j] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables not supported")
                zz = np.frombuffer(body, np.uint8, 64, j + 1).astype(np.float64)
                q = np.empty(64, dtype=np.float64)
                q[_ZZ] = zz
                qtabs[tq] = q
                j += 65
        elif marker == 0xC4:
            j = 0
            while j < len(body):
                cls, tid = body[j] >> 4, body[j] & 0xF
                bits = list(body[j + 1:j + 17])
                n = sum(bits)
                vals = list(body[j + 17:j + 17 + n])
                htabs[(cls, tid)] = _huff_table(bits, vals)
                j += 17 + n
        elif marker == 0xC0 or marker == 0xC1:
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for c in range(nc):
                cid, samp, tq = body[6 + c * 3:9 + c * 3]
                comps.append((cid, samp >> 4, samp & 0xF, tq))
            sof = (h, w, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError("only baseline sequential JPEG supported")
        elif marker == 0xDD:
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:
            ns = body[0]
            scan_comps = []
            for c in range(ns):
                cid, tt = body[1 + c * 2:3 + c * 2]
                scan_comps.append((cid, tt >> 4, tt & 0xF))
            scan = (scan_comps, i + 2 + seg_len)
            break
        i += 2 + seg_len
    if sof is None or scan is None:
        raise ValueError("missing SOF/SOS")
    h, w, comps = sof
    scan_comps, entropy_pos = scan
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if hmax not in (1, 2) or vmax not in (1, 2):
        raise ValueError("luma sampling factors must be 1 or 2")
    for cid, ch, cv, _ in comps[1:]:
        if (ch, cv) != (1, 1):
            raise ValueError("chroma sampling must be 1x1")
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (w + mcu_w - 1) // mcu_w
    mcus_y = (h + mcu_h - 1) // mcu_h

    planes = {}
    for cid, ch, cv, _ in comps:
        pw = mcus_x * 8 * ch
        ph = mcus_y * 8 * cv
        planes[cid] = np.zeros(((ph // 8) * (pw // 8), 64), dtype=np.int32)

    br = _BitReader(_split_entropy(data, entropy_pos))
    preds = {cid: 0 for cid, *_ in comps}
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                br.align_restart()
                preds = {cid: 0 for cid, *_ in comps}
            for (cid, ch, cv, _), (scid, dct_, act_) in zip(comps, scan_comps):
                dc = htabs[(0, dct_)]
                ac = htabs[(1, act_)]
                bw_ = mcus_x * ch
                for by in range(cv):
                    for bx in range(ch):
                        blk, preds[cid] = _decode_block(br, dc, ac, preds[cid])
                        idx = (my * cv + by) * bw_ + mx * ch + bx
                        planes[cid][idx] = blk
            mcu_count += 1

    # synthesis via the shared half
    coeffs, qts, shapes = [], [], []
    for cid, ch, cv, tq in comps:
        pw = mcus_x * 8 * ch
        ph = mcus_y * 8 * cv
        rm = np.empty((len(planes[cid]), 64), dtype=np.int32)
        rm[:, _ZZ] = planes[cid]
        coeffs.append(rm.reshape(-1, 8, 8))
        qts.append(qtabs[tq].reshape(8, 8))
        shapes.append((ph, pw))
    gray = len(comps) == 1
    sub = {v: k for k, v in _SUB_FACTORS.items()}[(hmax, vmax)]
    return _synthesize(coeffs, qts, shapes, (h, w), gray, "444" if gray else sub)
