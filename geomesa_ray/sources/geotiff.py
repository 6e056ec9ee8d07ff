"""Pure-numpy GeoTIFF reader/writer (public specs: TIFF 6.0 + the OGC
GeoTIFF georeferencing tags).

Supports the baseline raster shapes a geospatial pipeline ingests:
- little- and big-endian classic TIFF, strip-organized
- compression: none (1), LZW (5, MSB-first with early-change code widths,
  horizontal-differencing predictor 2), PackBits (32773)
- 8-bit grayscale and RGB (SamplesPerPixel 1/3)
- georeferencing from ModelPixelScale (33550) + ModelTiepoint (33922):
  north-up affine (origin = top-left corner), the form every GDAL-written
  north-up GeoTIFF uses

``decode_geotiff`` returns (array, transform) where transform is
(origin_x, origin_y, pixel_w, pixel_h) and the geographic center of pixel
(row, col) is (origin_x + (col+0.5)*pixel_w, origin_y - (row+0.5)*pixel_h).

The reference has no raster codec of its own (it renders density grids and
stores blobs); this closes the raster->vector ingest direction of the
"raster-to-vector tile assignment" target with a REAL file format.
"""

from __future__ import annotations

import struct

import numpy as np

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 11: 4, 12: 8}


def _read_ifd(data: bytes, bo: str):
    off = struct.unpack(bo + "I", data[4:8])[0]
    n = struct.unpack(bo + "H", data[off:off + 2])[0]
    tags = {}
    for k in range(n):
        e = off + 2 + 12 * k
        tag, typ, cnt = struct.unpack(bo + "HHI", data[e:e + 8])
        size = _TYPE_SIZE.get(typ, 1) * cnt
        if size <= 4:
            raw = data[e + 8:e + 8 + size]
        else:
            voff = struct.unpack(bo + "I", data[e + 8:e + 12])[0]
            raw = data[voff:voff + size]
        if typ == 3:
            vals = list(struct.unpack(bo + "H" * cnt, raw))
        elif typ == 4:
            vals = list(struct.unpack(bo + "I" * cnt, raw))
        elif typ == 1:
            vals = list(raw)
        elif typ == 12:
            vals = list(struct.unpack(bo + "d" * cnt, raw))
        elif typ == 11:
            vals = list(struct.unpack(bo + "f" * cnt, raw))
        elif typ == 5:
            parts = struct.unpack(bo + "I" * (2 * cnt), raw)
            vals = [parts[2 * i] / max(parts[2 * i + 1], 1) for i in range(cnt)]
        else:
            vals = [raw]
        tags[tag] = vals
    return tags


def _lzw_decode_tiff(data: bytes, n_out: int) -> np.ndarray:
    """TIFF LZW (MSB-first, clear 256 / EOI 257, EARLY width change at
    table size 2^w - 1). Same vectorized-gather + bytes-dictionary shape
    as the GIF decoder (stages/gifbmp.py)."""
    bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8)).astype(np.int32)
    pow2 = 1 << np.arange(12, dtype=np.int32)[::-1]  # MSB first
    base = [bytes([i]) for i in range(256)] + [b"", b""]
    entries = list(base)
    out: list[bytes] = []
    n = 0
    prev: bytes | None = None
    pos = 0
    width = 9
    while n < n_out:
        # the decoder's table lags the encoder's by ONE entry, so with
        # TIFF's early change (encoder bumps at next_code == 2^w - 1) the
        # decoder bumps when its table reaches 2^w - 2
        room = ((4096 if width == 12
                 else ((1 << width) - 2) - len(entries))
                + (1 if prev is None else 0))
        n_fit = (len(bits) - pos) // width
        n_codes = min(max(room, 1), n_fit, n_out - n + 1)
        if n_codes <= 0:
            break
        gw = width
        idx = pos + np.arange(n_codes, dtype=np.int64)[:, None] * gw
        codes = (bits[idx + np.arange(gw, dtype=np.int64)[None, :]]
                 @ pow2[12 - gw:]).tolist()
        consumed = 0
        stop = False
        for code in codes:
            consumed += 1
            if code == 256:
                rewidth = width != 9
                entries = list(base)
                width = 9
                prev = None
                if rewidth:
                    break
                continue
            if code == 257:
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
                raise ValueError("corrupt TIFF LZW stream")
            out.append(s)
            n += len(s)
            prev = s
            if width < 12 and len(entries) == (1 << width) - 2:
                width += 1
                break
            if n >= n_out:
                break
        pos += consumed * gw
        if stop:
            break
    flat = np.frombuffer(b"".join(out), dtype=np.uint8)
    return flat[:n_out].copy()


def _lzw_encode_tiff(data: np.ndarray) -> bytes:
    """TIFF LZW encoder (early change, MSB-first) for fixtures/export."""
    table: dict = {(-1, i): i for i in range(256)}
    next_code = 258
    width = 9
    acc = 0
    nbits = 0
    out = bytearray()

    def emit(code: int):
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)
            acc &= (1 << nbits) - 1

    emit(256)
    prev = -1
    for v in data.tolist():
        key = (prev, v)
        if key in table:
            prev = table[key]
            continue
        emit(prev)
        table[key] = next_code
        next_code += 1
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
        if next_code >= 4094:
            emit(256)
            table = {(-1, i): i for i in range(256)}
            next_code = 258
            width = 9
        prev = table[(-1, v)]
    if prev >= 0:
        emit(prev)
    emit(257)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def _packbits_decode(data: bytes, n_out: int) -> np.ndarray:
    out = np.empty(n_out, dtype=np.uint8)
    i = 0
    n = 0
    while n < n_out and i < len(data):
        h = data[i]
        i += 1
        if h < 128:  # literal run of h+1 bytes
            k = h + 1
            out[n:n + k] = np.frombuffer(data, np.uint8, k, i)
            i += k
            n += k
        elif h > 128:  # repeat next byte 257-h times
            k = 257 - h
            out[n:n + k] = data[i]
            i += 1
            n += k
        # h == 128: no-op
    return out


def _packbits_encode(row: np.ndarray) -> bytes:
    """Simple PackBits: repeat runs >= 3 as fills, rest as literals."""
    out = bytearray()
    i = 0
    n = len(row)
    while i < n:
        run = 1
        while i + run < n and row[i + run] == row[i] and run < 128:
            run += 1
        if run >= 3:
            out += bytes([257 - run, int(row[i])])
            i += run
        else:
            j = i + run
            while j < n and run < 128:
                nxt = 1
                while j + nxt < n and row[j + nxt] == row[j] and nxt < 3:
                    nxt += 1
                if nxt >= 3:
                    break
                j += nxt
                run = j - i
            k = min(j - i, 128)
            out += bytes([k - 1]) + row[i:i + k].tobytes()
            i += k
    return bytes(out)


def decode_geotiff(data: bytes):
    """GeoTIFF bytes -> ((H, W) or (H, W, C) array,
    (origin_x, origin_y, pixel_w, pixel_h) or None).

    Sample types: uint8 / uint16 / float32 (SampleFormat 1 or 3) — the DEM
    shapes. Layout: strips OR tiles (TileWidth/TileLength 322/323)."""
    if data[:2] == b"II" and data[2:4] == b"*\x00":
        bo = "<"
    elif data[:2] == b"MM" and data[2:4] == b"\x00*":
        bo = ">"
    else:
        raise ValueError("not a classic TIFF payload")
    tags = _read_ifd(data, bo)
    w = tags[256][0]
    h = tags[257][0]
    spp = tags.get(277, [1])[0]
    bps = tags.get(258, [8])
    fmt = tags.get(339, [1])[0]
    depth = bps[0]
    if any(b != depth for b in bps):
        raise ValueError("mixed bits-per-sample not supported")
    if (depth, fmt) == (8, 1):
        dtype = np.dtype(np.uint8)
    elif (depth, fmt) == (16, 1):
        dtype = np.dtype(bo + "u2")
    elif (depth, fmt) == (32, 3):
        dtype = np.dtype(bo + "f4")
    else:
        raise ValueError(f"unsupported sample type ({depth} bits, format {fmt})")
    comp = tags.get(259, [1])[0]
    predictor = tags.get(317, [1])[0]
    bpp = depth // 8

    def decompress(blob: bytes, n_bytes: int) -> np.ndarray:
        if comp == 1:
            return np.frombuffer(blob, np.uint8, n_bytes)
        if comp == 5:
            return _lzw_decode_tiff(blob, n_bytes)
        if comp == 32773:
            return _packbits_decode(blob, n_bytes)
        raise ValueError(f"unsupported TIFF compression {comp}")

    def unpredict(block: np.ndarray, bw: int):
        """Horizontal differencing on SAMPLE values (spec: per channel)."""
        if predictor != 2:
            return block
        if dtype.kind == "f":
            raise ValueError("predictor 2 is invalid for float samples")
        lanes = block.reshape(block.shape[0], bw, spp)
        np.add.accumulate(lanes, axis=1, dtype=lanes.dtype, out=lanes)
        return block

    if 322 in tags:  # tiled layout
        tw, th = tags[322][0], tags[323][0]
        offs, cnts = tags[324], tags[325]
        tiles_x = (w + tw - 1) // tw
        img = np.empty((h, w * spp), dtype=dtype)
        for t_i, (o, c) in enumerate(zip(offs, cnts)):
            ty, tx = divmod(t_i, tiles_x)
            n_bytes = th * tw * spp * bpp
            rows = decompress(data[o:o + c], n_bytes)
            tile = np.frombuffer(rows.tobytes(), dtype=dtype).reshape(th, tw * spp)
            tile = unpredict(tile.copy(), tw)
            r1 = min((ty + 1) * th, h)
            c1 = min((tx + 1) * tw, w)
            img[ty * th:r1, tx * tw * spp:c1 * spp] = \
                tile[: r1 - ty * th, : (c1 - tx * tw) * spp]
    else:
        rows_per_strip = tags.get(278, [h])[0]
        offs, cnts = tags[273], tags[279]
        img = np.empty((h, w * spp), dtype=dtype)
        for s, (o, c) in enumerate(zip(offs, cnts)):
            r0 = s * rows_per_strip
            r1 = min(r0 + rows_per_strip, h)
            n_bytes = (r1 - r0) * w * spp * bpp
            rows = decompress(data[o:o + c], n_bytes)
            strip = np.frombuffer(rows.tobytes(), dtype=dtype).reshape(r1 - r0, w * spp)
            img[r0:r1] = unpredict(strip.copy(), w)
    out = img.reshape(h, w, spp)
    if spp == 1:
        out = out[:, :, 0]
    transform = None
    if 33550 in tags and 33922 in tags:
        sx, sy = tags[33550][0], tags[33550][1]
        tp = tags[33922]  # (i, j, k, x, y, z): raster point -> model point
        origin_x = tp[3] - tp[0] * sx
        origin_y = tp[4] + tp[1] * sy
        transform = (origin_x, origin_y, sx, sy)
    return out, transform


def encode_geotiff(img: np.ndarray, origin_x: float = 0.0,
                   origin_y: float = 0.0, pixel_w: float = 1.0,
                   pixel_h: float = 1.0, compression: int = 1,
                   predictor: int = 1, rows_per_strip: int = 8,
                   tile: int | None = None) -> bytes:
    """(H, W[, C]) uint8 / uint16 / float32 + north-up georeferencing ->
    GeoTIFF bytes (little-endian; strips, or square tiles of side ``tile``)."""
    img = np.asarray(img)
    if img.dtype == np.uint8:
        depth, fmt = 8, 1
    elif img.dtype == np.uint16:
        depth, fmt = 16, 1
        img = img.astype("<u2")
    elif img.dtype == np.float32:
        depth, fmt = 32, 3
        img = img.astype("<f4")
        if predictor == 2:
            raise ValueError("predictor 2 is invalid for float samples")
    else:
        raise ValueError("dtype must be uint8 / uint16 / float32")
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, spp = img.shape

    def predict(block: np.ndarray) -> np.ndarray:
        """block (rh, bw, spp) -> differenced byte rows (rh, bw*spp*bpp)."""
        if predictor == 2:
            wide = block.astype(np.int64)
            wide[:, 1:] -= block[:, :-1].astype(np.int64)
            mask = (1 << depth) - 1
            block = (wide & mask).astype(img.dtype)
        return np.ascontiguousarray(block).reshape(block.shape[0], -1) \
            .view(np.uint8)

    def compress(rows: np.ndarray) -> bytes:
        flat = rows.reshape(-1)
        if compression == 1:
            return flat.tobytes()
        if compression == 5:
            return _lzw_encode_tiff(flat)
        if compression == 32773:
            return b"".join(_packbits_encode(r) for r in rows)
        raise ValueError("compression must be 1 / 5 / 32773")

    strips = []
    if tile:
        tiles_x = (w + tile - 1) // tile
        tiles_y = (h + tile - 1) // tile
        for ty in range(tiles_y):
            for tx in range(tiles_x):
                block = np.zeros((tile, tile, spp), dtype=img.dtype)
                sub = img[ty * tile:(ty + 1) * tile, tx * tile:(tx + 1) * tile]
                block[: sub.shape[0], : sub.shape[1]] = sub
                strips.append(compress(predict(block)))
    else:
        for r0 in range(0, h, rows_per_strip):
            strips.append(compress(predict(img[r0:r0 + rows_per_strip])))

    entries = []  # (tag, type, count, values)
    n_strips = len(strips)
    entries.append((256, 4, 1, [w]))
    entries.append((257, 4, 1, [h]))
    entries.append((258, 3, spp, [depth] * spp))
    entries.append((259, 3, 1, [compression]))
    entries.append((262, 3, 1, [2 if spp == 3 else 1]))
    entries.append((277, 3, 1, [spp]))
    if tile:
        entries.append((322, 4, 1, [tile]))
        entries.append((323, 4, 1, [tile]))
    else:
        entries.append((278, 4, 1, [rows_per_strip]))
    if fmt != 1:
        entries.append((339, 3, spp, [fmt] * spp))
    if predictor == 2:
        entries.append((317, 3, 1, [2]))
    entries.append((33550, 12, 3, [pixel_w, pixel_h, 0.0]))
    entries.append((33922, 12, 6, [0.0, 0.0, 0.0, origin_x, origin_y, 0.0]))

    # layout: header (8) + IFD + external values + strip data
    n_tags = len(entries) + 2  # + StripOffsets + StripByteCounts
    ifd_off = 8
    ifd_size = 2 + 12 * n_tags + 4
    ext = bytearray()
    ext_base = ifd_off + ifd_size

    def pack_vals(typ, vals):
        fmt = {3: "H", 4: "I", 12: "d"}[typ]
        return struct.pack("<" + fmt * len(vals), *vals)

    fixed = []
    for tag, typ, cnt, vals in entries:
        body = pack_vals(typ, vals)
        if len(body) <= 4:
            fixed.append((tag, typ, cnt, body.ljust(4, b"\x00")))
        else:
            fixed.append((tag, typ, cnt,
                          struct.pack("<I", ext_base + len(ext))))
            ext += body
    # strip/tile tables go in ext too
    off_tag, cnt_tag = (324, 325) if tile else (273, 279)
    strip_off_pos = ext_base + len(ext)
    ext += b"\x00" * (4 * n_strips)  # placeholder offsets table
    fixed.append((off_tag, 4, n_strips,
                  struct.pack("<I", strip_off_pos) if n_strips > 1
                  else b"\x00\x00\x00\x00"))
    cnt_body = struct.pack("<" + "I" * n_strips, *[len(s) for s in strips])
    if len(cnt_body) <= 4:
        fixed.append((cnt_tag, 4, n_strips, cnt_body.ljust(4, b"\x00")))
    else:
        fixed.append((cnt_tag, 4, n_strips,
                      struct.pack("<I", ext_base + len(ext))))
        ext += cnt_body

    data_base = ext_base + len(ext)
    offsets = []
    pos = data_base
    for s in strips:
        offsets.append(pos)
        pos += len(s)
    if n_strips == 1:
        for i, (tag, typ, cnt, body) in enumerate(fixed):
            if tag == off_tag:
                fixed[i] = (tag, typ, cnt, struct.pack("<I", offsets[0]))
    else:
        off_body = struct.pack("<" + "I" * n_strips, *offsets)
        ext[strip_off_pos - ext_base:strip_off_pos - ext_base + len(off_body)] = off_body

    fixed.sort(key=lambda e: e[0])  # TIFF requires ascending tag order
    out = bytearray(b"II*\x00" + struct.pack("<I", ifd_off))
    out += struct.pack("<H", n_tags)
    for tag, typ, cnt, body in fixed:
        out += struct.pack("<HHI", tag, typ, cnt) + body
    out += b"\x00\x00\x00\x00"  # no next IFD
    out += ext
    for s in strips:
        out += s
    return bytes(out)
