"""Pure-numpy video containers: YUV4MPEG2 (Y4M) and MJPEG-in-AVI.

Y4M is an uncompressed interchange format (plain-text header + raw YCbCr
planes per frame) and AVI/MJPEG is a RIFF container whose frames are
baseline JPEGs — both decodable here with numpy + the in-repo JPEG codec
(stages/jpeg.py). That makes frame-sampling a REAL decode path rather than
a stub: the engine's multimodal pipeline samples every Nth frame, decodes
it, and feature-extracts it like any still image.

Supported: Y4M C420 (jpeg/mpeg2/paldv tag variants, all treated as
centered 4:2:0 box) and C444; AVI 'movi' lists with '00dc'/'00db' JPEG
chunks (the standard MJPEG layout), including the odd-byte RIFF padding.
"""

from __future__ import annotations

import struct

import numpy as np


def _yuv_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    from geomesa_ray.stages.jpeg import _ycbcr_to_rgb

    if cb.shape != y.shape:  # 4:2:0 -> replicate
        cb = np.repeat(np.repeat(cb, 2, axis=0), 2, axis=1)[: y.shape[0], : y.shape[1]]
        cr = np.repeat(np.repeat(cr, 2, axis=0), 2, axis=1)[: y.shape[0], : y.shape[1]]
    return _ycbcr_to_rgb(np.dstack([y.astype(np.float64),
                                    cb.astype(np.float64),
                                    cr.astype(np.float64)]))


# ----------------------------------------------------------------- Y4M --

def decode_y4m_frames(data: bytes, sample_every: int = 1,
                      max_frames: int | None = None):
    """Y4M bytes -> (frames, width, height, n_frames_total); frames is a
    list of (H, W, 3) uint8 RGB taken every ``sample_every`` frames."""
    nl = data.find(b"\n")
    if nl < 0 or not data.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 payload")
    w = h = None
    fmt = "420"
    for tok in data[9:nl].split():
        t = tok.decode("ascii", "replace")
        if t.startswith("W"):
            w = int(t[1:])
        elif t.startswith("H"):
            h = int(t[1:])
        elif t.startswith("C"):
            fmt = "444" if t[1:].startswith("444") else "420"
    if not w or not h:
        raise ValueError("Y4M header missing W/H")
    if fmt == "420":
        fsize = w * h + 2 * ((w + 1) // 2) * ((h + 1) // 2)
        cw, ch_ = (w + 1) // 2, (h + 1) // 2
    else:
        fsize = 3 * w * h
        cw, ch_ = w, h
    i = nl + 1
    frames = []
    n_total = 0
    while i < len(data):
        nl2 = data.find(b"\n", i)
        if nl2 < 0 or not data[i:i + 5] == b"FRAME":
            break
        i = nl2 + 1
        if i + fsize > len(data):
            break
        if n_total % sample_every == 0 and (max_frames is None
                                            or len(frames) < max_frames):
            y = np.frombuffer(data, np.uint8, w * h, i).reshape(h, w)
            cb = np.frombuffer(data, np.uint8, cw * ch_, i + w * h).reshape(ch_, cw)
            cr = np.frombuffer(data, np.uint8, cw * ch_,
                               i + w * h + cw * ch_).reshape(ch_, cw)
            frames.append(_yuv_to_rgb(y, cb, cr))
        n_total += 1
        i += fsize
    return frames, w, h, n_total


def encode_y4m(frames_rgb: list[np.ndarray], fps: int = 25,
               fmt: str = "420") -> bytes:
    """RGB frames -> Y4M bytes (fixture generator / export)."""
    from geomesa_ray.stages.jpeg import _rgb_to_ycbcr

    h, w = frames_rgb[0].shape[:2]
    tag = "C420jpeg" if fmt == "420" else "C444"
    out = bytearray(f"YUV4MPEG2 W{w} H{h} F{fps}:1 Ip A1:1 {tag}\n".encode())
    for f in frames_rgb:
        ycc = _rgb_to_ycbcr(np.asarray(f, dtype=np.uint8)).astype(np.uint8)
        y, cb, cr = ycc[:, :, 0], ycc[:, :, 1], ycc[:, :, 2]
        if fmt == "420":
            ph, pw = (h + 1) // 2 * 2, (w + 1) // 2 * 2
            cbp = np.pad(cb, ((0, ph - h), (0, pw - w)), mode="edge").astype(np.float64)
            crp = np.pad(cr, ((0, ph - h), (0, pw - w)), mode="edge").astype(np.float64)
            cb = np.round(cbp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))).astype(np.uint8)
            cr = np.round(crp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))).astype(np.uint8)
        out += b"FRAME\n" + y.tobytes() + cb.tobytes() + cr.tobytes()
    return bytes(out)


# ----------------------------------------------------------- AVI/MJPEG --

def decode_avi_mjpeg_frames(data: bytes, sample_every: int = 1,
                            max_frames: int | None = None):
    """AVI bytes -> (frames, width, height, n_frames_total); '00dc'/'00db'
    chunks are decoded with the in-repo baseline JPEG decoder."""
    from geomesa_ray.stages.jpeg import decode_jpeg

    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    frames = []
    w = h = None
    n_total = 0

    def walk(pos: int, end: int):
        nonlocal n_total, w, h
        while pos + 8 <= end:
            cid = data[pos:pos + 4]
            size = struct.unpack("<I", data[pos + 4:pos + 8])[0]
            body_start = pos + 8
            if cid == b"LIST":
                walk(body_start + 4, body_start + size)
            elif cid[2:4] in (b"dc", b"db") and size > 2:
                blob = data[body_start:body_start + size]
                if blob[:2] == b"\xFF\xD8":
                    if n_total % sample_every == 0 and (
                            max_frames is None or len(frames) < max_frames):
                        img = decode_jpeg(blob)
                        if img.ndim == 2:
                            img = np.repeat(img[:, :, None], 3, axis=2)
                        frames.append(img)
                        h, w = img.shape[:2]
                    n_total += 1
            elif cid == b"strf" and size >= 24 and w is None:
                bw, bh = struct.unpack("<ii", data[body_start + 4:body_start + 12])
                w, h = bw, abs(bh)
            pos = body_start + size + (size & 1)

    walk(12, len(data))
    return frames, w, h, n_total


def encode_avi_mjpeg(frames_rgb: list[np.ndarray], fps: int = 25,
                     quality: int = 85) -> bytes:
    """RGB frames -> minimal MJPEG AVI (hdrl + movi; enough structure for
    any MJPEG-capable reader)."""
    from geomesa_ray.stages.jpeg import encode_jpeg

    h, w = frames_rgb[0].shape[:2]
    jpgs = [encode_jpeg(np.asarray(f, dtype=np.uint8), quality) for f in frames_rgb]

    def chunk(cid: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return cid + struct.pack("<I", len(body)) + body + pad

    def lst(tag: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", tag + body)

    avih = struct.pack("<IIIIIIIIIIIIII", 1000000 // fps, 0, 0, 0x10,
                       len(jpgs), 0, 1, 0, w, h, 0, 0, 0, 0)
    strh = (b"vids" + b"MJPG" + struct.pack("<IHHIIIIIIIII", 0, 0, 0, 0, 1,
                                            fps, 0, len(jpgs), 0, 0, 0, 0))
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                       w * h * 3, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00dc", j) for j in jpgs))
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


# ------------------------------------------------------- frame sampling --

def video_frame_features(data: bytes, dim: int = 64, sample_every: int = 1,
                         max_frames: int = 16):
    """Decode a video payload (Y4M or MJPEG-AVI), sample frames, return
    (features (dim,) float32 over the mean sampled frame, width, height,
    n_frames_total, px_sum over sampled frames)."""
    from geomesa_ray.stages.codecs import image_features

    if data.startswith(b"YUV4MPEG2"):
        frames, w, h, n = decode_y4m_frames(data, sample_every, max_frames)
    elif data[:4] == b"RIFF" and data[8:12] == b"AVI ":
        frames, w, h, n = decode_avi_mjpeg_frames(data, sample_every, max_frames)
    else:
        raise ValueError("unknown video container")
    if not frames:
        raise ValueError("video with no frames")
    px_sum = int(sum(f.astype(np.int64).sum() for f in frames))
    mean = np.mean([f.astype(np.float64) for f in frames], axis=0)
    grid = max(2, int(np.sqrt(dim)))
    feats = image_features(mean, grid=grid)[:dim]
    return feats, w, h, n, px_sum
