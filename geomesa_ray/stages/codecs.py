"""Pure-numpy media codecs: PPM/PGM images, WAV audio.

The container has no image/audio libraries, but these formats are plain
byte layouts (public specs: netpbm P5/P6, RIFF/WAVE PCM), so REAL decode —
not a stub — is possible with numpy alone. They are the engine's native
media formats; compressed formats (jpeg/png/mp3) remain the documented
stub in ``stages/media.py``.

Feature kernels mirror what a real pipeline computes before embedding:
- images: grayscale 8x8 block-mean thumbnail, flattened + normalized.
- audio: per-window RMS energy envelope.
"""

from __future__ import annotations

import struct

import numpy as np


def decode_ppm(data: bytes) -> np.ndarray:
    """netpbm P6 (RGB) / P5 (gray) binary -> (H, W, 3) or (H, W) uint8."""
    if not data.startswith((b"P6", b"P5")):
        raise ValueError("not a binary PPM/PGM (P6/P5) payload")
    color = data.startswith(b"P6")
    # header: magic, width, height, maxval — whitespace/comment separated
    tokens: list[bytes] = []
    i = 2
    while len(tokens) < 3:
        while i < len(data) and data[i : i + 1].isspace():
            i += 1
        if data[i : i + 1] == b"#":
            while i < len(data) and data[i : i + 1] != b"\n":
                i += 1
            continue
        start = i
        while i < len(data) and not data[i : i + 1].isspace():
            i += 1
        tokens.append(data[start:i])
    i += 1  # single whitespace after maxval
    w, h, maxval = int(tokens[0]), int(tokens[1]), int(tokens[2])
    if maxval > 255:
        raise ValueError("16-bit netpbm not supported")
    n = w * h * (3 if color else 1)
    px = np.frombuffer(data, dtype=np.uint8, count=n, offset=i)
    return px.reshape(h, w, 3) if color else px.reshape(h, w)


def encode_ppm(img: np.ndarray) -> bytes:
    """(H, W[, 3]) uint8 -> P6/P5 bytes (test-fixture generator)."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 3:
        head = f"P6 {img.shape[1]} {img.shape[0]} 255\n".encode()
    else:
        head = f"P5 {img.shape[1]} {img.shape[0]} 255\n".encode()
    return head + img.tobytes()


def image_features(img: np.ndarray, grid: int = 8) -> np.ndarray:
    """Grayscale block-mean thumbnail features, (grid*grid,) float32 in
    [0, 1] (the resize/feature-extract step of the multimodal pipeline)."""
    img = np.asarray(img, dtype=np.float64)
    if img.ndim == 3:
        img = img.mean(axis=2)
    h, w = img.shape
    ys = np.linspace(0, h, grid + 1).astype(np.int64)
    xs = np.linspace(0, w, grid + 1).astype(np.int64)
    out = np.empty((grid, grid), dtype=np.float64)
    for r in range(grid):
        for c in range(grid):
            block = img[ys[r]:max(ys[r + 1], ys[r] + 1), xs[c]:max(xs[c + 1], xs[c] + 1)]
            out[r, c] = block.mean()
    return (out.ravel() / 255.0).astype(np.float32)


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE -> ((n_samples, channels) int16, sample_rate).

    Format tags: 0x0001 PCM16, 0x0006 A-law, 0x0007 mu-law, 0x0011 IMA
    ADPCM (compressed tags decode through stages/audio.py — pure numpy)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    i = 12
    audio_fmt = channels = rate = block_align = None
    raw = None
    n_samples = None
    while i + 8 <= len(data):
        cid = data[i:i + 4]
        size = struct.unpack("<I", data[i + 4:i + 8])[0]
        body = data[i + 8:i + 8 + size]
        if cid == b"fmt ":
            audio_fmt, channels, rate = struct.unpack("<HHI", body[:8])
            block_align = struct.unpack("<H", body[12:14])[0]
            bits = struct.unpack("<H", body[14:16])[0]
            if audio_fmt == 1 and bits != 16:
                raise ValueError("only 16-bit PCM WAV supported")
        elif cid == b"fact":
            n_samples = struct.unpack("<I", body[:4])[0]
        elif cid == b"data":
            raw = bytes(body)
        i += 8 + size + (size & 1)
    if audio_fmt is None or raw is None:
        raise ValueError("missing fmt/data chunk")
    if audio_fmt == 1:
        samples = np.frombuffer(raw, dtype="<i2").reshape(-1, channels)
    elif audio_fmt in (6, 7):
        from geomesa_ray.stages.audio import alaw_decode, ulaw_decode

        dec = ulaw_decode if audio_fmt == 7 else alaw_decode
        samples = dec(np.frombuffer(raw, dtype=np.uint8)).reshape(-1, channels)
    elif audio_fmt == 0x11:
        from geomesa_ray.stages.audio import adpcm_decode_blocks

        samples = adpcm_decode_blocks(raw, channels, block_align, n_samples)
    else:
        raise ValueError(f"unsupported WAV format tag 0x{audio_fmt:04x}")
    return samples, int(rate)


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """(n, channels) int16 -> minimal PCM16 WAV bytes (test fixtures)."""
    samples = np.asarray(samples, dtype="<i2")
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    body = samples.tobytes()
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * ch * 2, ch * 2, 16)
    out = (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(body)) + b"WAVE"
           + b"fmt " + struct.pack("<I", len(fmt)) + fmt
           + b"data" + struct.pack("<I", len(body)) + body)
    return out


def encode_wav_compressed(samples: np.ndarray, rate: int = 8000,
                          codec: str = "ulaw",
                          block_align: int = 1024) -> bytes:
    """(n[, channels]) int16 -> compressed WAV (mu-law / A-law / IMA
    ADPCM). Fixture generator + export path for the compressed tags
    ``decode_wav`` reads."""
    from geomesa_ray.stages.audio import (adpcm_encode_blocks, alaw_encode,
                                          ulaw_encode)

    samples = np.asarray(samples, dtype=np.int16)
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    if codec in ("ulaw", "alaw"):
        tag = 7 if codec == "ulaw" else 6
        enc = ulaw_encode if codec == "ulaw" else alaw_encode
        body = enc(samples.reshape(-1)).tobytes()
        ba, bits = ch, 8
    elif codec == "adpcm":
        tag, bits, ba = 0x11, 4, block_align
        body = adpcm_encode_blocks(samples, block_align)
    else:
        raise ValueError("codec must be ulaw / alaw / adpcm")
    fmt = struct.pack("<HHIIHH", tag, ch, rate, rate * ba, ba, bits)
    fact = struct.pack("<I", n)
    out = (b"RIFF"
           + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(fact) + 8 + len(body))
           + b"WAVE"
           + b"fmt " + struct.pack("<I", len(fmt)) + fmt
           + b"fact" + struct.pack("<I", len(fact)) + fact
           + b"data" + struct.pack("<I", len(body)) + body)
    return out


def audio_features(samples: np.ndarray, dim: int = 64) -> np.ndarray:
    """Per-window RMS energy envelope, (dim,) float32 in [0, 1]."""
    x = np.asarray(samples, dtype=np.float64)
    if x.ndim == 2:
        x = x.mean(axis=1)
    edges = np.linspace(0, len(x), dim + 1).astype(np.int64)
    out = np.empty(dim, dtype=np.float64)
    for i in range(dim):
        seg = x[edges[i]:max(edges[i + 1], edges[i] + 1)]
        out[i] = np.sqrt((seg * seg).mean())
    return (out / 32768.0).astype(np.float32)
