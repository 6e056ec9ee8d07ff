"""Pure-numpy compressed-audio codecs: G.711 mu-law / A-law companding and
IMA ADPCM (public specs: ITU-T G.711, IMA ADPCM as carried in RIFF/WAVE
format tags 0x0007 / 0x0006 / 0x0011).

G.711 is a pure 256-entry table lookup both ways — fully vectorized.
IMA ADPCM has a serial predictor WITHIN a block (true data dependence) but
blocks are independent, so decode loops over the <=505 sample positions of
a block while staying vectorized ACROSS all blocks x channels — the loop
count is fixed by block_align, not by recording length.
"""

from __future__ import annotations

import numpy as np

# ------------------------------------------------------------- G.711 ----


def _ulaw_decode_table() -> np.ndarray:
    u = (np.arange(256, dtype=np.int32) ^ 0xFF)
    sign = u & 0x80
    exp = (u >> 4) & 7
    mant = u & 0xF
    mag = (((mant << 3) + 0x84) << exp) - 0x84
    return np.where(sign, -mag, mag).astype(np.int16)


def _alaw_decode_table() -> np.ndarray:
    u = np.arange(256, dtype=np.int32) ^ 0x55
    sign = u & 0x80  # A-law: sign bit SET means positive
    exp = (u >> 4) & 7
    mant = u & 0xF
    mag = np.where(exp == 0, (mant << 4) + 8,
                   ((mant << 4) + 0x108) << np.maximum(exp - 1, 0))
    return np.where(sign, mag, -mag).astype(np.int16)


_ULAW = _ulaw_decode_table()
_ALAW = _alaw_decode_table()


def ulaw_decode(codes: np.ndarray) -> np.ndarray:
    """uint8 mu-law codes -> int16 linear PCM (CCITT table, max 32124)."""
    return _ULAW[np.asarray(codes, dtype=np.uint8)]


def alaw_decode(codes: np.ndarray) -> np.ndarray:
    """uint8 A-law codes -> int16 linear PCM (max 32256)."""
    return _ALAW[np.asarray(codes, dtype=np.uint8)]


def ulaw_encode(pcm: np.ndarray) -> np.ndarray:
    """int16 linear PCM -> uint8 mu-law codes (vectorized G.711 encoder)."""
    x = np.asarray(pcm, dtype=np.int32)
    sign = np.where(x < 0, 0x80, 0)
    mag = np.minimum(np.abs(x), 32635) + 0x84
    exp = (np.log2(mag).astype(np.int32) - 7).clip(0, 7)
    mant = (mag >> (exp + 3)) & 0xF
    return ((sign | (exp << 4) | mant) ^ 0xFF).astype(np.uint8)


def alaw_encode(pcm: np.ndarray) -> np.ndarray:
    """int16 linear PCM -> uint8 A-law codes."""
    x = np.asarray(pcm, dtype=np.int32)
    sign = np.where(x >= 0, 0xD5, 0x55)
    mag = np.minimum(np.where(x >= 0, x, -x - 1), 32767)
    # segment = position of the highest bit above bit 7 (seg 0 if < 0x100)
    seg = np.maximum((np.log2(np.maximum(mag, 1)).astype(np.int32) - 7), 0).clip(0, 7)
    mant = np.where(seg == 0, mag >> 4, (mag >> (seg + 3)) & 0xF)
    return (((seg << 4) | mant) ^ sign).astype(np.uint8)


# --------------------------------------------------------- IMA ADPCM ----

_STEP_TABLE = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767], dtype=np.int32)

_INDEX_TABLE = np.array([-1, -1, -1, -1, 2, 4, 6, 8,
                         -1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int32)


def _adpcm_step(nib: np.ndarray, pred: np.ndarray, idx: np.ndarray):
    """One IMA ADPCM predictor update, vectorized over parallel streams."""
    step = _STEP_TABLE[idx]
    diff = step >> 3
    diff = diff + np.where(nib & 1, step >> 2, 0)
    diff = diff + np.where(nib & 2, step >> 1, 0)
    diff = diff + np.where(nib & 4, step, 0)
    pred = np.where(nib & 8, pred - diff, pred + diff).clip(-32768, 32767)
    idx = (idx + _INDEX_TABLE[nib]).clip(0, 88)
    return pred, idx


def adpcm_decode_blocks(data: bytes, channels: int,
                        block_align: int, n_samples: int | None = None) -> np.ndarray:
    """IMA ADPCM 'data' chunk bytes -> (n_samples, channels) int16.

    Block layout (per WAVE spec): per channel a 4-byte header
    (int16 predictor, uint8 step index, pad), then nibble data in 4-byte
    groups interleaved by channel. samples/block = (block_align -
    4*channels) * 2 / channels + 1."""
    raw = np.frombuffer(data, dtype=np.uint8)
    n_blocks = len(raw) // block_align
    raw = raw[: n_blocks * block_align].reshape(n_blocks, block_align)
    spb = (block_align - 4 * channels) * 2 // channels + 1
    out = np.empty((n_blocks, spb, channels), dtype=np.int16)
    hdr = raw[:, : 4 * channels].reshape(n_blocks, channels, 4)
    pred = (hdr[:, :, 0].astype(np.int32)
            | (hdr[:, :, 1].astype(np.int32) << 8))
    pred = np.where(pred >= 0x8000, pred - 0x10000, pred)
    idx = hdr[:, :, 2].astype(np.int32).clip(0, 88)
    out[:, 0, :] = pred
    # nibble payload: 4-byte groups, channel-interleaved
    body = raw[:, 4 * channels:].reshape(n_blocks, -1, channels, 4)
    lo = body & 0xF
    hi = body >> 4
    # (n_blocks, groups, channels, 8) nibble order: lo0 hi0 lo1 hi1 ...
    nibs = np.stack([lo[..., 0], hi[..., 0], lo[..., 1], hi[..., 1],
                     lo[..., 2], hi[..., 2], lo[..., 3], hi[..., 3]],
                    axis=-1)
    # -> (n_blocks, channels, samples_after_first)
    nibs = nibs.transpose(0, 2, 1, 3).reshape(n_blocks, channels, -1)
    for s in range(spb - 1):
        pred, idx = _adpcm_step(nibs[:, :, s], pred, idx)
        out[:, s + 1, :] = pred
    flat = out.reshape(-1, channels)
    if n_samples is not None:
        flat = flat[:n_samples]
    return flat


def adpcm_encode_blocks(samples: np.ndarray, block_align: int = 1024) -> bytes:
    """(n, channels) int16 -> IMA ADPCM block bytes.

    The step-index resets per block (spec-legal: every block header carries
    predictor + index), which makes blocks independent — the encoder loop
    runs over the <=``spb`` sample positions of a block while staying
    vectorized ACROSS all blocks x channels, mirroring the decoder."""
    samples = np.asarray(samples, dtype=np.int16)
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    spb = (block_align - 4 * ch) * 2 // ch + 1
    pad = (-n) % spb
    if pad:
        samples = np.vstack([samples, np.repeat(samples[-1:], pad, axis=0)])
    n = len(samples)
    n_blocks = n // spb
    segs = samples.reshape(n_blocks, spb, ch).astype(np.int32)
    pred = segs[:, 0, :].copy()          # (n_blocks, ch)
    ix = np.zeros((n_blocks, ch), dtype=np.int32)
    nibs = np.empty((n_blocks, ch, spb - 1), dtype=np.uint8)
    for s in range(spb - 1):
        target = segs[:, s + 1, :]
        step = _STEP_TABLE[ix]
        diff = target - pred
        nib = np.where(diff < 0, 8, 0)
        ad = np.abs(diff)
        n4 = np.where(ad >= step, 4, 0)
        ad = ad - np.where(n4 > 0, step, 0)
        n2 = np.where(ad >= step >> 1, 2, 0)
        ad = ad - np.where(n2 > 0, step >> 1, 0)
        n1 = np.where(ad >= step >> 2, 1, 0)
        nib = (nib | n4 | n2 | n1).astype(np.uint8)
        pred, ix = _adpcm_step(nib, pred, ix)
        nibs[:, :, s] = nib
    # headers: per block, per channel: int16 predictor, uint8 index, pad
    first = segs[:, 0, :].astype(np.int16)
    hdr = np.zeros((n_blocks, ch, 4), dtype=np.uint8)
    hdr[:, :, 0] = (first & 0xFF).astype(np.uint8)
    hdr[:, :, 1] = ((first.astype(np.int32) >> 8) & 0xFF).astype(np.uint8)
    # nibble payload: 4-byte groups interleaved by channel
    groups = nibs.reshape(n_blocks, ch, -1, 8)
    packed = np.empty((n_blocks, groups.shape[2], ch, 4), dtype=np.uint8)
    for g in range(4):
        packed[:, :, :, g] = (groups[:, :, :, 2 * g]
                              | (groups[:, :, :, 2 * g + 1] << 4)).transpose(0, 2, 1)
    blocks = np.concatenate(
        [hdr.reshape(n_blocks, -1), packed.reshape(n_blocks, -1)], axis=1)
    return blocks.tobytes()
