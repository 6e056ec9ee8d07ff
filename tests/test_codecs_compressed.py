"""Compressed media codecs (pure numpy + stdlib): PNG first.

Verification strategy: (a) encode->decode roundtrips must be bit-exact for
lossless formats, across every colour type / filter / interlace mode the
encoder can emit; (b) decode of HAND-BUILT bitstreams (constructed in the
test with independent filter math, not via the encoder) must match the
source pixels — this catches encoder/decoder bugs that a pure roundtrip
would cancel out.
"""

import struct
import zlib

import numpy as np
import pytest


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body)))


_SIG = b"\x89PNG\r\n\x1a\n"


class TestPng:
    @pytest.mark.parametrize("shape", [(13, 17), (13, 17, 2), (20, 9, 3), (7, 31, 4)])
    @pytest.mark.parametrize("filter_type", [0, 1])
    @pytest.mark.parametrize("interlace", [False, True])
    def test_roundtrip(self, shape, filter_type, interlace):
        from geomesa_ray.stages.png import decode_png, encode_png

        rng = np.random.default_rng(7)
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        out = decode_png(encode_png(img, interlace=interlace, filter_type=filter_type))
        assert out.shape == img.shape and np.array_equal(out, img)

    def test_all_five_filters_hand_built(self):
        """One scanline per filter type, filtered with independent math."""
        from geomesa_ray.stages.png import decode_png

        rng = np.random.default_rng(8)
        img = rng.integers(0, 256, size=(5, 4, 3), dtype=np.uint8)
        rows = []
        prev = np.zeros(12, dtype=np.int32)
        for y, f in enumerate([0, 1, 2, 3, 4]):
            cur = img[y].reshape(-1).astype(np.int32)
            a = np.concatenate([[0, 0, 0], cur[:-3]])
            c = np.concatenate([[0, 0, 0], prev[:-3]])
            if f == 0:
                enc = cur
            elif f == 1:
                enc = cur - a
            elif f == 2:
                enc = cur - prev
            elif f == 3:
                enc = cur - ((a + prev) >> 1)
            else:
                p = a + prev - c
                pred = np.where(
                    (abs(p - a) <= abs(p - prev)) & (abs(p - a) <= abs(p - c)), a,
                    np.where(abs(p - prev) <= abs(p - c), prev, c))
                enc = cur - pred
            rows.append(bytes([f]) + bytes((enc & 0xFF).astype(np.uint8)))
            prev = cur
        png = (_SIG + _chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 5, 8, 2, 0, 0, 0))
               + _chunk(b"IDAT", zlib.compress(b"".join(rows)))
               + _chunk(b"IEND", b""))
        assert np.array_equal(decode_png(png), img)

    @pytest.mark.parametrize("depth", [1, 2, 4, 8])
    def test_palette_trns_sub_byte(self, depth):
        from geomesa_ray.stages.png import decode_png

        rng = np.random.default_rng(9)
        pal = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
        maxv = min(16, 1 << depth)
        idx = rng.integers(0, maxv, size=(9, 11), dtype=np.uint8)
        rows = []
        for y in range(9):
            if depth == 8:
                rb = idx[y].tobytes()
            else:
                bits = np.unpackbits(idx[y][:, None], axis=1)[:, 8 - depth:]
                flat = bits.reshape(-1)
                flat = np.concatenate([flat, np.zeros((-len(flat)) % 8, dtype=np.uint8)])
                rb = np.packbits(flat).tobytes()
            rows.append(b"\x00" + rb)
        trns = bytes(rng.integers(0, 256, size=maxv, dtype=np.uint8))
        png = (_SIG + _chunk(b"IHDR", struct.pack(">IIBBBBB", 11, 9, depth, 3, 0, 0, 0))
               + _chunk(b"PLTE", pal.tobytes()) + _chunk(b"tRNS", trns)
               + _chunk(b"IDAT", zlib.compress(b"".join(rows)))
               + _chunk(b"IEND", b""))
        out = decode_png(png)
        assert out.shape == (9, 11, 4)
        assert np.array_equal(out[:, :, :3], pal[idx])
        assert np.array_equal(out[:, :, 3], np.frombuffer(trns, np.uint8)[idx])

    @pytest.mark.parametrize("depth,scale", [(1, 255), (2, 85), (4, 17)])
    def test_gray_sub_byte_scaling(self, depth, scale):
        from geomesa_ray.stages.png import decode_png

        rng = np.random.default_rng(10)
        g = rng.integers(0, 1 << depth, size=(6, 10), dtype=np.uint8)
        rows = []
        for y in range(6):
            bits = np.unpackbits(g[y][:, None], axis=1)[:, 8 - depth:]
            flat = bits.reshape(-1)
            flat = np.concatenate([flat, np.zeros((-len(flat)) % 8, dtype=np.uint8)])
            rows.append(b"\x00" + np.packbits(flat).tobytes())
        png = (_SIG + _chunk(b"IHDR", struct.pack(">IIBBBBB", 10, 6, depth, 0, 0, 0, 0))
               + _chunk(b"IDAT", zlib.compress(b"".join(rows)))
               + _chunk(b"IEND", b""))
        assert np.array_equal(decode_png(png), g * scale)

    def test_rejects(self):
        from geomesa_ray.stages.png import decode_png

        with pytest.raises(ValueError, match="not a PNG"):
            decode_png(b"P6 1 1 255\n\x00\x00\x00")
        png16 = (_SIG + _chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 16, 0, 0, 0, 0))
                 + _chunk(b"IDAT", zlib.compress(b"\x00\x00\x00"))
                 + _chunk(b"IEND", b""))
        with pytest.raises(ValueError, match="16-bit"):
            decode_png(png16)

    def test_media_decode_stage_png(self, ray_session):
        import ray.data as rd

        from geomesa_ray.stages.codecs import image_features
        from geomesa_ray.stages.media import decode_media
        from geomesa_ray.stages.png import encode_png

        rng = np.random.default_rng(11)
        img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
        rows = [{"media_ref": "img://png", "payload": encode_png(img)}]
        out = decode_media(rd.from_items(rows), dim=64).to_pandas().set_index("media_ref")
        r = out.loc["img://png"]
        assert r["media_kind"] == "image" and r["decoded"]
        assert (r["width"], r["height"]) == (16, 16)
        assert r["px_sum"] == int(img.astype(np.int64).sum())
        np.testing.assert_allclose(np.asarray(r["features"])[:64],
                                   image_features(img, grid=8), rtol=1e-6)
