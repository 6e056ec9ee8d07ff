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

    def test_fuzz_random_filters_vs_reference(self):
        """Random filter type per row (hits the wavefront path whenever a
        3/4 row appears) vs an independently-filtered bitstream."""
        from geomesa_ray.stages.png import decode_png

        rng = np.random.default_rng(70)
        for _ in range(20):
            h = int(rng.integers(1, 20))
            w = int(rng.integers(1, 20))
            nch = int(rng.choice([1, 2, 3, 4]))
            img = rng.integers(0, 256, (h, w, nch), dtype=np.uint8)
            rows = []
            prev = np.zeros(w * nch, dtype=np.int32)
            for y in range(h):
                curr = img[y].reshape(-1).astype(np.int32)
                a = np.zeros_like(curr)
                a[nch:] = curr[:-nch]
                c = np.zeros_like(prev)
                c[nch:] = prev[:-nch]
                f = int(rng.integers(0, 5))
                if f == 4:
                    p = a + prev - c
                    pred = np.where((abs(p - a) <= abs(p - prev))
                                    & (abs(p - a) <= abs(p - c)), a,
                                    np.where(abs(p - prev) <= abs(p - c), prev, c))
                else:
                    pred = [0 * a, a, prev, (a + prev) >> 1][f]
                rows.append(bytes([f]) + bytes(((curr - pred) & 0xFF).astype(np.uint8)))
                prev = curr
            ct = {1: 0, 2: 4, 3: 2, 4: 6}[nch]
            png = (_SIG + _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, ct, 0, 0, 0))
                   + _chunk(b"IDAT", zlib.compress(b"".join(rows)))
                   + _chunk(b"IEND", b""))
            out = decode_png(png)
            ref = img if nch > 1 else img[:, :, 0]
            assert np.array_equal(out, ref)

    def test_rejects(self):
        from geomesa_ray.stages.png import decode_png

        with pytest.raises(ValueError, match="not a PNG"):
            decode_png(b"P6 1 1 255\n\x00\x00\x00")

    @pytest.mark.parametrize("shape", [(13, 17), (9, 21, 3)])
    def test_16bit_roundtrip_and_paeth(self, shape):
        """16-bit (DEM) PNGs: byte-wise filters, uint16 out — roundtrip
        plus a hand-built Paeth bitstream on the 2-byte lanes."""
        from geomesa_ray.stages.png import decode_png, encode_png

        rng = np.random.default_rng(110)
        img = rng.integers(0, 65536, size=shape, dtype=np.uint16)
        for ft in (0, 1):
            out = decode_png(encode_png(img, filter_type=ft))
            assert out.dtype == np.uint16 and np.array_equal(out, img)
        g = rng.integers(0, 65536, (6, 5), dtype=np.uint16)
        be = g.astype(">u2").view(np.uint8).reshape(6, 10).astype(np.int32)
        rows = []
        prev = np.zeros(10, dtype=np.int32)
        for y in range(6):
            cur = be[y]
            a = np.zeros_like(cur)
            a[2:] = cur[:-2]
            c = np.zeros_like(prev)
            c[2:] = prev[:-2]
            p = a + prev - c
            pred = np.where((abs(p - a) <= abs(p - prev))
                            & (abs(p - a) <= abs(p - c)), a,
                            np.where(abs(p - prev) <= abs(p - c), prev, c))
            rows.append(b"\x04" + bytes(((cur - pred) & 0xFF).astype(np.uint8)))
            prev = cur
        png = (_SIG + _chunk(b"IHDR", struct.pack(">IIBBBBB", 5, 6, 16, 0, 0, 0, 0))
               + _chunk(b"IDAT", zlib.compress(b"".join(rows)))
               + _chunk(b"IEND", b""))
        out = decode_png(png)
        assert out.dtype == np.uint16 and np.array_equal(out, g)

    def test_media_decode_stage_compressed(self, ray_session):
        import ray.data as rd

        from geomesa_ray.stages.gifbmp import encode_bmp, encode_gif
        from geomesa_ray.stages.media import decode_media
        from geomesa_ray.stages.png import encode_png

        rng = np.random.default_rng(13)
        img = rng.integers(0, 6, (12, 10, 3), dtype=np.uint8) * 42
        rows = [
            {"media_ref": "img://png", "payload": encode_png(img)},
            {"media_ref": "img://bmp", "payload": encode_bmp(img)},
            {"media_ref": "img://gif", "payload": encode_gif(img)},
        ]
        out = decode_media(rd.from_items(rows), dim=64).to_pandas().set_index("media_ref")
        assert out["decoded"].all() and (out["media_kind"] == "image").all()
        assert (out["width"] == 10).all() and (out["height"] == 12).all()
        s = int(img.astype(np.int64).sum())
        assert out.loc["img://png", "px_sum"] == s
        assert out.loc["img://bmp", "px_sum"] == s
        # GIF decodes to RGBA: + opaque alpha plane
        assert out.loc["img://gif", "px_sum"] == s + 255 * 12 * 10

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


class TestFlac:
    """FLAC is lossless: every roundtrip must be BIT-EXACT."""

    def test_roundtrips_exact(self):
        from geomesa_ray.stages.flac import decode_flac, encode_flac

        rng = np.random.default_rng(100)
        t = np.arange(20000)
        cases = [
            ((np.sin(t / 30) * 8000).astype(np.int16), 16000, 4096),
            (rng.integers(-32768, 32768, 10000).astype(np.int16), 48000, 1024),
            (np.full(5000, -12345, dtype=np.int16), 8000, 4096),
            (np.array([32767, -32768, 0, -1, 1] * 2000, np.int16), 8000, 512),
            ((np.sin(np.arange(4097) / 7) * 5000).astype(np.int16), 16000, 4096),
        ]
        for src, rate, bs in cases:
            out, r = decode_flac(encode_flac(src, rate, bs))
            assert r == rate and np.array_equal(out[:, 0], src)

    def test_stereo_decorrelation_modes(self):
        from geomesa_ray.stages.flac import decode_flac, encode_flac

        rng = np.random.default_rng(101)
        t = np.arange(20000)
        corr_l = (np.sin(t / 25) * 9000).astype(np.int16)
        corr_r = (np.sin(t / 25) * 9000 + rng.normal(0, 50, len(t))).astype(np.int16)
        indep = rng.integers(-5000, 5000, (8000, 2)).astype(np.int16)
        for st in (np.stack([corr_l, corr_r], 1), indep):
            out, _ = decode_flac(encode_flac(st, 44100, 2048))
            assert np.array_equal(out, st)

    def test_many_frames_multibyte_frame_numbers(self):
        """>127 frames exercises the multi-byte UTF-8 frame-number path."""
        from geomesa_ray.stages.flac import decode_flac, encode_flac

        x = (np.sin(np.arange(80_000) / 13) * 6000).astype(np.int16)
        out, _ = decode_flac(encode_flac(x, 16000, block_size=512))  # 157 frames
        assert np.array_equal(out[:, 0], x)

    def test_unknown_total_samples_decodes_all_frames(self):
        """STREAMINFO total_samples = 0 is spec-legal 'unknown': the decoder
        must read frames to the end of the stream, not trust the header."""
        from geomesa_ray.stages.flac import decode_flac, encode_flac

        src = (np.sin(np.arange(10_000) / 19) * 7000).astype(np.int16)
        blob = bytearray(encode_flac(src, 16000, block_size=1024))
        # STREAMINFO body starts at file offset 8; total_samples is the low
        # nibble of body[13] plus body[14:18] (ISO layout mirrored by the
        # decoder) — zero it to mark "unknown"
        blob[8 + 13] &= 0xF0
        blob[8 + 14:8 + 18] = b"\x00\x00\x00\x00"
        out, r = decode_flac(bytes(blob))
        assert r == 16000 and np.array_equal(out[:, 0], src)

    def test_compresses_smooth_audio(self):
        from geomesa_ray.stages.flac import encode_flac

        sine = (np.sin(np.arange(20000) / 30) * 8000).astype(np.int16)
        assert len(encode_flac(sine, 16000)) < 0.35 * sine.nbytes

    def test_lpc_subframe_hand_built(self):
        """The encoder only writes FIXED subframes; exercise the decoder's
        LPC path with a hand-assembled frame whose samples follow the
        shifted integer recurrence x[i] = res + ((sum c_j x[i-1-j]) >> s)."""
        import struct

        from geomesa_ray.stages.flac import (_BitWriter, _crc8, _crc16,
                                             decode_flac, encode_flac)

        order, prec, shift = 2, 5, 2
        coefs = [5, -2]  # x[i] ~ (5*x[i-1] - 2*x[i-2]) >> 2
        rng = np.random.default_rng(102)
        res = rng.integers(-40, 40, 62).astype(np.int64)
        x = np.zeros(64, dtype=np.int64)
        x[0], x[1] = 100, 120
        for i in range(2, 64):
            pred = (coefs[0] * x[i - 1] + coefs[1] * x[i - 2]) >> shift
            x[i] = res[i - 2] + pred
        assert np.abs(x).max() < 32768

        # steal STREAMINFO framing from the real encoder, then replace the
        # frame with a hand-built LPC one
        container = bytearray(encode_flac(x.astype(np.int16), 8000, 64))
        head_len = 4 + 4 + 34  # magic + metadata header + STREAMINFO
        bw = _BitWriter()
        bw.write(0b11111111111110, 14)
        bw.write(0, 2)
        bw.write(6, 4)   # blocksize: 8-bit at end of header
        bw.write(4, 4)   # 8000 Hz
        bw.write(0, 4)   # mono
        bw.write(0b100, 3)
        bw.write(0, 1)
        hdr = bytearray(bw.tobytes())
        hdr += bytes([0])          # frame number 0
        hdr += bytes([64 - 1])     # blocksize - 1
        hdr.append(_crc8(bytes(hdr)))
        sub = _BitWriter()
        sub.write(0, 1)
        sub.write(0b100000 | (order - 1), 6)  # LPC, order 2
        sub.write(0, 1)
        sub.write(int(x[0]) & 0xFFFF, 16)
        sub.write(int(x[1]) & 0xFFFF, 16)
        sub.write(prec - 1, 4)
        sub.write(shift & 0x1F, 5)
        for c in coefs:
            sub.write(c & ((1 << prec) - 1), prec)
        sub.write(0, 2)  # rice method 0
        sub.write(0, 4)  # partition order 0
        sub.write(7, 4)  # rice k
        sub.write_rice_block(res, 7)
        sub.pad_to_byte()
        frame = bytes(hdr) + sub.tobytes()
        frame += struct.pack(">H", _crc16(frame))
        data = bytes(container[:head_len]) + frame
        out, rate = decode_flac(data)
        assert rate == 8000 and np.array_equal(out[:, 0], x.astype(np.int16))

    def test_media_decode_stage_flac(self, ray_session):
        import ray.data as rd

        from geomesa_ray.stages.flac import encode_flac
        from geomesa_ray.stages.media import decode_media

        sine = (np.sin(np.arange(3000) / 15) * 7000).astype(np.int16)
        rows = [{"media_ref": "aud://flac", "payload": encode_flac(sine, 22050)}]
        out = decode_media(rd.from_items(rows), dim=64).to_pandas().set_index("media_ref")
        r = out.loc["aud://flac"]
        assert r["media_kind"] == "audio" and r["decoded"]
        assert r["n_samples"] == 3000 and r["sample_rate"] == 22050
        assert r["sample_sum"] == int(sine.astype(np.int64).sum())


class TestGeoTiff:
    @pytest.mark.parametrize("shape", [(16, 16), (13, 17, 3), (40, 9)])
    @pytest.mark.parametrize("comp,pred", [(1, 1), (5, 1), (5, 2), (32773, 1)])
    def test_roundtrip(self, shape, comp, pred):
        from geomesa_ray.sources.geotiff import decode_geotiff, encode_geotiff

        rng = np.random.default_rng(80)
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        blob = encode_geotiff(img, 12.0, 55.0, 0.25, 0.25, compression=comp,
                              predictor=pred, rows_per_strip=7)
        out, tr = decode_geotiff(blob)
        assert np.array_equal(out, img)
        assert tr == (12.0, 55.0, 0.25, 0.25)

    def test_tiff_lzw_early_change_and_reset(self):
        from geomesa_ray.sources.geotiff import (_lzw_decode_tiff,
                                                 _lzw_encode_tiff)

        rng = np.random.default_rng(81)
        for n in (10, 600, 50000, 200000):  # 600 straddles the 9->10 bump
            d = rng.integers(0, 256, n, dtype=np.uint8)
            assert np.array_equal(_lzw_decode_tiff(_lzw_encode_tiff(d), n), d)
        pat = np.tile(rng.integers(0, 4, 100, dtype=np.uint8), 3000)
        assert np.array_equal(
            _lzw_decode_tiff(_lzw_encode_tiff(pat), len(pat)), pat)

    def test_predictor_improves_smooth_compression(self):
        from geomesa_ray.sources.geotiff import decode_geotiff, encode_geotiff

        yy, xx = np.mgrid[0:64, 0:64]
        smooth = (yy + xx).astype(np.uint8)
        b1 = encode_geotiff(smooth, compression=5, predictor=1)
        b2 = encode_geotiff(smooth, compression=5, predictor=2)
        assert len(b2) < len(b1)
        out, _ = decode_geotiff(b2)
        assert np.array_equal(out, smooth)

    def test_dem_sample_types_and_tiles(self):
        """16-bit / float32 samples and the tiled layout (DEM shapes)."""
        from geomesa_ray.sources.geotiff import decode_geotiff, encode_geotiff

        rng = np.random.default_rng(90)
        dem = rng.integers(0, 65535, (37, 53), dtype=np.uint16)
        for kw in [dict(), dict(compression=5), dict(compression=5, predictor=2),
                   dict(tile=16), dict(tile=16, compression=5, predictor=2),
                   dict(compression=32773)]:
            out, tr = decode_geotiff(encode_geotiff(dem, 5.0, 45.0, 0.5, 0.5, **kw))
            assert out.dtype == np.uint16 and np.array_equal(out, dem), kw
            assert tr == (5.0, 45.0, 0.5, 0.5)
        f = rng.normal(500, 100, (20, 30)).astype(np.float32)
        for kw in [dict(), dict(compression=5), dict(tile=8, compression=5)]:
            out, _ = decode_geotiff(encode_geotiff(f, **kw))
            assert out.dtype == np.float32 and np.array_equal(out, f), kw
        img = rng.integers(0, 256, (19, 23, 3), dtype=np.uint8)
        out, _ = decode_geotiff(encode_geotiff(img, tile=8, compression=5,
                                               predictor=2))
        assert np.array_equal(out, img)

    def test_density_to_geotiff_roundtrip(self, ray_session):
        """Vector -> raster file -> vector closes exactly: the exported
        GeoTIFF decodes to the same weights at the same cell centers."""
        import ray.data as rd

        from geomesa_ray.sources.geotiff import decode_geotiff
        from geomesa_ray.stages.density import density_grid
        from geomesa_ray.stages.raster import density_to_geotiff

        rng = np.random.default_rng(91)
        pts = [{"lon": float(x), "lat": float(y)}
               for x, y in zip(rng.uniform(0, 8, 500), rng.uniform(0, 4, 500))]
        tiles = density_grid(rd.from_items(pts), 0.0, 0.0, 8.0, 4.0,
                             width=16, height=8).to_pandas()
        blob = density_to_geotiff(tiles, 0.0, 0.0, 8.0, 4.0, 16, 8)
        img, tr = decode_geotiff(blob)
        assert img.shape == (8, 16) and img.dtype == np.float32
        assert tr == (0.0, 4.0, 0.5, 0.5)
        assert float(img.sum()) == 500.0  # every point lands in exactly one cell
        for _, row in tiles.iterrows():
            r = 8 - 1 - int(row["tile_j"])
            assert img[r, int(row["tile_i"])] == np.float32(row["weight"])

    def test_raster_to_features_float32_native_values(self, ray_session):
        """Float32 rasters keep exact native values in value_f; the int64
        value column is the documented truncation."""
        import ray.data as rd

        from geomesa_ray.sources.geotiff import encode_geotiff
        from geomesa_ray.stages.raster import raster_to_features

        rng = np.random.default_rng(77)
        f = rng.normal(500.5, 100, (4, 6)).astype(np.float32)
        blob = encode_geotiff(f, origin_x=0.0, origin_y=4.0,
                              pixel_w=0.5, pixel_h=0.5, compression=5)
        out = raster_to_features(
            rd.from_items([{"media_ref": "tif://f32", "payload": blob}])
        ).to_pandas().sort_values(["row", "col"])
        assert np.array_equal(out["value_f"].to_numpy(),
                              f.ravel().astype(np.float64))
        assert np.array_equal(out["value"].to_numpy(),
                              f.ravel().astype(np.int64))

    def test_raster_cell_sums(self, ray_session):
        import ray.data as rd

        from geomesa_ray.sources.geotiff import encode_geotiff
        from geomesa_ray.stages.raster import raster_cell_sums

        rng = np.random.default_rng(82)
        px = rng.integers(0, 256, (8, 8), dtype=np.uint8)
        blob = encode_geotiff(px, origin_x=3.0, origin_y=7.0,
                              pixel_w=0.25, pixel_h=0.25, compression=5)
        out = raster_cell_sums(
            rd.from_items([{"media_ref": "tif://t", "payload": blob}]),
            cell_deg=1.0).to_pandas()
        assert len(out) == 4  # 8x8 @ 0.25 deg = 2x2 degree cells
        assert out["value_sum"].sum() == int(px.astype(np.int64).sum())
        exp = int(px[:4, :4].astype(np.int64).sum())  # top-left cell
        got = out[(out.cell_lon == 3) & (out.cell_lat == 6)]["value_sum"].iloc[0]
        assert got == exp


class TestMediaPipeline:
    def test_end_to_end_rollup(self, ray_session):
        """explode -> payload attach -> decode -> per-doc rollup equals a
        directly-computed expectation on a tiny hand corpus."""
        import ray.data as rd

        from geomesa_ray.stages.media import media_pipeline
        from geomesa_ray.stages.png import encode_png

        rng = np.random.default_rng(40)
        imgs = {f"img://{i}": rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
                for i in range(4)}
        docs = rd.from_items([
            {"doc_id": "a", "spans": [
                {"kind": "text", "text": "x", "media_ref": "", "offset": 0},
                {"kind": "media", "text": "", "media_ref": "img://0", "offset": 1},
                {"kind": "media", "text": "", "media_ref": "img://1", "offset": 2},
            ]},
            {"doc_id": "b", "spans": [
                {"kind": "media", "text": "", "media_ref": "img://2", "offset": 0},
            ]},
            {"doc_id": "c", "spans": [
                {"kind": "text", "text": "no media", "media_ref": "", "offset": 0},
            ]},
        ])
        payloads = rd.from_items([
            {"media_ref": k, "payload": encode_png(v)} for k, v in imgs.items()
        ])
        out = media_pipeline(docs, payloads, dim=16).to_pandas().set_index("doc_id")
        assert set(out.index) == {"a", "b"}  # doc c has no media spans
        assert out.loc["a", "n_media"] == 2 and out.loc["a", "n_decoded"] == 2
        exp_a = int(imgs["img://0"].astype(np.int64).sum()
                    + imgs["img://1"].astype(np.int64).sum())
        assert out.loc["a", "px_total"] == exp_a
        assert out.loc["b", "px_total"] == int(imgs["img://2"].astype(np.int64).sum())


class TestVideo:
    @staticmethod
    def _frames(n=6, h=18, w=22):
        yy, xx = np.mgrid[0:h, 0:w]
        return [np.dstack([(yy * 3 + xx * 2 + t * 10) % 256, (xx * 5 + t) % 256,
                           (yy * 4 + t * 3) % 256]).astype(np.uint8)
                for t in range(n)]

    def test_y4m_444_near_lossless(self):
        from geomesa_ray.stages.video import decode_y4m_frames, encode_y4m

        frames = self._frames()
        out, w, h, n = decode_y4m_frames(encode_y4m(frames, fmt="444"))
        assert (w, h, n) == (22, 18, 6) and len(out) == 6
        err = max(np.abs(o.astype(int) - f.astype(int)).max()
                  for o, f in zip(out, frames))
        assert err <= 2  # YCbCr round-trip rounding only

    def test_y4m_420_frame_sampling(self):
        from geomesa_ray.stages.video import decode_y4m_frames, encode_y4m

        frames = self._frames()
        out, w, h, n = decode_y4m_frames(encode_y4m(frames, fmt="420"),
                                         sample_every=2)
        assert n == 6 and len(out) == 3 and out[0].shape == (18, 22, 3)

    def test_avi_mjpeg_roundtrip(self):
        from geomesa_ray.stages.video import (decode_avi_mjpeg_frames,
                                              encode_avi_mjpeg)

        frames = self._frames()
        out, w, h, n = decode_avi_mjpeg_frames(encode_avi_mjpeg(frames, quality=90))
        assert (w, h, n) == (22, 18, 6) and len(out) == 6
        for o, f in zip(out, frames):
            mse = np.mean((o.astype(np.float64) - f.astype(np.float64)) ** 2)
            assert 10 * np.log10(255 ** 2 / mse) > 25

    def test_media_decode_stage_video(self, ray_session):
        import ray.data as rd

        from geomesa_ray.stages.media import decode_media
        from geomesa_ray.stages.video import encode_avi_mjpeg, encode_y4m

        frames = self._frames()
        rows = [
            {"media_ref": "vid://y4m", "payload": encode_y4m(frames)},
            {"media_ref": "vid://avi", "payload": encode_avi_mjpeg(frames)},
        ]
        out = decode_media(rd.from_items(rows), dim=64).to_pandas().set_index("media_ref")
        assert (out["media_kind"] == "video").all() and out["decoded"].all()
        assert (out["width"] == 22).all() and (out["height"] == 18).all()
        assert (out["n_samples"] == 6).all()  # frame count
        assert (out["px_sum"] > 0).all()


class TestCompressedAudio:
    """G.711 mu-law / A-law + IMA ADPCM, and the WAV container dispatch."""

    def test_g711_code_roundtrip_exact(self):
        """encode(decode(c)) == c for every 8-bit code — the canonical
        G.711 table property (mu-law excludes 0x7F, the -0 alias)."""
        from geomesa_ray.stages.audio import (alaw_decode, alaw_encode,
                                              ulaw_decode, ulaw_encode)

        codes = np.arange(256, dtype=np.uint8)
        bad = codes[ulaw_encode(ulaw_decode(codes)) != codes]
        assert set(bad.tolist()) <= {0x7F}
        assert (alaw_encode(alaw_decode(codes)) == codes).all()

    def test_g711_quantization_bound(self):
        from geomesa_ray.stages.audio import (alaw_decode, alaw_encode,
                                              ulaw_decode, ulaw_encode)

        rng = np.random.default_rng(30)
        x = rng.integers(-32000, 32000, 50000).astype(np.int16)
        for enc, dec in ((ulaw_encode, ulaw_decode), (alaw_encode, alaw_decode)):
            err = np.abs(dec(enc(x)).astype(np.int32) - x)
            bound = (np.abs(x.astype(np.int32)) + 200) / 16 + 16
            assert (err <= bound).all()

    @staticmethod
    def _snr(ref, out):
        ref = ref.astype(np.float64)
        return 10 * np.log10(ref.var() / np.mean((ref - out) ** 2))

    def test_adpcm_mono_stereo(self):
        from geomesa_ray.stages.audio import (adpcm_decode_blocks,
                                              adpcm_encode_blocks)

        t = np.arange(5000)
        sine = (np.sin(t / 30) * 8000).astype(np.int16)
        dec = adpcm_decode_blocks(adpcm_encode_blocks(sine, 256), 1, 256,
                                  len(sine))[:, 0]
        assert self._snr(sine, dec) > 25
        st = np.stack([sine, (np.cos(t / 25) * 6000).astype(np.int16)], axis=1)
        dec2 = adpcm_decode_blocks(adpcm_encode_blocks(st, 512), 2, 512, len(st))
        assert dec2.shape == st.shape and self._snr(st, dec2) > 25

    @pytest.mark.parametrize("codec", ["ulaw", "alaw", "adpcm"])
    def test_wav_container_dispatch(self, codec):
        from geomesa_ray.stages.codecs import decode_wav, encode_wav_compressed

        sine = (np.sin(np.arange(4000) / 20) * 9000).astype(np.int16)
        out, rate = decode_wav(encode_wav_compressed(sine, 8000, codec))
        assert rate == 8000 and out.shape == (4000, 1)
        assert self._snr(sine, out[:, 0]) > 25

    def test_media_decode_stage_compressed_wav(self, ray_session):
        import ray.data as rd

        from geomesa_ray.stages.codecs import decode_wav, encode_wav_compressed
        from geomesa_ray.stages.media import decode_media

        sine = (np.sin(np.arange(3000) / 15) * 7000).astype(np.int16)
        wav = encode_wav_compressed(sine, 8000, "ulaw")
        exp, _ = decode_wav(wav)
        rows = [{"media_ref": "aud://ulaw", "payload": wav}]
        out = decode_media(rd.from_items(rows), dim=64).to_pandas().set_index("media_ref")
        r = out.loc["aud://ulaw"]
        assert r["media_kind"] == "audio" and r["decoded"]
        assert r["n_samples"] == 3000 and r["sample_rate"] == 8000
        assert r["sample_sum"] == int(exp.astype(np.int64).sum())


class TestBmp:
    @pytest.mark.parametrize("w", [7, 8, 13])
    def test_roundtrip_padding(self, w):
        from geomesa_ray.stages.gifbmp import decode_bmp, encode_bmp

        rng = np.random.default_rng(12)
        img = rng.integers(0, 256, (11, w, 3), dtype=np.uint8)
        assert np.array_equal(decode_bmp(encode_bmp(img)), img)

    def test_topdown_32bpp_and_palette(self):
        from geomesa_ray.stages.gifbmp import decode_bmp

        rng = np.random.default_rng(13)
        # hand-built top-down 32-bit BMP
        img = rng.integers(0, 256, (3, 2, 4), dtype=np.uint8)
        body = img[:, :, [2, 1, 0, 3]].tobytes()  # RGBA -> BGRA, top-down
        dib = struct.pack("<IiiHHIIiiII", 40, 2, -3, 1, 32, 0, len(body),
                          0, 0, 0, 0)
        head = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(body), 0, 0, 54)
        assert np.array_equal(decode_bmp(head + dib + body), img)
        # hand-built bottom-up 8-bit palette BMP (width 3 -> stride 4)
        pal = rng.integers(0, 256, (4, 3), dtype=np.uint8)
        idx = rng.integers(0, 4, (2, 3), dtype=np.uint8)
        rows = np.zeros((2, 4), dtype=np.uint8)
        rows[:, :3] = idx[::-1]
        quads = np.zeros((4, 4), dtype=np.uint8)
        quads[:, :3] = pal[:, ::-1]  # RGB -> BGRX
        body = rows.tobytes()
        dib = struct.pack("<IiiHHIIiiII", 40, 3, 2, 1, 8, 0, len(body),
                          0, 0, 4, 0)
        off = 14 + 40 + 16
        head = struct.pack("<2sIHHI", b"BM", off + len(body), 0, 0, off)
        out = decode_bmp(head + dib + quads.tobytes() + body)
        assert np.array_equal(out, pal[idx])


class TestJpeg:
    """The entropy-layer bit-exactness contract: decode(encode(x)) must
    EQUAL the shared-math reconstruction with no bitstream in between, so
    Huffman/DC-diff/marker bugs cannot hide behind JPEG's lossy-ness."""

    @staticmethod
    def _psnr(a, b):
        mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
        return np.inf if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)

    @pytest.mark.parametrize("subsample", ["420", "444", "422", "440"])
    @pytest.mark.parametrize("quality", [50, 75, 95])
    def test_entropy_layer_bit_exact(self, subsample, quality):
        from geomesa_ray.stages.jpeg import (decode_jpeg, encode_jpeg,
                                             jpeg_reference_reconstruct)

        rng = np.random.default_rng(21)
        yy, xx = np.mgrid[0:37, 0:53]
        grad = np.dstack([(yy * 3 + xx * 2) % 256, (xx * 5) % 256,
                          (yy * 4) % 256]).astype(np.uint8)
        noise = rng.integers(0, 256, (24, 31, 3), dtype=np.uint8)
        for img in (grad, noise):
            dec = decode_jpeg(encode_jpeg(img, quality, subsample))
            ref = jpeg_reference_reconstruct(img, quality, subsample)
            assert dec.shape == img.shape
            assert np.array_equal(dec, ref)

    def test_gray_and_quality_ladder(self):
        from geomesa_ray.stages.jpeg import (decode_jpeg, encode_jpeg,
                                             jpeg_reference_reconstruct)

        yy, xx = np.mgrid[0:40, 0:40]
        gray = ((yy + xx) * 2 % 256).astype(np.uint8)
        dec = decode_jpeg(encode_jpeg(gray, quality=85))
        assert np.array_equal(dec, jpeg_reference_reconstruct(gray, 85))
        assert self._psnr(gray, dec) > 40
        grad = np.dstack([(yy * 3 + xx) % 256, (xx * 5) % 256,
                          (yy * 4) % 256]).astype(np.uint8)
        p50 = self._psnr(grad, decode_jpeg(encode_jpeg(grad, 50, "444")))
        p95 = self._psnr(grad, decode_jpeg(encode_jpeg(grad, 95, "444")))
        assert p95 > p50 > 25  # quality knob is monotone and sane

    @pytest.mark.parametrize("restart_interval", [1, 2, 5])
    def test_restart_markers(self, restart_interval):
        from geomesa_ray.stages.jpeg import (decode_jpeg, encode_jpeg,
                                             jpeg_reference_reconstruct)

        yy, xx = np.mgrid[0:41, 0:57]
        img = np.dstack([(yy * 3 + xx * 2) % 256, (xx * 5) % 256,
                         (yy * 4) % 256]).astype(np.uint8)
        for sub in ("420", "444"):
            dec = decode_jpeg(encode_jpeg(img, 75, sub,
                                          restart_interval=restart_interval))
            assert np.array_equal(dec, jpeg_reference_reconstruct(img, 75, sub))

    def test_rejects_progressive(self):
        from geomesa_ray.stages.jpeg import decode_jpeg, encode_jpeg

        yy, xx = np.mgrid[0:16, 0:16]
        img = (yy * xx % 256).astype(np.uint8)
        data = bytearray(encode_jpeg(img))
        i = data.find(b"\xFF\xC0")
        data[i + 1] = 0xC2  # SOF0 -> SOF2 (progressive)
        with pytest.raises(ValueError, match="baseline"):
            decode_jpeg(bytes(data))

    def test_media_decode_stage_jpeg(self, ray_session):
        import ray.data as rd

        from geomesa_ray.stages.jpeg import encode_jpeg, jpeg_reference_reconstruct
        from geomesa_ray.stages.media import decode_media

        yy, xx = np.mgrid[0:20, 0:24]
        img = np.dstack([(yy * 7) % 256, (xx * 3) % 256,
                         (yy + xx) % 256]).astype(np.uint8)
        rows = [{"media_ref": "img://jpg", "payload": encode_jpeg(img, 90)}]
        out = decode_media(rd.from_items(rows), dim=64).to_pandas().set_index("media_ref")
        r = out.loc["img://jpg"]
        assert r["media_kind"] == "image" and r["decoded"]
        assert (r["width"], r["height"]) == (24, 20)
        exp = jpeg_reference_reconstruct(img, 90)
        assert r["px_sum"] == int(exp.astype(np.int64).sum())


class TestGif:
    def test_lzw_roundtrip_with_table_overflow(self):
        from geomesa_ray.stages.gifbmp import _lzw_decode, _lzw_encode

        rng = np.random.default_rng(14)
        for n, mcs in [(10, 2), (1000, 4), (60000, 8)]:
            idx = rng.integers(0, 1 << mcs, n, dtype=np.uint8)
            assert np.array_equal(_lzw_decode(_lzw_encode(idx, mcs), mcs, n), idx)

    def test_roundtrip_rgb(self):
        from geomesa_ray.stages.gifbmp import decode_gif, encode_gif

        rng = np.random.default_rng(15)
        img = rng.integers(0, 6, (23, 31, 3), dtype=np.uint8) * 42
        out = decode_gif(encode_gif(img))
        assert np.array_equal(out[:, :, :3], img) and (out[:, :, 3] == 255).all()

    def test_multiframe_transparency_and_interlace(self):
        from geomesa_ray.stages.gifbmp import (_lzw_encode, decode_gif,
                                               decode_gif_frames)

        def sub(b):
            o = bytearray()
            for off in range(0, len(b), 255):
                p = b[off:off + 255]
                o += bytes([len(p)]) + p
            return bytes(o) + b"\x00"

        pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [9, 9, 9]], np.uint8)
        f1 = np.zeros((4, 4), dtype=np.uint8)
        f2 = np.array([[1, 0], [0, 1]], dtype=np.uint8)
        gif = (b"GIF89a" + struct.pack("<HHBBB", 4, 4, 0x81, 0, 0) + pal.tobytes()
               + b"\x2C" + struct.pack("<HHHHB", 0, 0, 4, 4, 0) + bytes([2])
               + sub(_lzw_encode(f1.ravel(), 2))
               + b"\x21\xF9\x04" + struct.pack("<BHB", 0b101, 10, 0) + b"\x00"
               + b"\x2C" + struct.pack("<HHHHB", 1, 1, 2, 2, 0) + bytes([2])
               + sub(_lzw_encode(f2.ravel(), 2))
               + b"\x3B")
        frames = decode_gif_frames(gif)
        assert len(frames) == 2
        assert (frames[0][:, :, :3] == pal[0]).all()
        exp = frames[0].copy()
        exp[1, 1, :3] = pal[1]
        exp[2, 2, :3] = pal[1]
        assert np.array_equal(frames[1], exp)

        rng = np.random.default_rng(16)
        idx = rng.integers(0, 4, (8, 5), dtype=np.uint8)
        inter = np.concatenate([idx[0::8], idx[4::8], idx[2::4], idx[1::2]])
        gif2 = (b"GIF89a" + struct.pack("<HHBBB", 5, 8, 0x81, 0, 0) + pal.tobytes()
                + b"\x2C" + struct.pack("<HHHHB", 0, 0, 5, 8, 0x40) + bytes([2])
                + sub(_lzw_encode(inter.ravel(), 2)) + b"\x3B")
        assert np.array_equal(decode_gif(gif2)[:, :, :3], pal[idx])

        # disposal 3 (restore previous): frame 3 must NOT see frame 2's
        # overlay — the canvas reverts before it draws
        f3 = np.full((1, 1), 2, dtype=np.uint8)
        gif3 = (b"GIF89a" + struct.pack("<HHBBB", 4, 4, 0x81, 0, 0) + pal.tobytes()
                + b"\x2C" + struct.pack("<HHHHB", 0, 0, 4, 4, 0) + bytes([2])
                + sub(_lzw_encode(f1.ravel(), 2))
                + b"\x21\xF9\x04" + struct.pack("<BHB", 0b1100, 10, 0) + b"\x00"
                + b"\x2C" + struct.pack("<HHHHB", 1, 1, 2, 2, 0) + bytes([2])
                + sub(_lzw_encode(f2.ravel(), 2))
                + b"\x2C" + struct.pack("<HHHHB", 3, 3, 1, 1, 0) + bytes([2])
                + sub(_lzw_encode(f3.ravel(), 2))
                + b"\x3B")
        frames3 = decode_gif_frames(gif3)
        assert len(frames3) == 3
        assert (frames3[1][1:3, 1:3, :3] != pal[0]).any()  # overlay visible
        exp3 = frames3[0].copy()
        exp3[3, 3, :3] = pal[2]  # only frame 3's pixel differs from frame 1
        assert np.array_equal(frames3[2], exp3)
