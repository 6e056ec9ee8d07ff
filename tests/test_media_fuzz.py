"""Cross-codec corruption fuzz: MediaDecode must TERMINATE and emit a row
for every payload — decoded=True when the bytes are intact, decoded=False
(honest fallback) or decoded=True-with-different-content when corrupted —
never crash, hang, or drop rows. This is the engine-level guarantee the
100-TB media pipeline relies on (a bad payload must not kill a task).

The mp2 fuzz in test_mp2.py additionally asserts the ValueError-only
contract at the codec API; here the surface is the stage, where any
exception routes to the fallback tier.
"""
import numpy as np
import pyarrow as pa
import pytest

from geomesa_ray.stages.media import MediaDecode


def _payloads():
    from geomesa_ray.stages.codecs import (encode_ppm, encode_wav,
                                           encode_wav_compressed)
    from geomesa_ray.stages.flac import encode_flac
    from geomesa_ray.stages.gifbmp import encode_bmp, encode_gif
    from geomesa_ray.stages.jpeg import encode_jpeg
    from geomesa_ray.stages.mp2 import encode_mp2
    from geomesa_ray.stages.png import encode_png
    from geomesa_ray.stages.video import encode_y4m
    from geomesa_ray.sources.geotiff import encode_geotiff

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    gif_img = (rng.integers(0, 6, (16, 16, 3)).astype(np.uint8) * 42)
    s = (rng.integers(-9000, 9000, 4096)).astype(np.int16)
    frames = [rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
              for _ in range(3)]
    return {
        "ppm": encode_ppm(img),
        "png": encode_png(img),
        "bmp": encode_bmp(img),
        "gif": encode_gif(gif_img),
        "jpeg": encode_jpeg(img),
        "tiff": encode_geotiff(img, compression=5),
        "wav": encode_wav(s),
        "ulaw": encode_wav_compressed(s, 8000, "ulaw"),
        "adpcm": encode_wav_compressed(s, 8000, "adpcm"),
        "flac": encode_flac(s, 16000),
        "mp2": encode_mp2(s, rate=32000, bitrate=96),
        "y4m": encode_y4m(frames),
    }


@pytest.fixture(scope="module")
def payloads():
    return _payloads()


def test_intact_payloads_decode(payloads):
    batch = pa.table({
        "media_ref": [f"{k}://ok" for k in payloads],
        "payload": list(payloads.values()),
    })
    out = MediaDecode(dim=8)(batch).to_pylist()
    assert len(out) == len(payloads)
    for row, fmt in zip(out, payloads):
        assert row["decoded"], fmt
        assert row["media_kind"] in ("image", "audio", "video")


def test_corrupted_payloads_terminate(payloads):
    """Random byte flips + truncations across every format: the stage
    must return one row per payload with media_kind set ('unknown' when
    the decoder rejects), no exception escaping, bounded time."""
    rng = np.random.default_rng(17)
    refs, blobs = [], []
    for fmt, blob in payloads.items():
        for trial in range(6):
            bad = bytearray(blob)
            for _ in range(int(rng.integers(1, 8))):
                bad[int(rng.integers(0, len(bad)))] ^= int(
                    rng.integers(1, 256))
            refs.append(f"{fmt}://flip{trial}")
            blobs.append(bytes(bad))
        for cut in (1, 7, len(blob) // 3, len(blob) - 2):
            refs.append(f"{fmt}://cut{cut}")
            blobs.append(bytes(blob[:cut]))
    batch = pa.table({"media_ref": refs, "payload": blobs})
    out = MediaDecode(dim=8)(batch).to_pylist()
    assert len(out) == len(refs)
    for row in out:
        assert row["media_kind"] in ("image", "audio", "video", "unknown")
        if row["media_kind"] == "unknown":
            assert not row["decoded"]
            assert row["px_sum"] == 0 and row["sample_sum"] == 0


def test_pathological_structures_terminate():
    """Hand-built hostile headers: enormous claimed dimensions, zero
    dimensions, self-referential sizes — must fall back, not allocate
    wild or loop."""
    hostiles = [
        b"P6\n2000000000 2000000000\n255\n\x00\x00\x00",  # huge PPM dims
        b"P6\n0 0\n255\n",                                # zero-dim PPM
        b"BM" + b"\x00" * 60,                             # hollow BMP
        b"GIF89a" + b"\xff" * 40,                         # mangled GIF LSD
        b"\x89PNG\r\n\x1a\n" + b"\x00" * 50,              # headerless PNG
        b"RIFF\xff\xff\xff\xffWAVE" + b"\x00" * 30,       # lying RIFF size
        b"fLaC" + b"\xff" * 60,                           # mangled FLAC
        b"\xff\xfd" + b"\xff" * 80,                       # mp2 sync, junk body
        b"YUV4MPEG2 W0 H0 F25:1\n" + b"\x00" * 20,        # zero-dim video
        b"II*\x00" + b"\xff" * 40,                        # mangled TIFF IFD
        b"\xff\xd8\xff\xdb" + b"\x00" * 64,               # JPEG DQT then EOF
    ]
    batch = pa.table({
        "media_ref": [f"hostile://{i}" for i in range(len(hostiles))],
        "payload": hostiles,
    })
    out = MediaDecode(dim=8)(batch).to_pylist()
    assert len(out) == len(hostiles)
    for row in out:
        # every hostile either decodes to something bounded or falls back;
        # none may crash the stage or hang
        assert row["media_kind"] in ("image", "audio", "video", "unknown")
