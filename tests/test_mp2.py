"""MPEG-1 Layer I/II codec contracts (stages/mp2.py).

Lossy codec => roundtrip gates are SNR bars (quantizer-limited; the
filterbank itself measures ~85 dB, tests/test_mp2.py::test_filterbank_npr),
plus BIT-EXACT checks of the closed-form quantization layer, mirroring
the JPEG methodology (bit-exact entropy layer, lossy kept out of SQL
oracles).
"""
import numpy as np
import pytest

from geomesa_ray.stages.mp2 import (
    _SCALEFACTORS,
    _analyze,
    _gather_codes,
    _pack_codes,
    _pick_scf,
    _prototype,
    _qclass,
    _quantize,
    _scfsi,
    _synthesize,
    decode_mp2,
    encode_mp2,
)


def _snr(x, y, margin=1024):
    m = len(x) - margin
    xx = x[:m].astype(np.float64)
    yy = y[:m].astype(np.float64)
    e = xx - yy
    return 10 * np.log10(np.dot(xx, xx) / max(np.dot(e, e), 1e-30))


def _tone_mix(n, rate, freqs_amps):
    t = np.arange(n)
    x = sum(a * np.sin(2 * np.pi * f * t / rate) for f, a in freqs_amps)
    return x.astype(np.int16)


def test_filterbank_npr():
    """The derived pseudo-QMF prototype reconstructs to > 80 dB on white
    noise (quantization untouched): analysis -> synthesis only."""
    rng = np.random.default_rng(0)
    x = rng.standard_normal(16 * 1152)
    s = _analyze(x)
    y = _synthesize(s)
    m = len(x) - 512          # codec delay: the final DELAY samples need
    e = x[:m] - y[:m]         # frames beyond the signal end
    snr = 10 * np.log10(np.dot(x[:m], x[:m]) / np.dot(e, e))
    assert snr > 80.0
    h = _prototype()
    assert h.shape == (512,)
    assert np.abs(h - h[::-1]).max() == 0.0  # symmetric by construction


def test_roundtrip_mono_48k():
    x = _tone_mix(48000, 48000, [(440, 8000), (2333, 5000), (9000, 2500)])
    y, rate = decode_mp2(encode_mp2(x, rate=48000, bitrate=192))
    assert rate == 48000
    assert len(y) == 42 * 1152  # ceil(48000/1152) frames
    assert _snr(x, y) > 60.0


def test_roundtrip_stereo_441_and_separation():
    n = 44100
    t = np.arange(n)
    left = (9000 * np.sin(2 * np.pi * 440 * t / 44100)).astype(np.int16)
    right = (9000 * np.sin(2 * np.pi * 1200 * t / 44100)
             + 3000 * np.sin(2 * np.pi * 6000 * t / 44100)).astype(np.int16)
    blob = encode_mp2(np.stack([left, right], axis=1), rate=44100,
                      bitrate=384)
    y, rate = decode_mp2(blob)
    assert rate == 44100 and y.shape[1] == 2
    assert _snr(left, y[:, 0]) > 70.0
    assert _snr(right, y[:, 1]) > 65.0
    # channel separation: right's 1200 Hz must not leak into left
    spec = np.abs(np.fft.rfft(y[:n, 0].astype(np.float64)))
    assert spec[1200] / spec[440] < 1e-4


def test_roundtrip_32k_and_bandlimited_noise():
    x = _tone_mix(32000, 32000, [(700, 7000), (3100, 4000)])
    y, rate = decode_mp2(encode_mp2(x, rate=32000, bitrate=160))
    assert rate == 32000 and _snr(x, y) > 60.0
    rng = np.random.default_rng(7)
    n = 48000
    spec = np.fft.rfft(rng.standard_normal(n))
    spec[int(15000 / 48000 * n):] = 0
    xb = np.fft.irfft(spec, n)
    xb = (xb / np.abs(xb).max() * 11000).astype(np.int16)
    yb, _ = decode_mp2(encode_mp2(xb, rate=48000, bitrate=384))
    assert _snr(xb, yb) > 45.0


def test_layer1_roundtrip():
    x = _tone_mix(24000, 48000, [(997, 9000)])
    blob = encode_mp2(x, rate=48000, bitrate=192, layer=1)
    y, rate = decode_mp2(blob)
    assert rate == 48000
    assert len(y) == -(-24000 // 384) * 384
    assert _snr(x, y) > 65.0


def test_padding_441_alternates():
    x = _tone_mix(44100, 44100, [(500, 8000)])
    blob = encode_mp2(x, rate=44100, bitrate=192)
    sizes = []
    pos = 0
    while pos + 4 <= len(blob):
        pad = (blob[pos + 2] >> 1) & 1
        fb = 144000 * 192 // 44100 + pad
        sizes.append(fb)
        pos += fb
    assert pos == len(blob)
    assert set(sizes) == {626, 627}  # padded and unpadded frames both occur
    # long-run average slot rate == 144 * bitrate / fs exactly
    assert abs(np.mean(sizes) - 144000 * 192 / 44100) < 0.5


def test_quantizer_bit_exact_levels():
    """Closed-form B.4 classes: quantize is the exact inverse of
    requantize on every reconstruction level, for every ladder entry."""
    for steps in (3, 5, 7, 9, 15, 31, 63, 127, 255, 511, 1023, 2047,
                  4095, 8191, 16383, 32767, 65535):
        k, grouped, c, d = _qclass(steps)
        v = np.arange(steps)
        x = c * ((v - (1 << (k - 1))) / float(1 << (k - 1)) + d)
        assert np.abs(x).max() < 1.0  # levels inside (-1, 1)
        assert np.allclose(x, -x[::-1])  # symmetric
        v2 = _quantize(x, 1.0, steps, k)
        assert np.array_equal(v2, v), f"steps={steps}"
        # C, D closed forms
        assert c == (1 << k) / steps
        assert d == (0.5 if grouped else 2.0 ** (1 - k))


def test_scalefactor_table_and_pick():
    assert _SCALEFACTORS[0] == 2.0
    assert np.isclose(_SCALEFACTORS[3], 1.0)
    assert np.allclose(_SCALEFACTORS[1:] / _SCALEFACTORS[:-1], 2 ** (-1 / 3))
    idx = _pick_scf(np.array([2.5, 2.0, 1.0, 0.5, 1e-9, 0.0]))
    assert idx[0] == 0            # clamp: above table top
    assert _SCALEFACTORS[idx[1]] >= 2.0 > _SCALEFACTORS[min(idx[1] + 1, 62)]
    for j, m in enumerate([2.5, 2.0, 1.0, 0.5, 1e-9, 0.0]):
        assert _SCALEFACTORS[idx[j]] >= m or idx[j] == 0
        if 0 < idx[j] < 62:
            assert _SCALEFACTORS[idx[j] + 1] < m


def test_scfsi_patterns():
    scf = np.zeros((3, 32, 1), dtype=np.int64)
    scf[:, 0, 0] = (5, 5, 5)    # all equal -> 2 (send 1)
    scf[:, 1, 0] = (5, 5, 9)    # first two  -> 1 (send 2)
    scf[:, 2, 0] = (5, 9, 9)    # last two   -> 3 (send 2)
    scf[:, 3, 0] = (5, 7, 9)    # distinct   -> 0 (send 3)
    pat, nsf = _scfsi(scf)
    assert list(pat[:4, 0]) == [2, 1, 3, 0]
    assert list(nsf[:4, 0]) == [1, 2, 2, 3]
    # end-to-end through the codec: constant-amplitude signal exercises
    # scfsi=2, decaying signal exercises 0/1/3
    x = _tone_mix(4 * 1152, 48000, [(440, 9000)])
    env = np.linspace(1.0, 0.05, 4 * 1152)
    xd = (x * env).astype(np.int16)
    for sig in (x, xd):
        y, _ = decode_mp2(encode_mp2(sig, rate=48000, bitrate=192))
        assert _snr(sig, y, margin=600) > 35.0


def test_pack_gather_roundtrip():
    rng = np.random.default_rng(3)
    widths = rng.integers(1, 17, 500).astype(np.int64)
    codes = np.array([int(rng.integers(0, 1 << w)) for w in widths],
                     dtype=np.int64)
    total = int(widths.sum())
    buf = _pack_codes(codes, widths, (total + 7) // 8)
    arr = np.frombuffer(buf + b"\x00\x00\x00", dtype=np.uint8)
    starts = np.concatenate([[0], np.cumsum(widths)[:-1]]).astype(np.int64)
    back = _gather_codes(arr, starts, widths)
    assert np.array_equal(back.astype(np.int64), codes)


def test_decode_rejections():
    x = _tone_mix(2304, 48000, [(440, 8000)])
    blob = encode_mp2(x, rate=48000, bitrate=192)
    with pytest.raises(ValueError):
        decode_mp2(blob[:10])          # truncated frame
    with pytest.raises(ValueError):
        decode_mp2(b"\x00garbage")     # no sync
    mp3 = bytearray(blob)
    mp3[1] = 0xF3                      # layer bits 01 = Layer III
    with pytest.raises(ValueError):
        decode_mp2(bytes(mp3))
    js = bytearray(blob)
    js[3] = (js[3] & 0x3F) | 0x40      # mono frame relabeled joint stereo:
    with pytest.raises(ValueError):    # 2-channel parse overruns the frame
        decode_mp2(bytes(js))


def test_encode_rejections():
    x = _tone_mix(1152, 48000, [(440, 8000)])
    with pytest.raises(ValueError):
        encode_mp2(x, rate=22050, bitrate=192)
    with pytest.raises(ValueError):
        encode_mp2(x, rate=48000, bitrate=57)
    with pytest.raises(ValueError):
        encode_mp2(np.stack([x, x], axis=1), rate=48000, bitrate=96)  # 48/ch
    with pytest.raises(ValueError):
        encode_mp2(x[:0], rate=48000, bitrate=192)


def test_media_decode_dispatch():
    """MediaDecode routes Layer II to the real decoder and Layer III to
    the honest fallback."""
    import pyarrow as pa

    from geomesa_ray.stages.media import MediaDecode

    x = _tone_mix(3000, 48000, [(440, 8000)])
    blob = encode_mp2(x, rate=48000, bitrate=192)
    mp3 = bytes([blob[0], 0xF3]) + blob[2:]
    batch = pa.table({
        "media_ref": ["aud://mp2", "aud://mp3"],
        "payload": [blob, mp3],
    })
    out = MediaDecode(dim=8)(batch)
    rows = out.to_pylist()
    assert rows[0]["media_kind"] == "audio" and rows[0]["decoded"]
    assert rows[0]["n_samples"] == 3 * 1152
    assert rows[0]["sample_rate"] == 48000
    y, _ = decode_mp2(blob)
    assert rows[0]["sample_sum"] == int(y.astype(np.int64).sum())
    assert rows[1]["media_kind"] == "unknown" and not rows[1]["decoded"]


def test_joint_stereo_roundtrip():
    """Intensity stereo: correlated channels at different amplitudes.
    Subbands >= bound share one sample set quantized against the COMBINED
    signal's implied scalefactor; each channel re-pans with its own
    transmitted scalefactor. Per-channel fidelity in shared bands is
    limited BY DESIGN to the 2^(1/3) scalefactor grid (~+-1 dB pan), so
    the per-channel bar is moderate while the mid (combined) signal and
    the independent-band configuration must stay high-fidelity."""
    n = 4 * 1152
    t = np.arange(n)
    base = (np.sin(2 * np.pi * 440 * t / 48000)
            + 0.4 * np.sin(2 * np.pi * 5200 * t / 48000))
    left = (9000 * base).astype(np.int16)
    right = (4500 * base).astype(np.int16)
    st = np.stack([left, right], axis=1)
    for bound, ch_bar, mid_bar in ((4, 25.0, 28.0), (8, 45.0, 45.0),
                                   (16, 45.0, 45.0)):
        # bound >= 8: both tones (440 Hz -> sb 0, 5200 Hz -> sb 6) fall in
        # the independent region, so near-full stereo fidelity is required;
        # bound=4 shares the 5200 Hz band -> grid-limited (measured ~34 dB)
        blob = encode_mp2(st, rate=48000, bitrate=256, mode="joint",
                          bound=bound)
        # header carries joint mode + the bound in mode_extension
        assert blob[3] >> 6 == 1
        assert 4 * (((blob[3] >> 4) & 3) + 1) == bound
        y, rate = decode_mp2(blob)
        assert rate == 48000 and y.shape[1] == 2
        assert _snr(left, y[:, 0]) > ch_bar
        assert _snr(right, y[:, 1]) > ch_bar
        # the mid signal is what intensity coding preserves accurately
        mid = ((left.astype(np.float64) + right) / 2)
        mid_hat = (y[:, 0].astype(np.float64) + y[:, 1]) / 2
        m = n - 1024
        e = mid[:m] - mid_hat[:m]
        assert 10 * np.log10(np.dot(mid[:m], mid[:m]) / np.dot(e, e)) \
            > mid_bar
    # same bitrate -> same frame sizes regardless of mode
    indep = encode_mp2(st, rate=48000, bitrate=256, mode="stereo")
    assert len(encode_mp2(st, rate=48000, bitrate=256, mode="joint",
                          bound=4)) == len(indep)


def test_joint_stereo_layer1():
    n = 10 * 384
    t = np.arange(n)
    base = np.sin(2 * np.pi * 700 * t / 44100)
    st = np.stack([(8000 * base).astype(np.int16),
                   (2000 * base).astype(np.int16)], axis=1)
    blob = encode_mp2(st, rate=44100, bitrate=256, layer=1, mode="joint",
                      bound=8)
    y, rate = decode_mp2(blob)
    assert rate == 44100
    assert _snr(st[:, 0], y[:, 0]) > 40.0
    assert _snr(st[:, 1], y[:, 1]) > 35.0


def test_crc_protection():
    x = _tone_mix(3 * 1152, 48000, [(440, 8000), (3000, 3000)])
    blob = encode_mp2(x, rate=48000, bitrate=192, crc=True)
    assert blob[1] & 1 == 0            # protection_bit = 0 -> CRC present
    y, _ = decode_mp2(blob)
    assert _snr(x, y) > 55.0
    # flipping a protected bit (bit allocation region) must fail the CRC
    bad = bytearray(blob)
    bad[6] ^= 0x10                     # inside the first frame's alloc field
    with pytest.raises(ValueError, match="CRC"):
        decode_mp2(bytes(bad))
    # layer I CRC too
    blob1 = encode_mp2(x[:2 * 384], rate=48000, bitrate=192, layer=1,
                       crc=True)
    y1, _ = decode_mp2(blob1)
    assert len(y1) == 2 * 384
    bad1 = bytearray(blob1)
    bad1[6] ^= 0x01
    with pytest.raises(ValueError, match="CRC"):
        decode_mp2(bytes(bad1))


def test_fuzz_never_hangs_or_crashes():
    """Bit-flipped / truncated / random streams must either decode or
    raise ValueError — never crash with an unrelated exception."""
    rng = np.random.default_rng(11)
    x = _tone_mix(3 * 1152, 48000, [(440, 8000)])
    st = np.stack([x, (x // 2).astype(np.int16)], axis=1)
    variants = [
        bytearray(encode_mp2(x, rate=48000, bitrate=192)),
        bytearray(encode_mp2(st, rate=48000, bitrate=256, mode="joint",
                             bound=8, crc=True)),
    ]
    blob = variants[0]
    for trial in range(80):
        bad = bytearray(variants[trial % 2])
        for _ in range(int(rng.integers(1, 6))):
            bad[int(rng.integers(0, len(bad)))] ^= int(rng.integers(1, 256))
        try:
            y, _ = decode_mp2(bytes(bad))
            assert y.dtype == np.int16
        except ValueError:
            pass
    for cut in (1, 3, 5, 17, 100, len(blob) - 1):
        try:
            decode_mp2(bytes(blob[:cut]))
        except ValueError:
            pass
    for _ in range(20):
        junk = bytes(rng.integers(0, 256, int(rng.integers(4, 400)),
                                  dtype=np.uint8).tolist())
        try:
            decode_mp2(junk)
        except ValueError:
            pass
