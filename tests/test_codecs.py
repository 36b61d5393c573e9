"""Stdlib codec tests: PNG/PPM/WAV round trips, all PNG filter types,
decoded-feature determinism."""

import struct
import zlib

import numpy as np
import pytest

from smqtk_indexing_spark import codecs as C


def _rand_img(h, w, c, seed):
    rng = np.random.default_rng(seed)
    a = rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)
    return a


@pytest.mark.parametrize("shape", [(1, 1, 1), (16, 24, 1), (15, 17, 3), (8, 8, 4)])
def test_png_roundtrip(shape):
    a = _rand_img(*shape, seed=sum(shape))
    out = C.decode_png(C.encode_png(a))
    np.testing.assert_array_equal(out, a)


def test_png_grey_2d_input():
    a = _rand_img(5, 7, 1, seed=1)
    np.testing.assert_array_equal(C.decode_png(C.encode_png(a[:, :, 0])), a)


def _png_with_filters(a, ftypes):
    """Reference forward-filtering per the PNG spec — produces a stream
    using the GIVEN filter type per scanline, to exercise decode's general
    path (encode_png itself always emits filter 0)."""
    h, w, c = a.shape
    color = {1: 0, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    flat = a.reshape(h, w * c).astype(np.int64)
    lines = []
    prev = np.zeros(w * c, dtype=np.int64)
    for y in range(h):
        cur = flat[y]
        ft = ftypes[y % len(ftypes)]
        raw = np.zeros(w * c, dtype=np.int64)
        for x in range(w * c):
            left = cur[x - c] if x >= c else 0
            ul = prev[x - c] if x >= c else 0
            up = prev[x]
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = left
            elif ft == 2:
                pred = up
            elif ft == 3:
                pred = (left + up) // 2
            else:
                pred = C._paeth(int(left), int(up), int(ul))
            raw[x] = (cur[x] - pred) & 0xFF
        lines.append(bytes([ft]) + raw.astype(np.uint8).tobytes())
        prev = cur
    idat = zlib.compress(b"".join(lines))

    def chunk(tag, body):
        crc = zlib.crc32(tag + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + tag + body + struct.pack(">I", crc)

    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("ftypes", [[1], [2], [3], [4], [0, 1, 2, 3, 4]])
def test_png_decode_all_filter_types(ftypes):
    a = _rand_img(10, 9, 3, seed=42)
    np.testing.assert_array_equal(C.decode_png(_png_with_filters(a, ftypes)), a)


def test_png_rejects_garbage_and_unsupported():
    with pytest.raises(ValueError, match="not a PNG"):
        C.decode_png(b"JFIF....")
    a = _rand_img(4, 4, 3, seed=0)
    # corrupt the depth field to 16-bit
    data = bytearray(C.encode_png(a))
    data[24] = 16
    with pytest.raises(ValueError, match="unsupported PNG"):
        C.decode_png(bytes(data))


def test_ppm_roundtrip_and_comment():
    a = _rand_img(6, 5, 3, seed=9)
    np.testing.assert_array_equal(C.decode_ppm(C.encode_ppm(a)), a)
    with_comment = C.encode_ppm(a).replace(b"P6\n", b"P6\n# hello\n", 1)
    np.testing.assert_array_equal(C.decode_ppm(with_comment), a)


def test_wav_roundtrip_mono_and_stereo():
    rng = np.random.default_rng(5)
    mono = rng.integers(-32768, 32768, size=300, dtype=np.int16)
    s, rate = C.decode_wav(C.encode_wav(mono, rate=8000))
    assert rate == 8000
    np.testing.assert_array_equal(s[:, 0], mono)
    stereo = rng.integers(-32768, 32768, size=(200, 2), dtype=np.int16)
    s2, _ = C.decode_wav(C.encode_wav(stereo))
    np.testing.assert_array_equal(s2, stereo)


def test_features_fixed_width_and_deterministic():
    img = _rand_img(33, 47, 3, seed=3)
    f1, f2 = C.image_feature(img), C.image_feature(img)
    assert f1.shape == (256,) and f1.dtype == np.float32
    np.testing.assert_array_equal(f1, f2)
    assert 0.0 <= f1.min() and f1.max() <= 1.0
    rng = np.random.default_rng(4)
    wav = rng.integers(-32768, 32768, size=(500, 2), dtype=np.int16)
    a1 = C.audio_feature(wav)
    assert a1.shape == (256,) and a1.dtype == np.float32
    np.testing.assert_array_equal(a1, C.audio_feature(wav))


def test_synth_asset_formulas_match_decode():
    # the closed form the DuckDB oracle uses must equal the decoded pixels
    from smqtk_indexing_spark import codecs as C2

    i = 37
    yy, xx = np.mgrid[0:16, 0:24]
    img = ((i * 7 + 3 * xx + 5 * yy) % 256).astype(np.uint8)
    dec = C2.decode_png(C2.encode_png(img))
    assert float(dec.astype(np.float64).mean()) == float(
        ((i * 7 + 3 * xx + 5 * yy) % 256).mean()
    )
    tt = np.arange(256, dtype=np.int64)
    wav = (((i * 13 + 11 * tt) % 65536) - 32768).astype(np.int16)
    s, _ = C2.decode_wav(C2.encode_wav(wav))
    assert float(s.astype(np.float64).mean()) == float(
        (((i * 13 + 11 * tt) % 65536) - 32768).mean()
    )
