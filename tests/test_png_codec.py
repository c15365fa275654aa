"""PNG codec unit pins (r7 real multimodal decode): round-trips, all
five scanline filters against an independent reference unfilter,
corruption detection, and the nearest-neighbor resample contract."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from ecollector_spark.datapipe.png_codec import (
    _SIG,
    _chunk,
    decode_png,
    encode_png,
    png_header,
    resize_nearest,
)


class TestRoundTrip:
    @pytest.mark.parametrize(
        "shape",
        [(1, 1), (13, 17), (32, 5), (7, 7, 3), (4, 6, 4), (1, 200, 3)],
    )
    def test_encode_decode_identity(self, shape):
        rng = np.random.default_rng(sum(shape))
        arr = rng.integers(0, 256, shape, dtype=np.uint8)
        assert np.array_equal(decode_png(encode_png(arr)), arr)

    def test_header_probe(self):
        data = encode_png(np.zeros((30, 40, 3), dtype=np.uint8))
        assert png_header(data) == (40, 30, 3)

    def test_rejects_non_png_and_bad_crc(self):
        with pytest.raises(ValueError, match="signature"):
            decode_png(b"not a png at all, really")
        data = bytearray(encode_png(np.zeros((4, 4), dtype=np.uint8)))
        data[40] ^= 0xFF  # flip a pixel byte inside IDAT, CRC now wrong
        with pytest.raises(ValueError, match="CRC"):
            decode_png(bytes(data))

    def test_unsupported_variants_refuse(self):
        # 16-bit depth header
        ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)
        data = _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IEND", b"")
        with pytest.raises(NotImplementedError):
            png_header(data)


def _ref_unfilter(rows, filters, bpp):
    """Independent (pure-list) implementation of the spec's unfilter —
    the decoder must agree with it on every filter type."""
    h, stride = len(rows), len(rows[0])
    out = [[0] * stride for _ in range(h)]
    for y in range(h):
        ft = filters[y]
        for x in range(stride):
            a = out[y][x - bpp] if x >= bpp else 0
            b = out[y - 1][x] if y else 0
            c = out[y - 1][x - bpp] if (y and x >= bpp) else 0
            if ft == 0:
                pr = 0
            elif ft == 1:
                pr = a
            elif ft == 2:
                pr = b
            elif ft == 3:
                pr = (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            out[y][x] = (rows[y][x] + pr) & 0xFF
    return np.array(out, dtype=np.uint8)


class TestFilters:
    @pytest.mark.parametrize("channels,ctype", [(1, 0), (3, 2), (4, 6)])
    def test_all_five_filters_decode(self, channels, ctype):
        rng = np.random.default_rng(channels)
        h, w = 6, 5
        stride = w * channels
        rows = [list(rng.integers(0, 256, stride)) for _ in range(h)]
        filters = [0, 1, 2, 3, 4, 4]
        raw = b"".join(bytes([filters[y]]) + bytes(rows[y]) for y in range(h))
        ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
        data = (
            _SIG
            + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(raw))
            + _chunk(b"IEND", b"")
        )
        want = _ref_unfilter(rows, filters, channels).reshape(h, w, channels)
        got = decode_png(data)
        if channels == 1:
            want = want[:, :, 0]
        assert np.array_equal(got, want)


class TestResize:
    def test_downscale_indices(self):
        img = np.arange(24, dtype=np.uint8).reshape(4, 6)
        out = resize_nearest(img, 3, 2)
        # src index = dst * old // new
        want = img[[0, 2]][:, [0, 2, 4]]
        assert np.array_equal(out, want)

    def test_identity_and_color(self):
        rng = np.random.default_rng(9)
        img = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
        assert np.array_equal(resize_nearest(img, 8, 8), img)
        out = resize_nearest(img, 4, 4)
        assert out.shape == (4, 4, 3)
        assert np.array_equal(out, img[::2, ::2])
