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
        # spec-illegal combo: 16-bit palette (ctype 3 allows 1/2/4/8)
        ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 3, 0, 0, 0)
        data = _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IEND", b"")
        with pytest.raises(NotImplementedError):
            png_header(data)
        # unknown interlace method
        ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 2)
        data = _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IEND", b"")
        with pytest.raises(NotImplementedError):
            png_header(data)


class TestPaletteInterlace16:
    """r10 (VERDICT r9 missing #2): palette / Adam7 / 16-bit / sub-byte."""

    def test_palette_roundtrip_all_depths(self):
        from ecollector_spark.datapipe.png_codec import (
            encode_png_palette,
        )

        rng = np.random.default_rng(3)
        pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
        for depth in (1, 2, 4, 8):
            n = min(16, 1 << depth)
            idx = rng.integers(0, n, (9, 7), dtype=np.uint8)
            data = encode_png_palette(idx, pal, depth=depth)
            got = decode_png(data)
            assert got.shape == (9, 7, 3)
            assert np.array_equal(got, pal[idx])

    def test_palette_trns_alpha(self):
        from ecollector_spark.datapipe.png_codec import (
            encode_png_palette,
        )

        pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8)
        trans = np.array([0, 128], np.uint8)  # idx 2 implicitly opaque
        idx = np.array([[0, 1, 2], [2, 1, 0]], np.uint8)
        data = encode_png_palette(idx, pal, trans=trans, depth=2)
        got = decode_png(data)
        assert got.shape == (2, 3, 4)
        assert np.array_equal(got[:, :, :3], pal[idx])
        want_a = np.array([[0, 128, 255], [255, 128, 0]], np.uint8)
        assert np.array_equal(got[:, :, 3], want_a)
        # header probe reports 4 channels when tRNS is present, 3 without
        assert png_header(data) == (3, 2, 4)
        assert png_header(encode_png_palette(idx, pal, depth=2)) == (3, 2, 3)

    @pytest.mark.parametrize("shape", [(1, 1), (9, 7), (5, 11, 3), (4, 4, 4)])
    def test_16bit_roundtrip(self, shape):
        rng = np.random.default_rng(sum(shape))
        arr = rng.integers(0, 1 << 16, shape, dtype=np.uint16)
        got = decode_png(encode_png(arr))
        assert got.dtype == np.uint16
        assert np.array_equal(got, arr)

    @pytest.mark.parametrize(
        "shape", [(1, 1), (8, 8), (13, 17, 3), (7, 9, 4), (3, 21)]
    )
    def test_adam7_roundtrip(self, shape):
        rng = np.random.default_rng(sum(shape) + 1)
        arr = rng.integers(0, 256, shape, dtype=np.uint8)
        data = encode_png(arr, interlace=True)
        assert np.array_equal(decode_png(data), arr)
        # and interlaced 16-bit
        arr16 = rng.integers(0, 1 << 16, shape, dtype=np.uint16)
        assert np.array_equal(decode_png(encode_png(arr16, interlace=True)), arr16)

    def test_adam7_palette(self):
        from ecollector_spark.datapipe.png_codec import (
            encode_png_palette,
        )

        rng = np.random.default_rng(12)
        pal = rng.integers(0, 256, (4, 3), dtype=np.uint8)
        idx = rng.integers(0, 4, (10, 10), dtype=np.uint8)
        data = encode_png_palette(idx, pal, depth=2, interlace=True)
        assert np.array_equal(decode_png(data), pal[idx])

    def test_subbyte_grayscale_rescales(self):
        """Gray depth 1/2/4 samples rescale to 8-bit by the exact
        integer factors 255/85/17 (spec sample-depth scaling)."""
        for depth, factor in ((1, 255), (2, 85), (4, 17)):
            n = 1 << depth
            idx = np.arange(n, dtype=np.uint8).reshape(1, n)
            # hand-build a grayscale sub-byte PNG via the pack helper
            from ecollector_spark.datapipe.png_codec import _pack_rows

            raw = _pack_rows(idx.reshape(1, n, 1), depth)
            ihdr = struct.pack(">IIBBBBB", n, 1, depth, 0, 0, 0, 0)
            data = (
                _SIG
                + _chunk(b"IHDR", ihdr)
                + _chunk(b"IDAT", zlib.compress(raw))
                + _chunk(b"IEND", b"")
            )
            got = decode_png(data)
            assert np.array_equal(got, idx * factor)

    def test_colorkey_transparency(self):
        """r10: gray/RGB tRNS color-key — the keyed color decodes to
        alpha 0, everything else alpha 255, output gains a channel."""
        img = np.array([[10, 20], [30, 10]], np.uint8)
        data = encode_png(img, transparent=(10,))
        got = decode_png(data)
        assert got.shape == (2, 2, 2)
        assert np.array_equal(got[:, :, 0], img)
        assert np.array_equal(got[:, :, 1], np.array([[0, 255], [255, 0]]))
        assert png_header(data) == (2, 2, 2)
        rgb = np.zeros((1, 2, 3), np.uint8)
        rgb[0, 1] = (5, 6, 7)
        data = encode_png(rgb, transparent=(0, 0, 0))
        got = decode_png(data)
        assert got.shape == (1, 2, 4)
        assert list(got[0, :, 3]) == [0, 255]
        assert png_header(data) == (2, 1, 4)

    def test_colorkey_16bit(self):
        img = np.array([[1000, 70000 % 65536]], np.uint16)
        data = encode_png(img, transparent=(1000,))
        got = decode_png(data)
        assert got.dtype == np.uint16 and got.shape == (1, 2, 2)
        assert list(got[0, :, 1]) == [0, 65535]

    def test_colorkey_rejects_alpha_types(self):
        with pytest.raises(ValueError, match="gray/RGB only"):
            encode_png(np.zeros((2, 2, 4), np.uint8), transparent=(0, 0, 0))
        with pytest.raises(ValueError, match="sample value"):
            encode_png(np.zeros((2, 2), np.uint8), transparent=(0, 0))

    def test_palette_without_plte_refuses(self):
        from ecollector_spark.datapipe.png_codec import (
            _pack_rows,
        )

        raw = _pack_rows(np.zeros((1, 1, 1), np.uint8), 8)
        ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 3, 0, 0, 0)
        data = (
            _SIG
            + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(raw))
            + _chunk(b"IEND", b"")
        )
        with pytest.raises(ValueError, match="PLTE"):
            decode_png(data)

    def test_palette_index_out_of_range_refuses(self):
        from ecollector_spark.datapipe.png_codec import (
            encode_png_palette,
        )

        pal = np.zeros((2, 3), np.uint8)
        with pytest.raises(ValueError, match="out of range"):
            encode_png_palette(np.array([[3]], np.uint8), pal, depth=2)


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
