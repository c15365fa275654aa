"""Pins for the pure-stdlib GIF and BMP codecs (r9). Both formats are
LOSSLESS for palettable content, so the primary pin is exact round-trip
equality — stronger than the bounded-error JPEG pins."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from ecollector_spark.datapipe.bmp_codec import bmp_header, decode_bmp, encode_bmp
from ecollector_spark.datapipe.gif_codec import (
    decode_gif,
    encode_gif,
    gif_header,
    lzw_decode,
    lzw_encode,
)


class TestGifRoundTrip:
    @pytest.mark.parametrize("shape", [(1, 1), (7, 5), (23, 31), (64, 64)])
    @pytest.mark.parametrize("interlace", [False, True])
    def test_gray_exact(self, shape, interlace):
        rng = np.random.default_rng(sum(shape))
        img = rng.integers(0, 256, shape).astype(np.uint8)
        out = decode_gif(encode_gif(img, interlace=interlace))
        assert out.shape == img.shape
        assert np.array_equal(out, img)

    def test_color_palette_exact(self):
        rng = np.random.default_rng(3)
        pal = rng.integers(0, 256, (13, 3)).astype(np.uint8)
        rgb = pal[rng.integers(0, 13, (21, 17))]
        for il in (False, True):
            out = decode_gif(encode_gif(rgb, interlace=il))
            assert out.shape == rgb.shape and np.array_equal(out, rgb)

    def test_lzw_dictionary_reset_path(self):
        """A large noisy image forces the LZW dict past 4096 entries, so
        the encoder's mid-stream CLEAR + decoder reset both execute."""
        rng = np.random.default_rng(9)
        img = rng.integers(0, 256, (120, 130)).astype(np.uint8)
        data = encode_gif(img)
        assert np.array_equal(decode_gif(data), img)

    def test_lzw_kwkwk_case(self):
        """The code == next_table_entry case (KwKwK) must decode."""
        raw = b"\x00\x00\x00\x01\x01\x01\x00\x00\x00\x00"
        assert lzw_decode(lzw_encode(raw, 2), 2, len(raw)) == raw

    def test_header_and_trailer(self):
        data = encode_gif(np.zeros((9, 11), np.uint8))
        assert gif_header(data) == (11, 9)
        assert data[:6] == b"GIF89a" and data[-1] == 0x3B

    def test_extension_blocks_skipped(self):
        """Splice a Graphic Control Extension (GIF89a animation syntax)
        before the image descriptor; decode is unchanged."""
        img = np.full((6, 8), 77, np.uint8)
        data = encode_gif(img)
        desc = 13 + 3 * 256  # header + LSD + 256-entry global palette
        gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
        spliced = data[:desc] + gce + data[desc:]
        assert np.array_equal(decode_gif(spliced), img)

    def test_too_many_colors_refused(self):
        rng = np.random.default_rng(1)
        with pytest.raises(ValueError, match="256"):
            encode_gif(rng.integers(0, 256, (60, 60, 3)).astype(np.uint8))

    def test_truncation_is_loud(self):
        rng = np.random.default_rng(2)
        data = encode_gif(rng.integers(0, 256, (40, 40)).astype(np.uint8))
        for cut in (4, 12, 40, len(data) // 2, len(data) - 2):
            with pytest.raises(ValueError):
                decode_gif(data[:cut])

    def test_not_a_gif(self):
        with pytest.raises(ValueError, match="signature"):
            decode_gif(b"\x89PNG\r\n\x1a\n")


class TestBmpRoundTrip:
    @pytest.mark.parametrize("shape", [(1, 1), (7, 5), (23, 31)])
    def test_gray_and_rgb_exact(self, shape):
        rng = np.random.default_rng(sum(shape))
        g = rng.integers(0, 256, shape).astype(np.uint8)
        assert np.array_equal(decode_bmp(encode_bmp(g)), g)
        c = rng.integers(0, 256, (*shape, 3)).astype(np.uint8)
        assert np.array_equal(decode_bmp(encode_bmp(c)), c)

    def test_header(self):
        assert bmp_header(encode_bmp(np.zeros((9, 11), np.uint8))) == (11, 9, 8)
        assert bmp_header(encode_bmp(np.zeros((9, 11, 3), np.uint8))) == (11, 9, 24)

    def test_top_down_rows(self):
        img = (np.arange(6 * 4 * 3) % 256).astype(np.uint8).reshape(6, 4, 3)
        data = bytearray(encode_bmp(img))
        # flip to top-down (negative height) and reorder the pixel rows
        (off,) = struct.unpack("<I", bytes(data[10:14]))
        stride = (4 * 3 + 3) & ~3
        rows = [bytes(data[off + i * stride : off + (i + 1) * stride]) for i in range(6)]
        data[22:26] = struct.pack("<i", -6)
        data[off:] = b"".join(reversed(rows))
        assert np.array_equal(decode_bmp(bytes(data)), img)

    def test_refusals_and_truncation(self):
        data = encode_bmp(np.zeros((9, 11, 3), np.uint8))
        with pytest.raises(ValueError):
            decode_bmp(data[:30])
        with pytest.raises(ValueError, match="BM"):
            decode_bmp(b"notabmp")
        b = bytearray(data)
        b[30] = 1  # biCompression = RLE8
        with pytest.raises(NotImplementedError, match="compressed"):
            decode_bmp(bytes(b))
        b = bytearray(data)
        b[28] = 32  # 32-bit depth
        with pytest.raises(NotImplementedError, match="32-bit"):
            decode_bmp(bytes(b))


class TestMultimodalIntegration:
    def test_gif_real_feature_and_resize(self, spark):
        from pyspark.sql import functions as F

        from ecollector_spark.datapipe.multimodal import (
            attach_synthetic_gif_media,
            extract_features,
            resize_media,
        )

        docs = spark.range(8).withColumnRenamed("id", "doc_id")
        media = attach_synthetic_gif_media(docs)
        rows = media.orderBy("doc_id").collect()
        assert [r.width for r in rows[:3]] == [20, 21, 22]
        feats = extract_features(media, decode_stub=False, dim=256)
        lum = (F.expr("array_position(feature, array_max(feature))") - 1).cast("int")
        got = {r.doc_id: r.l for r in feats.select("doc_id", lum.alias("l")).collect()}
        assert got == {d: d % 256 for d in range(8)}  # lossless: lum == v
        small = resize_media(media, max_w=10, max_h=10, decode_stub=False)
        r0 = small.orderBy("doc_id").collect()[0]
        assert r0.width == 10 and bytes(r0.media)[:6] == b"GIF89a"

    def test_bmp_real_decode_through_features(self, spark):
        from pyspark.sql import functions as F

        from ecollector_spark.datapipe.bmp_codec import encode_bmp
        from ecollector_spark.datapipe.multimodal import extract_features

        import numpy as np
        import pandas as pd

        payloads = [
            (int(d), encode_bmp(np.full((5, 7), d * 30 % 256, np.uint8)))
            for d in range(5)
        ]
        pdf = pd.DataFrame(
            {
                "doc_id": [d for d, _ in payloads],
                "media": [b for _, b in payloads],
                "media_type": ["image/bmp"] * len(payloads),
                "width": [7] * len(payloads),
                "height": [5] * len(payloads),
                "n_bytes": [len(b) for _, b in payloads],
            }
        )
        media = spark.createDataFrame(pdf)
        feats = extract_features(media, decode_stub=False, dim=256)
        lum = (F.expr("array_position(feature, array_max(feature))") - 1).cast("int")
        got = {r.doc_id: r.l for r in feats.select("doc_id", lum.alias("l")).collect()}
        assert got == {d: d * 30 % 256 for d in range(5)}
