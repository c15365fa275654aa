"""Pins for the pure-Python baseline TIFF codec (r9 second session).
Lossless for the supported subset, so the primary pin is exact
round-trip equality; a hand-assembled big-endian file pins the MM
byte-order path the in-repo (little-endian) encoder never writes."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from ecollector_spark.datapipe.tiff_codec import (
    decode_tiff,
    encode_tiff,
    packbits_decode,
    packbits_encode,
    tiff_header,
)


class TestRoundTrip:
    @pytest.mark.parametrize("packbits", [False, True])
    @pytest.mark.parametrize("shape", [(1, 1), (7, 5), (33, 40), (100, 64)])
    def test_gray_exact(self, shape, packbits):
        rng = np.random.default_rng(sum(shape))
        img = rng.integers(0, 256, shape).astype(np.uint8)
        out = decode_tiff(encode_tiff(img, packbits=packbits, rows_per_strip=8))
        assert out.shape == img.shape and np.array_equal(out, img)

    @pytest.mark.parametrize("packbits", [False, True])
    def test_rgb_exact(self, packbits):
        rng = np.random.default_rng(11)
        img = rng.integers(0, 256, (21, 17, 3)).astype(np.uint8)
        out = decode_tiff(encode_tiff(img, packbits=packbits))
        assert out.shape == img.shape and np.array_equal(out, img)

    @pytest.mark.parametrize("shape", [(1, 1), (33, 40), (21, 17, 3)])
    def test_deflate_exact(self, shape):
        rng = np.random.default_rng(len(shape))
        img = rng.integers(0, 256, shape).astype(np.uint8)
        data = encode_tiff(img, compression="deflate", rows_per_strip=8)
        out = decode_tiff(data)
        assert out.shape == img.shape and np.array_equal(out, img)

    def test_deflate_bomb_bounded(self):
        """A deflate strip inflating past the declared geometry must
        fail loud, never balloon."""
        import struct as _s
        import zlib

        data = bytearray(encode_tiff(np.zeros((4, 4), np.uint8), rows_per_strip=4))
        bomb = zlib.compress(b"\x00" * 100_000)
        n = _s.unpack("<H", data[8:10])[0]
        for i in range(n):
            epos = 10 + i * 12
            tag = _s.unpack("<H", data[epos : epos + 2])[0]
            if tag == 259:  # compression -> deflate
                data[epos + 8 : epos + 10] = _s.pack("<H", 8)
            elif tag == 279:  # strip byte count
                data[epos + 8 : epos + 12] = _s.pack("<I", len(bomb))
        with pytest.raises(ValueError):
            decode_tiff(bytes(data[: -16]) + bomb)

    def test_flat_image_compresses(self):
        flat = np.full((64, 64), 7, np.uint8)
        data = encode_tiff(flat, packbits=True)
        assert len(data) < 0.1 * flat.size
        assert np.array_equal(decode_tiff(data), flat)

    def test_header_probe(self):
        data = encode_tiff(np.zeros((9, 11), np.uint8))
        assert tiff_header(data) == (11, 9, 1)
        data3 = encode_tiff(np.zeros((4, 6, 3), np.uint8))
        assert tiff_header(data3) == (6, 4, 3)

    @pytest.mark.parametrize(
        "blob",
        [b"", b"a", b"aaaa", b"abcabc", b"aaabbbcccd" * 50, bytes(range(256))],
    )
    def test_packbits_kernel(self, blob):
        assert packbits_decode(packbits_encode(blob), len(blob)) == blob


def _hand_big_endian(img: np.ndarray, photometric: int = 1) -> bytes:
    """Hand-assemble a BIG-ENDIAN (MM), single-strip, uncompressed
    grayscale TIFF — the path our little-endian encoder never emits."""
    h, w = img.shape
    raw = img.astype(np.uint8).tobytes()
    n = 9
    ifd_off = 8
    data_off = ifd_off + 2 + n * 12 + 4
    out = bytearray(b"MM" + struct.pack(">HI", 42, ifd_off))
    out += struct.pack(">H", n)

    def short(tag, v):
        out.extend(struct.pack(">HHIHH", tag, 3, 1, v, 0))

    def long_(tag, v):
        out.extend(struct.pack(">HHII", tag, 4, 1, v))

    long_(256, w)
    long_(257, h)
    short(258, 8)
    short(259, 1)
    short(262, photometric)
    long_(273, data_off)
    short(277, 1)
    long_(278, h)
    long_(279, len(raw))
    out += struct.pack(">I", 0)
    out += raw
    return bytes(out)


class TestHandAssembled:
    def test_big_endian_decode(self):
        rng = np.random.default_rng(4)
        img = rng.integers(0, 256, (13, 9)).astype(np.uint8)
        data = _hand_big_endian(img)
        assert tiff_header(data) == (9, 13, 1)
        assert np.array_equal(decode_tiff(data), img)

    def test_white_is_zero_inverts(self):
        img = np.arange(0, 250, 10, dtype=np.uint8).reshape(5, 5)
        out = decode_tiff(_hand_big_endian(img, photometric=0))
        assert np.array_equal(out, 255 - img)


class TestRefusalsAndCorruption:
    def test_bad_magic(self):
        with pytest.raises(ValueError, match="byte-order"):
            decode_tiff(b"XXxxxxxx")
        with pytest.raises(ValueError, match="magic 42"):
            decode_tiff(b"II" + struct.pack("<HI", 43, 8))

    def test_lzw_refused_by_name(self):
        data = bytearray(encode_tiff(np.zeros((4, 4), np.uint8)))
        # Compression is a SHORT entry: find tag 259 and set value to 5
        n = struct.unpack("<H", data[8:10])[0]
        for i in range(n):
            epos = 10 + i * 12
            if struct.unpack("<H", data[epos : epos + 2])[0] == 259:
                data[epos + 8 : epos + 10] = struct.pack("<H", 5)
        with pytest.raises(NotImplementedError, match="LZW"):
            decode_tiff(bytes(data))

    def test_truncated_strip(self):
        data = encode_tiff(np.zeros((20, 20), np.uint8))
        with pytest.raises(ValueError):
            decode_tiff(data[: len(data) - 30])

    def test_packbits_bomb_bounded(self):
        """A repeat-run stream longer than the expected output must
        fail loud, never allocate past the declared strip size."""
        with pytest.raises(ValueError):
            packbits_decode(b"\x81a" * 1000, 16)

    def test_mutation_fuzz_only_documented_exceptions(self):
        rng = np.random.default_rng(7)
        img = (np.arange(12 * 14, dtype=np.int64) * 37 % 256).astype(
            np.uint8
        ).reshape(12, 14)
        for packbits in (False, True):
            data = encode_tiff(img, packbits=packbits, rows_per_strip=4)
            escaped = []
            for i in range(150):
                b = bytearray(data)
                for _ in range(int(rng.integers(1, 4))):
                    op = int(rng.integers(0, 3))
                    pos = int(rng.integers(0, len(b)))
                    if op == 0:
                        b[pos] = int(rng.integers(0, 256))
                    elif op == 1 and len(b) > 1:
                        del b[pos]
                    else:
                        b.insert(pos, int(rng.integers(0, 256)))
                try:
                    out = decode_tiff(bytes(b))
                    assert out.dtype == np.uint8
                except (ValueError, NotImplementedError):
                    pass
                except Exception as e:  # noqa: BLE001 - the point
                    escaped.append((i, type(e).__name__, str(e)[:80]))
            assert not escaped, f"packbits={packbits}: {escaped[:5]}"
