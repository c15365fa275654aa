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


class TestLzw:
    """TIFF LZW (r10, VERDICT r9 missing #3): MSB-first early-change
    variable-width codes + the Predictor-2 pairing."""

    @pytest.mark.parametrize("shape", [(1, 1), (5, 9), (16, 16), (64, 64)])
    def test_gray_roundtrip(self, shape):
        rng = np.random.default_rng(sum(shape))
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        data = encode_tiff(img, compression="lzw", rows_per_strip=8)
        assert np.array_equal(decode_tiff(data), img)

    def test_rgb_roundtrip_with_predictor(self):
        rng = np.random.default_rng(11)
        img = rng.integers(0, 256, (21, 17, 3), dtype=np.uint8)
        data = encode_tiff(
            img, compression="lzw", predictor=True, rows_per_strip=6
        )
        assert np.array_equal(decode_tiff(data), img)

    def test_width_bumps_and_dictionary_reset(self):
        """Random 128x128 RGB (49k bytes) forces the 9->10->11->12-bit
        bumps AND the 4094-entry dictionary reset — an early-change
        off-by-one on either side tears the image apart here."""
        from ecollector_spark.datapipe.tiff_codec import (
            lzw_decode_tiff,
            lzw_encode_tiff,
        )

        rng = np.random.default_rng(12)
        raw = rng.integers(0, 256, 49152, dtype=np.uint8).tobytes()
        enc = lzw_encode_tiff(raw)
        assert lzw_decode_tiff(enc, len(raw)) == raw
        # and through the full file path
        img = np.frombuffer(raw, np.uint8).reshape(128, 128, 3)
        data = encode_tiff(img, compression="lzw", rows_per_strip=128)
        assert np.array_equal(decode_tiff(data), img)

    def test_smooth_gradient_roundtrip_with_predictor(self):
        """Gradients are the predictor's home turf: differenced rows
        become constant, LZW collapses them — and the file must still
        round-trip exactly while being much smaller."""
        img = np.add.outer(
            np.arange(40, dtype=np.uint16) * 2, np.arange(60, dtype=np.uint16)
        ).astype(np.uint8)
        plain = encode_tiff(img, compression="none")
        lzwp = encode_tiff(img, compression="lzw", predictor=True)
        assert np.array_equal(decode_tiff(lzwp), img)
        assert len(lzwp) < len(plain) // 2

    def test_hand_assembled_bitstream(self):
        """Decoder pin independent of the encoder: the spec algorithm
        applied by hand to 'ABABABA' yields codes
        [Clear, A, B, 258, 260, EOI] all at 9 bits — the decoder must
        reproduce the text from those exact bits."""
        from ecollector_spark.datapipe.tiff_codec import lzw_decode_tiff

        codes = [256, 65, 66, 258, 260, 257]
        bits = "".join(format(c, "09b") for c in codes)
        bits += "0" * (-len(bits) % 8)
        data = bytes(int(bits[i : i + 8], 2) for i in range(0, len(bits), 8))
        assert lzw_decode_tiff(data, 7) == b"ABABABA"

    def test_kwkwk_case(self):
        """Code-equals-next-entry (KwKwK): 'AAAA' encodes as
        [Clear, A, 258, EOI] where 258 is not yet in the decoder table
        when read."""
        from ecollector_spark.datapipe.tiff_codec import (
            lzw_decode_tiff,
            lzw_encode_tiff,
        )

        enc = lzw_encode_tiff(b"AAAA")
        assert lzw_decode_tiff(enc, 4) == b"AAAA"
        codes = [256, 65, 258, 257]  # Clear, A, KwKwK(AA), EOI -> "AAA"
        bits = "".join(format(c, "09b") for c in codes)
        bits += "0" * (-len(bits) % 8)
        data = bytes(int(bits[i : i + 8], 2) for i in range(0, len(bits), 8))
        assert lzw_decode_tiff(data, 3) == b"AAA"

    def test_bad_code_and_truncation_fail_loud(self):
        from ecollector_spark.datapipe.tiff_codec import (
            lzw_decode_tiff,
            lzw_encode_tiff,
        )

        with pytest.raises(ValueError, match="exhausted"):
            lzw_decode_tiff(b"\x80", 10)
        # code far past the table: Clear then 300
        bits = format(256, "09b") + format(300, "09b")
        bits += "0" * (-len(bits) % 8)
        data = bytes(int(bits[i : i + 8], 2) for i in range(0, len(bits), 8))
        with pytest.raises(ValueError, match="out of range"):
            lzw_decode_tiff(data, 10)
        enc = lzw_encode_tiff(b"hello world, hello lzw")
        with pytest.raises(ValueError):
            lzw_decode_tiff(enc[: len(enc) // 2], 22)

    def test_lzw_mutation_fuzz_only_documented_exceptions(self):
        rng = np.random.default_rng(13)
        img = rng.integers(0, 256, (12, 14), dtype=np.uint8)
        data = encode_tiff(img, compression="lzw", predictor=True)
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
        assert not escaped, escaped[:5]


class TestRefusalsAndCorruption:
    def test_bad_magic(self):
        with pytest.raises(ValueError, match="byte-order"):
            decode_tiff(b"XXxxxxxx")
        with pytest.raises(ValueError, match="magic 42"):
            decode_tiff(b"II" + struct.pack("<HI", 43, 8))

    def test_jpeg_compression_refused_by_name(self):
        data = bytearray(encode_tiff(np.zeros((4, 4), np.uint8)))
        # Compression is a SHORT entry: find tag 259 and set value to 7
        n = struct.unpack("<H", data[8:10])[0]
        for i in range(n):
            epos = 10 + i * 12
            if struct.unpack("<H", data[epos : epos + 2])[0] == 259:
                data[epos + 8 : epos + 10] = struct.pack("<H", 7)
        with pytest.raises(NotImplementedError, match="JPEG"):
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
