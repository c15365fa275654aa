"""Pins for the pure-Python FLAC codec (r9). FLAC is LOSSLESS, so the
primary pin is exact round-trip equality (like GIF); hand-assembled
bitstreams additionally pin decoder paths the in-repo encoder never
emits (LPC subframes, wasted bits, multi-partition residuals), and a
seeded mutation fuzz holds the corrupt-input contract."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from ecollector_spark.datapipe.flac_codec import (
    _BitWriter,
    _crc8,
    _crc16,
    _SYNC,
    _utf8_number,
    decode_flac,
    encode_flac,
    flac_header,
)


def _rt(x, **kw):
    out, rate = decode_flac(encode_flac(x, **kw))
    return out, rate


class TestRoundTrip:
    @pytest.mark.parametrize("n", [1, 2, 5, 191, 192, 193, 4096, 4097, 9000])
    def test_mono_noise_exact(self, n):
        rng = np.random.default_rng(n)
        x = rng.integers(-32768, 32768, n).astype(np.int16)
        out, rate = _rt(x, rate=8000)
        assert rate == 8000
        assert np.array_equal(out, x.astype(np.int32))

    @pytest.mark.parametrize("mode", ["independent", "left_side", "mid_side"])
    def test_stereo_modes_exact(self, mode):
        rng = np.random.default_rng(len(mode))
        x = rng.integers(-32768, 32768, (3001, 2)).astype(np.int16)
        out, rate = _rt(x, rate=44100, stereo_mode=mode)
        assert rate == 44100
        assert np.array_equal(out, x.astype(np.int32))

    def test_stereo_odd_side_parity(self):
        """mid/side reconstruction must recover the LSB the mid channel
        floor-divided away — exercised by odd L+R sums."""
        x = np.array([[3, 0], [-5, 2], [7, -4], [1, 1]], dtype=np.int16)
        out, _ = _rt(x, stereo_mode="mid_side")
        assert np.array_equal(out, x.astype(np.int32))

    def test_constant_block_is_tiny(self):
        x = np.full(4000, 1234, dtype=np.int16)
        data = encode_flac(x)
        assert len(data) < 100  # CONSTANT subframe, not 8 kB of samples
        out, _ = _rt(x)
        assert np.array_equal(out, x.astype(np.int32))

    def test_smooth_signal_compresses(self):
        x = (np.sin(np.linspace(0, 40, 16000)) * 12000).astype(np.int16)
        data = encode_flac(x)
        assert len(data) < 0.3 * x.nbytes  # fixed predictors earn keep
        assert np.array_equal(decode_flac(data)[0], x.astype(np.int32))

    def test_header_probe(self):
        x = np.zeros((50, 2), dtype=np.int16)
        assert flac_header(encode_flac(x, rate=48000)) == (2, 48000, 16, 50)

    def test_block_boundaries(self):
        rng = np.random.default_rng(0)
        for n in (511, 512, 513, 1025):
            x = rng.integers(-300, 300, n).astype(np.int16)
            out, _ = _rt(x, block_size=512)
            assert np.array_equal(out, x.astype(np.int32)), n


def _hand_frame(subframe_bits, n_total, blocksize):
    """Assemble fLaC + STREAMINFO (mono 16-bit, md5 zeroed = unchecked)
    + ONE frame whose subframe body is written by ``subframe_bits``."""
    si = _BitWriter()
    si.write(blocksize, 16)
    si.write(blocksize, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(8000, 20)
    si.write(0, 3)  # 1 channel
    si.write(15, 5)  # 16 bps
    si.write(n_total, 36)
    streaminfo = si.bytes() + b"\x00" * 16
    w = _BitWriter()
    w.write(_SYNC, 14)
    w.write(0, 2)  # reserved + fixed-blocksize strategy
    w.write(0b0110, 4)  # 8-bit blocksize-1 at end of header
    w.write(0b0000, 4)  # rate from STREAMINFO
    w.write(0b0000, 4)  # 1 channel
    w.write(0b100, 3)  # 16-bit
    w.write(0, 1)
    for b in _utf8_number(0):
        w.write(b, 8)
    w.write(blocksize - 1, 8)
    hdr = bytes(w.buf)
    w.write(_crc8(hdr), 8)
    subframe_bits(w)
    w.align()
    frame = w.bytes()
    return (
        b"fLaC"
        + bytes([0x80])
        + len(streaminfo).to_bytes(3, "big")
        + streaminfo
        + frame
        + struct.pack(">H", _crc16(frame))
    )


class TestHandAssembled:
    """Decoder paths the in-repo encoder never writes."""

    def test_lpc_subframe(self):
        """LPC order 1, coef [1], shift 0 — x[i] = x[i-1] + e[i]."""

        def body(w):
            w.write(0, 1)
            w.write(0b100000, 6)  # LPC, order 1
            w.write(0, 1)  # no wasted bits
            w.write(100, 16)  # warm-up
            w.write(3, 4)  # precision-1 = 3 -> 4-bit coefficients
            w.write(0, 5)  # shift 0
            w.write(1, 4)  # coef = 1
            w.write(0b00, 2)  # RICE
            w.write(0, 4)  # partition order 0
            w.write(0, 4)  # rice param 0
            for e in (3, -2, 0, 1, -1, 2, 5):
                u = (e << 1) if e >= 0 else (-e << 1) - 1
                w.write_unary(u)

        data = _hand_frame(body, n_total=8, blocksize=8)
        out, rate = decode_flac(data)
        assert rate == 8000
        assert out.tolist() == [100, 103, 101, 101, 102, 101, 103, 108]

    def test_wasted_bits_shift(self):
        """CONSTANT with 2 wasted bits: stored value is pre-shifted."""

        def body(w):
            w.write(0, 1)
            w.write(0b000000, 6)  # CONSTANT
            w.write(1, 1)  # wasted-bits flag
            w.write_unary(1)  # k-1 = 1 -> k = 2 wasted bits
            w.write(75, 14)  # bps - k = 14 bits

        data = _hand_frame(body, n_total=4, blocksize=4)
        out, _ = decode_flac(data)
        assert out.tolist() == [300, 300, 300, 300]  # 75 << 2

    def test_multi_partition_residual(self):
        """Partition order 1 over a FIXED-0 subframe: two partitions
        with DIFFERENT rice params, second partition full-width."""

        def body(w):
            w.write(0, 1)
            w.write(0b001000, 6)  # FIXED order 0
            w.write(0, 1)
            w.write(0b00, 2)
            w.write(1, 4)  # partition order 1 -> 2 partitions of 4
            w.write(0, 4)  # partition 1: param 0
            for e in (1, -1, 2, 0):
                u = (e << 1) if e >= 0 else (-e << 1) - 1
                w.write_unary(u)
            w.write(2, 4)  # partition 2: param 2
            for e in (4, -3, 7, -8):
                u = (e << 1) if e >= 0 else (-e << 1) - 1
                w.write_unary(u >> 2)
                w.write(u, 2)

        data = _hand_frame(body, n_total=8, blocksize=8)
        out, _ = decode_flac(data)
        assert out.tolist() == [1, -1, 2, 0, 4, -3, 7, -8]

    def test_rice2_method(self):
        """Residual coding method 0b01 (RICE2, 5-bit params) — the
        in-repo encoder always writes method 0b00."""

        def body(w):
            w.write(0, 1)
            w.write(0b001000, 6)  # FIXED order 0
            w.write(0, 1)
            w.write(0b01, 2)  # RICE2
            w.write(0, 4)  # partition order 0
            w.write(3, 5)  # 5-bit rice param = 3
            for e in (9, -12, 0, 25):
                u = (e << 1) if e >= 0 else (-e << 1) - 1
                w.write_unary(u >> 3)
                w.write(u, 3)

        data = _hand_frame(body, n_total=4, blocksize=4)
        out, _ = decode_flac(data)
        assert out.tolist() == [9, -12, 0, 25]

    def test_rice2_escape_is_5_bits_wide(self):
        """RICE2's escape code is 0b11111 — a 4-bit-era 0b1111 param
        (15) must decode as a plain parameter, not an escape."""

        def body(w):
            w.write(0, 1)
            w.write(0b001000, 6)
            w.write(0, 1)
            w.write(0b01, 2)  # RICE2
            w.write(0, 4)
            w.write(15, 5)  # param 15 — NOT the escape (31)
            for e in (1, -1):
                u = (e << 1) if e >= 0 else (-e << 1) - 1
                w.write_unary(u >> 15)
                w.write(u, 15)

        data = _hand_frame(body, n_total=2, blocksize=2)
        out, _ = decode_flac(data)
        assert out.tolist() == [1, -1]

    def test_escape_partition(self):
        """Rice escape code -> raw 6-bit residuals."""

        def body(w):
            w.write(0, 1)
            w.write(0b001000, 6)  # FIXED order 0
            w.write(0, 1)
            w.write(0b00, 2)
            w.write(0, 4)
            w.write(0b1111, 4)  # escape
            w.write(6, 5)  # 6-bit raw
            for v in (-32, 31, 0, -1):
                w.write(v & 0x3F, 6)

        data = _hand_frame(body, n_total=4, blocksize=4)
        out, _ = decode_flac(data)
        assert out.tolist() == [-32, 31, 0, -1]


class TestRefusalsAndCorruption:
    def test_bad_magic(self):
        with pytest.raises(ValueError, match="fLaC magic"):
            decode_flac(b"RIFF" + b"\x00" * 40)

    def test_24_bit_refused_by_name(self):
        si = _BitWriter()
        si.write(4096, 16), si.write(4096, 16)
        si.write(0, 24), si.write(0, 24)
        si.write(8000, 20), si.write(0, 3)
        si.write(23, 5)  # 24 bps
        si.write(0, 36)
        block = si.bytes() + b"\x00" * 16
        data = b"fLaC" + bytes([0x80]) + len(block).to_bytes(3, "big") + block
        with pytest.raises(NotImplementedError, match="24-bit"):
            decode_flac(data)

    def test_encode_refuses_more_than_two_channels(self):
        with pytest.raises(NotImplementedError, match="3 channels"):
            encode_flac(np.zeros((10, 3), dtype=np.int16))

    def test_body_corruption_is_loud(self):
        x = np.arange(-500, 500, dtype=np.int16)
        data = bytearray(encode_flac(x))
        data[len(data) // 2] ^= 0xFF  # flip a frame byte -> CRC/MD5
        with pytest.raises(ValueError):
            decode_flac(bytes(data))

    def test_truncation_is_loud(self):
        x = np.arange(-500, 500, dtype=np.int16)
        data = encode_flac(x)
        with pytest.raises(ValueError):
            decode_flac(data[: len(data) - 10])

    def test_multi_block_metadata_truncation_is_loud(self):
        """Metadata blocks AFTER STREAMINFO (padding etc.) must be
        bounds-checked too — a truncated chain is a ValueError, never
        an IndexError."""
        x = np.arange(100, dtype=np.int16)
        data = bytearray(encode_flac(x))
        data[4] &= 0x7F  # STREAMINFO no longer the last block
        head = bytes(data[: 4 + 4 + 34])
        pad = bytes([0x01]) + (200).to_bytes(3, "big") + b"\x00" * 200
        with pytest.raises(ValueError):
            decode_flac(head)  # chain ends with no last-flagged block
        with pytest.raises(ValueError):
            decode_flac(head + pad[:50])  # padding block truncated

    def test_mutation_fuzz_only_documented_exceptions(self):
        """Seeded byte-level mutants must surface only ValueError /
        NotImplementedError (the repo codec contract). The seed stream
        carries a padding metadata block so the metadata-chain walk is
        fuzzed too."""
        rng = np.random.default_rng(42)
        x = rng.integers(-4000, 4000, 700).astype(np.int16)
        data = bytearray(encode_flac(x, block_size=256))
        data[4] &= 0x7F  # STREAMINFO not last; append a real padding block
        si_end = 4 + 4 + 34  # magic + block header + 34-byte STREAMINFO
        pad = bytes([0x81]) + (16).to_bytes(3, "big") + b"\x00" * 16
        data = bytes(data[:si_end]) + pad + bytes(data[si_end:])
        assert decode_flac(data)[0].shape[0] == 700  # still decodes intact
        escaped = []
        for i in range(200):
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
                out, _ = decode_flac(bytes(b))
                assert out.dtype == np.int32
            except (ValueError, NotImplementedError):
                pass
            except Exception as e:  # noqa: BLE001 - the point of the test
                escaped.append((i, type(e).__name__, str(e)[:80]))
        assert not escaped, f"undocumented exceptions {escaped[:5]}"
