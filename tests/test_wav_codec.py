"""WAV codec unit pins (r7 real audio decode): round-trips, header
probe, chunk-walk robustness (pad bytes, extra chunks), refusal of
non-PCM variants, and the analytic feature contract the
``mm_audio_features`` oracle relies on."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from ecollector_spark.datapipe.wav_codec import decode_wav, encode_wav, wav_header


class TestRoundTrip:
    @pytest.mark.parametrize("n", [1, 7, 800, 1439])
    def test_mono_identity(self, n):
        rng = np.random.default_rng(n)
        x = rng.integers(-32768, 32768, n, dtype=np.int16)
        y, rate = decode_wav(encode_wav(x, rate=8000))
        assert rate == 8000
        assert np.array_equal(y, x)

    def test_stereo_identity(self):
        rng = np.random.default_rng(2)
        x = rng.integers(-32768, 32768, (50, 2), dtype=np.int16)
        y, rate = decode_wav(encode_wav(x, rate=44100))
        assert rate == 44100
        assert y.shape == (50, 2)
        assert np.array_equal(y, x)

    def test_header_probe(self):
        data = encode_wav(np.zeros(123, dtype=np.int16), rate=16000)
        assert wav_header(data) == (1, 16000, 16, 123)

    def test_odd_chunk_pad_byte(self):
        # a 3-byte ancillary chunk before fmt must be skipped with its
        # word-alignment pad byte, or every later offset is off by one
        base = encode_wav(np.arange(10, dtype=np.int16))
        inject = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"
        body = base[12:]  # chunks after RIFF header + WAVE tag
        data = b"RIFF" + struct.pack("<I", 4 + len(inject) + len(body)) + b"WAVE" + inject + body
        y, rate = decode_wav(data)
        assert np.array_equal(y, np.arange(10, dtype=np.int16))

    def test_rejects_non_wav_and_non_pcm(self):
        with pytest.raises(ValueError, match="RIFF"):
            decode_wav(b"definitely not audio")
        data = bytearray(encode_wav(np.zeros(4, dtype=np.int16)))
        data[20] = 3  # fmt audio_format -> IEEE float
        with pytest.raises(NotImplementedError, match="PCM"):
            decode_wav(bytes(data))

    def test_truncated_data_chunk(self):
        data = encode_wav(np.zeros(100, dtype=np.int16))
        with pytest.raises(ValueError):
            decode_wav(data[:-20])


class TestAnalyticFeatureContract:
    """The mm_audio_features oracle predicts features of the synthetic
    square wave analytically; pin the same identities against a direct
    numpy computation over the DECODED samples."""

    @pytest.mark.parametrize("doc_id", [0, 1, 16, 123, 639, 8999])
    def test_square_wave_identities(self, doc_id):
        n, half, amp = 800 + doc_id % 640, 1 + doc_id % 16, 1000 + doc_id % 9000
        i = np.arange(n)
        x = np.where((i // half) % 2 == 0, amp, -amp).astype(np.int16)
        y, rate = decode_wav(encode_wav(x, rate=8000))
        xf = y.astype(np.float64)
        # RMS of a +/-amp square wave is exactly amp in IEEE double
        assert float(np.sqrt(np.mean(xf * xf))) == float(amp)
        crossings = int(np.sum(y[1:].astype(np.int64) * y[:-1].astype(np.int64) < 0))
        assert crossings == (n - 1) // half
        assert int(np.max(np.abs(y.astype(np.int64)))) == amp
        assert n / rate == n / 8000


class TestExtendedFormats:
    """r9: 8/24/32-bit and float PCM + G.711 companding (formats 6/7)."""

    def test_pcm24_pcm32_float32_roundtrip(self):
        rng = np.random.default_rng(5)
        x24 = rng.integers(-(1 << 23), 1 << 23, 500).astype(np.int32)
        y, _ = decode_wav(encode_wav(x24, fmt="pcm24"))
        assert y.dtype == np.int32 and np.array_equal(y, x24)
        x32 = rng.integers(-(1 << 31), 1 << 31, 500).astype(np.int32)
        y32, _ = decode_wav(encode_wav(x32, fmt="pcm32"))
        assert np.array_equal(y32, x32)
        xf = (rng.random(500) * 2 - 1).astype(np.float32)
        yf, _ = decode_wav(encode_wav(xf, fmt="float32"))
        assert yf.dtype == np.float32 and np.array_equal(yf, xf)

    def test_pcm8_quantizes_to_the_8bit_grid(self):
        x = np.array([-32768, -129, -128, 0, 255, 256, 32767], dtype=np.int16)
        y, _ = decode_wav(encode_wav(x, fmt="pcm8"))
        assert np.array_equal(
            y.astype(np.int64), (x.astype(np.int64) >> 8) << 8
        )

    def test_g711_published_anchors(self):
        """The classic G.711 facts pin the companding conventions:
        mu-law max 32124 with a true zero at byte 0xFF; A-law max
        32256, smallest magnitude 8 (no true zero)."""
        from ecollector_spark.datapipe.wav_codec import (
            alaw_decode,
            alaw_encode,
            ulaw_decode,
            ulaw_encode,
        )

        all_bytes = np.arange(256, dtype=np.uint8)
        ud, ad = ulaw_decode(all_bytes), alaw_decode(all_bytes)
        assert int(ud.max()) == 32124 and int(ud.min()) == -32124
        assert int(ulaw_encode(np.array([0]))[0]) == 0xFF
        assert int(ulaw_decode(np.array([0xFF], dtype=np.uint8))[0]) == 0
        assert int(ad.max()) == 32256 and int(np.abs(ad).min()) == 8
        # codebook idempotency + monotone expansion over the full range
        assert np.array_equal(ulaw_decode(ulaw_encode(ud)), ud)
        assert np.array_equal(alaw_decode(alaw_encode(ad)), ad)
        x = np.arange(-32768, 32768, dtype=np.int64)
        ue = ulaw_decode(ulaw_encode(x)).astype(np.int64)
        ae = alaw_decode(alaw_encode(x)).astype(np.int64)
        assert np.all(np.diff(ue) >= 0) and np.all(np.diff(ae) >= 0)
        # quantization error bounded by half the widest segment cell
        assert int(np.abs(ue - np.clip(x, -32635, 32635)).max()) <= 512
        assert int(np.abs(ae - x).max()) <= 512

    def test_g711_through_container_and_unknown_fmt(self):
        rng = np.random.default_rng(6)
        x = rng.integers(-30000, 30000, 300).astype(np.int16)
        from ecollector_spark.datapipe.wav_codec import alaw_decode, alaw_encode, ulaw_decode, ulaw_encode

        yu, rate = decode_wav(encode_wav(x, 16000, fmt="ulaw"))
        assert rate == 16000 and np.array_equal(yu, ulaw_decode(ulaw_encode(x)))
        ya, _ = decode_wav(encode_wav(x, fmt="alaw"))
        assert np.array_equal(ya, alaw_decode(alaw_encode(x)))
        with pytest.raises(ValueError, match="unknown WAV sample format"):
            encode_wav(x, fmt="opus")

    def test_unsupported_variant_refused_by_name(self):
        data = bytearray(encode_wav(np.zeros(4, dtype=np.int16)))
        data[34] = 12  # bits-per-sample -> 12 (never valid here)
        with pytest.raises(NotImplementedError, match="format=1, bits=12"):
            decode_wav(bytes(data))
