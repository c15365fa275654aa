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
