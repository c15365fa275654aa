"""MP3 frame-walker and MP4 box-walker probe pins (r10 — the triage
half of the compressed-media gap; decode stays a named refusal, see
mp3_probe.py's module docstring)."""

from __future__ import annotations

import struct

import pytest

from ecollector_spark.datapipe.mp3_probe import (
    build_mp3,
    looks_like_mp3,
    mp3_header,
    mp3_probe,
)
from ecollector_spark.datapipe.mp4_probe import (
    build_mp4,
    looks_like_mp4,
    mp4_probe,
)


class TestMp3:
    def test_frame_walk_counts(self):
        data = build_mp3(n_frames=7, bitrate_kbps=128, sample_rate=44100)
        ch, rate, kbps, nf, ns = mp3_probe(data)
        assert (ch, rate, kbps, nf, ns) == (1, 44100, 128, 7, 7 * 1152)
        assert mp3_header(data) == (1, 44100, 128, 3)
        assert looks_like_mp3(data)

    @pytest.mark.parametrize(
        "kbps,rate,frame_len",
        [
            (128, 44100, 417),  # 144*128000/44100 = 417.9 -> 417
            (320, 44100, 1044),
            (128, 48000, 384),
            (96, 32000, 432),
        ],
    )
    def test_layer3_frame_lengths(self, kbps, rate, frame_len):
        """The published frame-length arithmetic: 144 * bitrate / rate
        (no padding) — wrong table values break the chain walk."""
        data = build_mp3(n_frames=2, bitrate_kbps=kbps, sample_rate=rate)
        assert len(data) == 2 * frame_len
        assert mp3_probe(data)[3] == 2

    def test_layer1_and_stereo(self):
        data = build_mp3(n_frames=3, bitrate_kbps=192, sample_rate=48000,
                         channels=2, layer=1)
        ch, rate, kbps, nf, ns = mp3_probe(data)
        assert (ch, rate, kbps, nf, ns) == (2, 48000, 192, 3, 3 * 384)
        # Layer I frame: (12 * 192000 / 48000) * 4 = 192 bytes
        assert len(data) == 3 * 192

    def test_id3v2_skip_and_id3v1_tail(self):
        data = build_mp3(n_frames=4, id3_bytes=317)
        assert data[:3] == b"ID3" and looks_like_mp3(data)
        assert mp3_probe(data)[3] == 4
        assert mp3_probe(data + b"TAG" + bytes(125))[3] == 4

    def test_truncation_and_garbage_fail_loud(self):
        data = build_mp3(n_frames=3)
        with pytest.raises(ValueError, match="overruns|truncated"):
            mp3_probe(data[:-10])
        with pytest.raises(ValueError):
            mp3_probe(b"definitely not audio")
        # forbidden bitrate index 15
        h = struct.pack(">I", (0x7FF << 21) | (3 << 19) | (1 << 17) | (15 << 12))
        with pytest.raises(ValueError, match="bitrate index 15"):
            mp3_probe(h + bytes(100))
        # free format refuses by name
        h = struct.pack(">I", (0x7FF << 21) | (3 << 19) | (1 << 17) | (2 << 10))
        with pytest.raises(NotImplementedError, match="free-format"):
            mp3_probe(h + bytes(100))

    def test_mid_stream_parameter_change_fails(self):
        a = build_mp3(n_frames=1, sample_rate=44100)
        b = build_mp3(n_frames=1, sample_rate=48000)
        with pytest.raises(ValueError, match="inconsistent"):
            mp3_probe(a + b)

    def test_vbr_frames_chain(self):
        """Mixed bitrates (VBR) chain fine — each header states its own
        length."""
        a = build_mp3(n_frames=1, bitrate_kbps=128)
        b = build_mp3(n_frames=1, bitrate_kbps=320)
        ch, rate, kbps, nf, ns = mp3_probe(a + b + a)
        assert (nf, ns, kbps) == (3, 3 * 1152, 128)


class TestMp4:
    def test_basic_tree(self):
        data = build_mp4(timescale=1000, duration=60000, width=640, height=360)
        assert looks_like_mp4(data)
        meta = mp4_probe(data)
        assert meta["brand"] == "isom"
        assert (meta["timescale"], meta["duration"]) == (1000, 60000)
        assert meta["duration_s"] == 60.0
        assert (meta["width"], meta["height"]) == (640, 360)
        assert meta["n_tracks"] == 1 and meta["handlers"] == ["vide"]

    def test_audio_track_and_no_video(self):
        data = build_mp4(width=None, height=None, audio=True)
        meta = mp4_probe(data)
        assert meta["handlers"] == ["soun"]
        assert meta["width"] is None and meta["height"] is None
        both = mp4_probe(build_mp4(audio=True))
        assert both["n_tracks"] == 2 and both["handlers"] == ["soun", "vide"]

    def test_corruption_fails_loud(self):
        data = bytearray(build_mp4())
        with pytest.raises(ValueError, match="not an ISO-BMFF"):
            mp4_probe(b"RIFFxxxxWAVE")
        # moov missing
        ftyp_only = bytes(data[: struct.unpack(">I", data[:4])[0]])
        with pytest.raises(ValueError, match="no moov"):
            mp4_probe(ftyp_only)
        # box size overrunning its container
        broken = bytearray(data)
        broken[0:4] = struct.pack(">I", len(data) + 99)
        with pytest.raises(ValueError, match="overruns"):
            mp4_probe(bytes(broken))

    def test_mutation_fuzz_only_documented_exceptions(self):
        import numpy as np

        rng = np.random.default_rng(17)
        data = build_mp4(audio=True)
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
                if looks_like_mp4(bytes(b)):
                    mp4_probe(bytes(b))
            except (ValueError, NotImplementedError):
                pass
            except Exception as e:  # noqa: BLE001 - the point
                escaped.append((i, type(e).__name__, str(e)[:80]))
        assert not escaped, escaped[:5]

    def test_mp3_mutation_fuzz_only_documented_exceptions(self):
        import numpy as np

        rng = np.random.default_rng(18)
        data = build_mp3(n_frames=5, id3_bytes=40)
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
                if looks_like_mp3(bytes(b)):
                    mp3_probe(bytes(b))
            except (ValueError, NotImplementedError):
                pass
            except Exception as e:  # noqa: BLE001 - the point
                escaped.append((i, type(e).__name__, str(e)[:80]))
        assert not escaped, escaped[:5]
