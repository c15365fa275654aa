"""AVI codec unit pins (r7 real video decode): round-trips across all
row-pad phases, header probe, chunk-walk robustness, refusal of
compressed/non-video variants, and the two decode-bug detectors the
``mm_video_frames`` oracle relies on (bottom-up flip, row stride)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from ecollector_spark.datapipe.avi_codec import (
    _row_stride,
    avi_header,
    decode_avi,
    encode_avi,
)


class TestRoundTrip:
    @pytest.mark.parametrize("w", [16, 17, 18, 19])  # all four pad phases of 3·w
    def test_gray_identity_all_pad_phases(self, w):
        rng = np.random.default_rng(w)
        g = rng.integers(0, 256, size=(4, 5, w), dtype=np.uint8)
        frames, fps = decode_avi(encode_avi(g, fps=10))
        assert fps == 10
        assert frames.shape == (4, 5, w, 3)
        assert np.array_equal(frames, np.repeat(g[:, :, :, None], 3, axis=3))

    def test_rgb_identity(self):
        rng = np.random.default_rng(3)
        c = rng.integers(0, 256, size=(2, 6, 9, 3), dtype=np.uint8)
        frames, fps = decode_avi(encode_avi(c, fps=25))
        assert fps == 25
        assert np.array_equal(frames, c)

    def test_single_frame_single_pixel(self):
        frames, _ = decode_avi(encode_avi(np.array([[[200]]], dtype=np.uint8)))
        assert frames.shape == (1, 1, 1, 3)
        assert int(frames[0, 0, 0, 0]) == 200

    def test_header_probe(self):
        data = encode_avi(np.zeros((7, 12, 17), dtype=np.uint8), fps=12)
        assert avi_header(data) == (17, 12, 7, 12)

    def test_rejects_non_avi_compressed_and_truncated(self):
        with pytest.raises(ValueError, match="RIFF"):
            decode_avi(b"definitely not video")
        data = encode_avi(np.zeros((2, 4, 4), dtype=np.uint8))
        bad = bytearray(data)
        i = data.find(b"strf")
        bad[i + 8 + 16 : i + 8 + 20] = struct.pack("<I", 0x34363248)  # 'H264'
        with pytest.raises(NotImplementedError, match="ffmpeg|BI_RGB"):
            decode_avi(bytes(bad))
        with pytest.raises(ValueError):
            decode_avi(data[: len(data) // 2])

    def test_frame_count_mismatch_detected(self):
        # header promises 4 frames, movi holds 3 -> decode must refuse
        data = encode_avi(np.zeros((3, 2, 4), dtype=np.uint8))
        bad = bytearray(data)
        i = data.find(b"avih")
        assert struct.unpack_from("<I", bad, i + 8 + 16)[0] == 3  # dwTotalFrames
        struct.pack_into("<I", bad, i + 8 + 16, 4)
        with pytest.raises(ValueError, match="frames"):
            decode_avi(bytes(bad))


class TestDecodeBugDetectors:
    """The mm_video_frames oracle's gradient makes two classic DIB bugs
    visible; pin that a CORRECT decode produces the analytic values a
    buggy one cannot."""

    @pytest.mark.parametrize("doc_id", [0, 11, 154, 253, 1023])
    def test_gradient_identities(self, doc_id):
        d = doc_id
        n, w, h = 4 + d % 12, 16 + d % 16, 12 + d % 12
        f = np.arange(n)[:, None]
        r = np.arange(h)[None, :]
        rows = ((d + 17 * f + r) % 256).astype(np.uint8)
        frames, fps = decode_avi(encode_avi(np.repeat(rows[:, :, None], w, axis=2), fps=10))
        for idx in range(0, n, 3):
            a0 = (d + 17 * idx) % 256
            # top row = a0: a decoder that forgets the bottom-up flip
            # would read (a0 + h - 1) % 256 here instead
            assert int(frames[idx, 0, 0, 0]) == a0
            # full-pixel sum matches the one-wrap closed form: a
            # mis-strided un-pad would bleed pad zeros into the sum
            row_sum = h * a0 + h * (h - 1) // 2 - 256 * max(0, a0 + h - 256)
            assert int(frames[idx].astype(np.int64).sum()) == row_sum * w * 3

    def test_stored_rows_are_actually_bottom_up_bgr(self):
        # byte-level pin: frame 0 of a 1x2x1 gradient (top=10, bottom=11)
        # must store row 11 FIRST in the file and in B,G,R order
        img = np.zeros((1, 2, 1, 3), dtype=np.uint8)
        img[0, 0] = [10, 20, 30]  # top row RGB
        img[0, 1] = [11, 21, 31]  # bottom row RGB
        data = encode_avi(img)
        movi = data.find(b"movi")
        payload = data[movi + 4 + 8 : movi + 4 + 8 + 8]
        assert payload[:3] == bytes([31, 21, 11])  # bottom row, BGR
        assert payload[4:7] == bytes([30, 20, 10])  # then top row, BGR
        frames, _ = decode_avi(data)
        assert np.array_equal(frames, img)


class TestHeaderValidation:
    """r8 (ADVICE r7): malformed-input contracts — a documented error,
    never a silently wrong decode."""

    def test_single_rgb_frame_without_frame_axis_rejected(self):
        img = np.zeros((4, 5, 3), dtype=np.uint8)  # (h, w, 3), no n axis
        with pytest.raises(ValueError, match="leading frame axis"):
            encode_avi(img)
        # the documented fix works
        frames, _ = decode_avi(encode_avi(img[None]))
        assert frames.shape == (1, 4, 5, 3)

    def test_grayscale_3d_still_accepted(self):
        img = np.arange(2 * 4 * 6, dtype=np.uint8).reshape(2, 4, 6)
        frames, _ = decode_avi(encode_avi(img))
        assert frames.shape == (2, 4, 6, 3)

    def test_top_down_dib_refused_not_flipped(self):
        data = bytearray(encode_avi(np.zeros((1, 4, 6), dtype=np.uint8)))
        strf = data.find(b"strf")
        h_off = strf + 8 + 8  # chunk header + biSize/biWidth -> biHeight
        import struct as _s

        (h,) = _s.unpack_from("<i", data, h_off)
        _s.pack_into("<i", data, h_off, -h)
        with pytest.raises(NotImplementedError, match="top-down"):
            decode_avi(bytes(data))

    def test_truncated_strh_raises_valueerror(self):
        data = bytearray(encode_avi(np.zeros((1, 4, 6), dtype=np.uint8)))
        strh = data.find(b"strh")
        _list_trim = bytearray(data[: strh + 8 + 20])  # cut strh short
        import struct as _s

        _s.pack_into("<I", _list_trim, strh + 4, 20)
        with pytest.raises(ValueError, match="truncated|missing"):
            decode_avi(bytes(_list_trim))

    def test_strf_geometry_must_match_avih(self):
        data = bytearray(encode_avi(np.zeros((1, 4, 6), dtype=np.uint8)))
        strf = data.find(b"strf")
        import struct as _s

        _s.pack_into("<i", data, strf + 8 + 4, 99)  # biWidth := 99
        with pytest.raises(ValueError, match="disagrees"):
            decode_avi(bytes(data))


def test_grayscale_escape_hatch_for_width3():
    """ADVICE r8: the (·,·,3) ambiguity guard must not strand legitimate
    width-3 grayscale stacks — grayscale=True encodes them, and
    grayscale=False encodes a single (h, w, 3) RGB frame directly."""
    import numpy as np
    from ecollector_spark.datapipe.avi_codec import decode_avi, encode_avi

    gray = (np.arange(4 * 6 * 3, dtype=np.uint8)).reshape(4, 6, 3)
    frames, _fps = decode_avi(encode_avi(gray, grayscale=True))
    assert frames.shape == (4, 6, 3, 3)
    assert np.array_equal(frames[..., 0], gray)
    assert np.array_equal(frames[..., 1], gray)

    rgb = (np.arange(5 * 7 * 3, dtype=np.uint8)).reshape(5, 7, 3)
    one, _fps = decode_avi(encode_avi(rgb, grayscale=False))
    assert one.shape == (1, 5, 7, 3)
    assert np.array_equal(one[0], rgb)

    import pytest

    with pytest.raises(ValueError, match="ambiguous"):
        encode_avi(rgb)
