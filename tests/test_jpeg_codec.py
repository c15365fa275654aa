"""Pins for the pure-stdlib baseline JPEG codec (r8, VERDICT r7 missing
#1). Strategy mirrors test_png_codec.py: closed-form oracles where the
math collapses (flat images are DC-only), bounded round-trip error for
general content (JPEG is lossy by design), and loud refusal of the
modes the codec does not implement."""

from __future__ import annotations

import math
import struct

import numpy as np
import pytest

from ecollector_spark.datapipe.jpeg_codec import (
    _UNZIGZAG,
    _ZIGZAG,
    decode_jpeg,
    encode_jpeg,
    jpeg_header,
    quality_scaled_tables,
)


def _flat_closed_form(v: int, quality: int) -> int:
    """The module-docstring DC-only prediction (also the DuckDB oracle
    of the mm_jpeg_decode gate)."""
    qy, _ = quality_scaled_tables(quality)
    q00 = int(qy[0, 0])
    dc = math.floor(8.0 * (v - 128) / q00 + 0.5)
    return max(0, min(255, math.floor(dc * q00 / 8.0 + 0.5) + 128))


class TestClosedForm:
    @pytest.mark.parametrize("v", [0, 1, 7, 63, 127, 128, 129, 200, 254, 255])
    @pytest.mark.parametrize("quality", [50, 75, 90, 95, 100])
    def test_flat_gray_decodes_to_predicted_constant(self, v, quality):
        img = np.full((19, 26), v, dtype=np.uint8)  # non-multiple-of-8 dims
        out = decode_jpeg(encode_jpeg(img, quality=quality))
        assert out.shape == (19, 26)
        uniq = np.unique(out)
        assert uniq.tolist() == [_flat_closed_form(v, quality)]

    def test_quality_table_scaling_formula(self):
        # libjpeg formula pins: Q=50 -> base tables exactly; Q=100 -> all 1
        qy50, qc50 = quality_scaled_tables(50)
        assert int(qy50[0, 0]) == 16 and int(qc50[0, 0]) == 17
        qy100, _ = quality_scaled_tables(100)
        assert int(qy100.max()) == 1
        # Q=10 (scale=500): 16*500/100 = 80
        qy10, _ = quality_scaled_tables(10)
        assert int(qy10[0, 0]) == (16 * 500 + 50) // 100

    def test_zigzag_is_a_permutation_and_inverts(self):
        assert sorted(_ZIGZAG.tolist()) == list(range(64))
        ident = np.arange(64)
        assert np.array_equal(ident[_ZIGZAG][_UNZIGZAG], ident)
        # spec pins: zigzag position 1 is (0,1), position 2 is (1,0)
        assert _ZIGZAG[1] == 1 and _ZIGZAG[2] == 8


class TestRoundTrip:
    def test_smooth_gradient_error_bounded(self):
        img = np.clip(
            np.add.outer(np.arange(40) * 3, np.arange(60) * 2), 0, 255
        ).astype(np.uint8)
        out = decode_jpeg(encode_jpeg(img, quality=90))
        err = np.abs(out.astype(int) - img.astype(int))
        assert err.max() <= 3

    def test_noise_error_bounded_at_q95(self):
        rng = np.random.RandomState(7)
        img = rng.randint(0, 256, (37, 53), dtype=np.uint8)
        out = decode_jpeg(encode_jpeg(img, quality=95))
        assert np.abs(out.astype(int) - img.astype(int)).max() <= 16

    def test_rgb_flat_color_round_trips_tightly(self):
        img = np.zeros((8, 8, 3), np.uint8)
        img[:] = [200, 30, 90]
        out = decode_jpeg(encode_jpeg(img, quality=90))
        assert out.shape == (8, 8, 3)
        assert np.abs(out.astype(int) - img.astype(int)).max() <= 2

    def test_420_subsampling_decodes(self):
        base = np.clip(
            np.add.outer(np.arange(41) * 3, np.arange(59) * 2), 0, 255
        ).astype(np.uint8)
        rgb = np.stack([base, base[::-1], np.roll(base, 7, axis=0)], axis=2)
        d420 = encode_jpeg(rgb, quality=95, subsampling="4:2:0")
        d444 = encode_jpeg(rgb, quality=95)
        assert len(d420) < len(d444)  # subsampling must actually shrink
        out = decode_jpeg(d420)
        assert out.shape == rgb.shape
        # luma is full-res: grayscale regions survive within quant error
        err = np.abs(out.astype(int).mean(axis=2) - rgb.astype(int).mean(axis=2))
        assert err.mean() < 4

    def test_restart_markers_decode_identically(self):
        base = np.clip(
            np.add.outer(np.arange(24) * 5, np.arange(48) * 3), 0, 255
        ).astype(np.uint8)
        plain = decode_jpeg(encode_jpeg(base, quality=85))
        with_rst = decode_jpeg(encode_jpeg(base, quality=85, restart_interval=2))
        assert np.array_equal(plain, with_rst)

    def test_byte_stuffing_round_trips(self):
        # low quality + noise reliably produces 0xFF bytes in the
        # entropy stream; the encoder must stuff and the decoder unstuff
        rng = np.random.RandomState(3)
        img = rng.randint(0, 256, (32, 32), dtype=np.uint8)
        data = encode_jpeg(img, quality=8)
        scan = data[data.find(b"\xff\xda") :]
        assert b"\xff\x00" in scan  # stuffing actually exercised
        out = decode_jpeg(data)
        assert out.shape == img.shape


class TestHeaderAndRefusals:
    def test_header_parses_without_decode(self):
        img = np.zeros((19, 26), np.uint8)
        assert jpeg_header(encode_jpeg(img)) == (26, 19, 1)
        rgb = np.zeros((10, 12, 3), np.uint8)
        assert jpeg_header(encode_jpeg(rgb)) == (12, 10, 3)

    def test_lossless_refused_by_name(self):
        data = bytearray(encode_jpeg(np.zeros((8, 8), np.uint8)))
        sof = data.find(b"\xff\xc0")
        data[sof + 1] = 0xC3  # rewrite SOF0 -> SOF3 (lossless)
        with pytest.raises(NotImplementedError, match="lossless"):
            decode_jpeg(bytes(data))
        with pytest.raises(NotImplementedError, match="lossless"):
            jpeg_header(bytes(data))

    def test_sof1_extended_sequential_accepted(self):
        """8-bit extended sequential (SOF1) is byte-identical syntax to
        baseline — accepted since r9, decoding to the same pixels."""
        img = (np.arange(15 * 18, dtype=np.uint8) % 200).reshape(15, 18)
        base = encode_jpeg(img, quality=85)
        data = bytearray(base)
        sof = data.find(b"\xff\xc0")
        data[sof + 1] = 0xC1
        assert np.array_equal(decode_jpeg(bytes(data)), decode_jpeg(base))
        assert jpeg_header(bytes(data)) == (18, 15, 1)

    def test_arithmetic_refused_by_name(self):
        data = bytearray(encode_jpeg(np.zeros((8, 8), np.uint8)))
        sof = data.find(b"\xff\xc0")
        data[sof + 1] = 0xC9
        with pytest.raises(NotImplementedError, match="arithmetic"):
            decode_jpeg(bytes(data))

    def test_12bit_precision_refused(self):
        data = bytearray(encode_jpeg(np.zeros((8, 8), np.uint8)))
        sof = data.find(b"\xff\xc0")
        data[sof + 4] = 12  # precision byte
        with pytest.raises(NotImplementedError, match="12-bit"):
            decode_jpeg(bytes(data))

    def test_not_a_jpeg_rejected(self):
        with pytest.raises(ValueError, match="SOI"):
            decode_jpeg(b"\x89PNG\r\n\x1a\n")

    def test_appn_segments_skipped(self):
        # splice an APP1 (EXIF-style) segment after SOI; decode unchanged
        img = np.full((9, 9), 77, np.uint8)
        data = encode_jpeg(img, quality=90)
        app1 = b"\xff\xe1" + struct.pack(">H", 8) + b"Exif\x00\x00"
        spliced = data[:2] + app1 + data[2:]
        assert np.array_equal(decode_jpeg(spliced), decode_jpeg(data))

    def test_empty_image_rejected(self):
        with pytest.raises(ValueError):
            encode_jpeg(np.zeros((0, 4), np.uint8))


class TestMultimodalIntegration:
    def test_resize_real_path_handles_jpeg(self, spark):
        from ecollector_spark.datapipe.multimodal import (
            attach_synthetic_jpeg_media,
            resize_media,
        )

        docs = spark.range(12).withColumnRenamed("id", "doc_id")
        media = attach_synthetic_jpeg_media(docs)
        out = resize_media(media, max_w=16, max_h=16, decode_stub=False).collect()
        assert len(out) == 12
        for r in out:
            assert r["width"] <= 16 and r["height"] <= 16
            # re-encoded payload must itself parse as a JPEG of those dims
            from ecollector_spark.datapipe.jpeg_codec import jpeg_header

            w, h, n = jpeg_header(bytes(r["media"]))
            assert (w, h, n) == (r["width"], r["height"], 1)

    def test_feature_real_path_matches_closed_form(self, spark):
        from ecollector_spark.datapipe.multimodal import (
            attach_synthetic_jpeg_media,
            extract_features,
        )

        docs = spark.range(9).withColumnRenamed("id", "doc_id")
        feats = extract_features(
            attach_synthetic_jpeg_media(docs), decode_stub=False, dim=256
        ).collect()
        for r in feats:
            d = int(r["doc_id"])
            expected = _flat_closed_form(d % 256, 75 + d % 21)
            vec = r["feature"]
            assert vec[expected] == 1.0
            assert sum(vec) == 1.0


class TestCorruptInput:
    """Corrupt/truncated input must fail with the documented loud
    ValueError / NotImplementedError — never struct.error, IndexError,
    or the internal _RestartMarker control-flow class (ADVICE r8)."""

    def _valid(self):
        img = (np.arange(24 * 16, dtype=np.uint8) % 251).reshape(24, 16)
        return encode_jpeg(img, quality=85)

    def test_truncated_mid_segment(self):
        data = self._valid()
        for cut in (3, 5, 9, 20, len(data) // 2):
            with pytest.raises((ValueError, NotImplementedError)):
                decode_jpeg(data[:cut])

    def test_truncated_scan_data(self):
        data = self._valid()
        with pytest.raises(ValueError, match="truncated|exhausted|Huffman"):
            decode_jpeg(data[:-8])

    def test_header_truncated(self):
        data = self._valid()
        with pytest.raises(ValueError):
            jpeg_header(data[:5])

    def test_overrunning_seglen(self):
        data = bytearray(self._valid())
        # first marker segment starts at 2; blow its length past the data
        data[4:6] = struct.pack(">H", 0xFFFF)
        with pytest.raises(ValueError, match="overruns"):
            decode_jpeg(bytes(data))

    def test_unexpected_restart_marker_is_valueerror(self):
        data = self._valid()
        sos = data.index(b"\xff\xda")
        seglen = struct.unpack(">H", data[sos + 2 : sos + 4])[0]
        scan_at = sos + 2 + seglen
        corrupt = bytearray(data)
        # splice an un-announced RST0 a little into the entropy stream
        # (no DRI was written, so any RSTn is unexpected)
        corrupt[scan_at + 6 : scan_at + 6] = b"\xff\xd0"
        with pytest.raises(ValueError, match="restart marker|Huffman|truncated"):
            decode_jpeg(bytes(corrupt))

    def test_undefined_table_reference(self):
        data = bytearray(self._valid())
        sos = bytes(data).index(b"\xff\xda")
        # point the scan's DC/AC table selector at undefined table 3
        data[sos + 6] = 0x33
        with pytest.raises(ValueError, match="undefined"):
            decode_jpeg(bytes(data))

    def test_garbage_is_not_a_jpeg(self):
        with pytest.raises(ValueError):
            decode_jpeg(b"\x00\x01\x02\x03")
        with pytest.raises(ValueError):
            jpeg_header(b"\xff\xd8\xff")


class TestProgressive:
    """SOF2 progressive decode (r9, VERDICT r8 missing #1). The strongest
    pin: the fixed scan script ends at Al=0, so a progressive encode must
    decode PIXEL-IDENTICAL to the baseline encode of the same image."""

    @pytest.mark.parametrize("quality", [8, 50, 90])
    def test_progressive_equals_baseline_gray(self, quality):
        rng = np.random.default_rng(11)
        for img in (
            np.full((16, 16), 100, np.uint8),
            (np.arange(24 * 17, dtype=np.int64) % 256).astype(np.uint8).reshape(24, 17),
            rng.integers(0, 256, (19, 23)).astype(np.uint8),
        ):
            base = decode_jpeg(encode_jpeg(img, quality=quality))
            prog = decode_jpeg(encode_jpeg(img, quality=quality, progressive=True))
            assert np.array_equal(base, prog)

    @pytest.mark.parametrize("subsampling", ["4:4:4", "4:2:0"])
    def test_progressive_equals_baseline_rgb(self, subsampling):
        rng = np.random.default_rng(12)
        img = rng.integers(0, 256, (33, 31, 3)).astype(np.uint8)
        base = decode_jpeg(encode_jpeg(img, quality=80, subsampling=subsampling))
        prog = decode_jpeg(
            encode_jpeg(img, quality=80, subsampling=subsampling, progressive=True)
        )
        assert np.array_equal(base, prog)

    def test_flat_gray_closed_form(self):
        """The mm_jpeg_progressive gate's oracle: same DC-only closed
        form as baseline (the scan script is lossless re-encoding)."""
        for v, q in ((0, 75), (100, 80), (200, 95), (255, 90)):
            from ecollector_spark.datapipe.jpeg_codec import quality_scaled_tables

            q00 = int(quality_scaled_tables(q)[0][0, 0])
            dc = math.floor(8.0 * (v - 128) / q00 + 0.5)
            want = max(0, min(255, math.floor(dc * q00 / 8.0 + 0.5) + 128))
            img = np.full((12, 20), v, np.uint8)
            out = decode_jpeg(encode_jpeg(img, quality=q, progressive=True))
            assert (out == want).all(), (v, q)

    def test_header_reports_progressive_dims(self):
        img = np.zeros((19, 26), np.uint8)
        assert jpeg_header(encode_jpeg(img, progressive=True)) == (26, 19, 1)

    def test_truncated_progressive_is_loud(self):
        data = encode_jpeg(
            np.arange(64, dtype=np.uint8).reshape(8, 8), progressive=True
        )
        for cut in (len(data) // 3, len(data) - 6):
            with pytest.raises((ValueError, NotImplementedError)):
                decode_jpeg(data[:cut])

    def test_progressive_restart_interval_not_emitted(self):
        with pytest.raises(NotImplementedError, match="restart"):
            encode_jpeg(
                np.zeros((8, 8), np.uint8), progressive=True, restart_interval=2
            )


def _huff_spec_codes(spec):
    from ecollector_spark.datapipe.jpeg_codec import _build_huff_encoder

    return _build_huff_encoder(spec)


class TestProgressiveEOBRuns:
    """General EOBn end-of-band runs (the repo encoder only ever emits
    EOB0, but real progressive files use multi-block runs constantly) —
    hand-assembled bitstreams with a custom Huffman table that carries
    EOB1/EOB2 symbols, decoded against analytically known pixels."""

    # custom AC table: symbols 0x01 (run0,size1), 0x10 (EOB1), 0x20 (EOB2)
    AC_SPEC = ([0, 3] + [0] * 14, [0x01, 0x10, 0x20])
    DC_SPEC = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0], list(range(12)))

    def _assemble(self, scans):
        """SOI + DQT(all 1s) + SOF2(8x32 gray) + DHT + scans + EOI."""
        from ecollector_spark.datapipe.jpeg_codec import (
            _dht_segment,
            _dqt_segment,
        )

        out = bytearray(b"\xff\xd8")
        out += _dqt_segment(0, np.ones((8, 8), dtype=np.int64))
        sof = struct.pack(">BHHB", 8, 8, 32, 1) + bytes([1, 0x11, 0])
        out += b"\xff\xc2" + struct.pack(">H", len(sof) + 2) + sof
        out += _dht_segment(0, 0, self.DC_SPEC)
        out += _dht_segment(1, 0, self.AC_SPEC)
        for (ss, se, ah, al), bits in scans:
            sos = bytes([1, 1, 0x00, ss, se, (ah << 4) | al])
            out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
            out += bits
        out += b"\xff\xd9"
        return bytes(out)

    def _expected(self, zz_blocks):
        """Reference reconstruction for 4 blocks of zigzag coefs, q=1."""
        from ecollector_spark.datapipe.jpeg_codec import (
            _C,
            _UNZIGZAG,
            _round_half_up,
        )

        planes = []
        for zz in zz_blocks:
            coef = np.asarray(zz, dtype=np.float64)[_UNZIGZAG].reshape(8, 8)
            dc = coef[0, 0] / 8.0
            coef[0, 0] = 0.0
            pix = _C.T @ coef @ _C + dc + 128.0
            planes.append(np.clip(_round_half_up(pix), 0, 255))
        return np.concatenate(planes, axis=1).astype(np.uint8)

    def test_ac_first_eob_runs_span_blocks(self):
        from ecollector_spark.datapipe.jpeg_codec import _BitWriter, _magnitude

        dc_enc = _huff_spec_codes(self.DC_SPEC)
        ac_enc = _huff_spec_codes(self.AC_SPEC)
        # DC first scan (Al=0): values 0, 8, 16, 24 -> diffs 0,8,8,8
        w = _BitWriter()
        pred = 0
        for dc in (0, 8, 16, 24):
            size, amp = _magnitude(dc - pred)
            code, nb = dc_enc[size]
            w.write(code, nb)
            if size:
                w.write(amp, size)
            pred = dc
        dc_bits = w.flush()
        # AC first scan (1..63, Al=0): block0 has zz[1]=1 (symbol 0x01 +
        # sign), then EOB1 (0x10, 1 extra bit=0 -> run 2: rest of block0
        # + all of block1); block2: EOB1 again (covers blocks 2+3)
        w = _BitWriter()
        code, nb = ac_enc[0x01]
        w.write(code, nb)
        w.write(1, 1)  # positive
        code, nb = ac_enc[0x10]
        w.write(code, nb)
        w.write(0, 1)  # EOBRUN = 2 + 0
        code, nb = ac_enc[0x10]
        w.write(code, nb)
        w.write(0, 1)
        ac_bits = w.flush()
        data = self._assemble(
            [((0, 0, 0, 0), dc_bits), ((1, 63, 0, 0), ac_bits)]
        )
        out = decode_jpeg(data)
        zz0 = [0] * 64
        zz0[0], zz0[1] = 0, 1
        want = self._expected(
            [zz0, [8] + [0] * 63, [16] + [0] * 63, [24] + [0] * 63]
        )
        assert out.shape == (8, 32)
        assert np.array_equal(out, want)

    def test_ac_refinement_eob_run_carries_correction_bits(self):
        from ecollector_spark.datapipe.jpeg_codec import _BitWriter, _magnitude

        dc_enc = _huff_spec_codes(self.DC_SPEC)
        ac_enc = _huff_spec_codes(self.AC_SPEC)
        w = _BitWriter()
        pred = 0
        for dc in (0, 0, 0, 0):
            size, amp = _magnitude(dc - pred)
            code, nb = dc_enc[size]
            w.write(code, nb)
            pred = dc
        dc_bits = w.flush()
        # AC first at Al=1: block0 zz[1] newly significant (stored 2),
        # block2 zz[2] newly significant negative (stored -2); EOB1 runs
        # cover the remainders (block0+1, block2+3)
        w = _BitWriter()
        code, nb = ac_enc[0x01]
        w.write(code, nb)
        w.write(1, 1)  # +1 at zz[1] -> stored +2
        code, nb = ac_enc[0x10]
        w.write(code, nb)
        w.write(0, 1)
        code, nb = ac_enc[0x11 - 0x10]  # 0x01 again: run0 size1
        w.write(code, nb)
        w.write(0, 1)  # negative: -1 -> stored -2 ... at zz[1] of block2
        code, nb = ac_enc[0x10]
        w.write(code, nb)
        w.write(0, 1)
        ac1_bits = w.flush()
        # AC refinement (Ah=1, Al=0) with ONE EOB2 symbol at block0 plus
        # an extra EOB... : EOBRUN=2 covers blocks 0+1 — block0's
        # correction bit (1: value 3) rides AFTER the EOB symbol; then
        # EOB2 for blocks 2+3 with block2's correction bit (0: stays -2)
        w = _BitWriter()
        code, nb = ac_enc[0x10]
        w.write(code, nb)
        w.write(0, 1)  # EOBRUN = 2
        w.write(1, 1)  # correction bit for block0 zz[1]: 2 -> 3
        code, nb = ac_enc[0x10]
        w.write(code, nb)
        w.write(0, 1)
        w.write(0, 1)  # correction bit for block2 zz[1]: stays -2
        ac2_bits = w.flush()
        data = self._assemble(
            [
                ((0, 0, 0, 0), dc_bits),
                ((1, 63, 0, 1), ac1_bits),
                ((1, 63, 1, 0), ac2_bits),
            ]
        )
        out = decode_jpeg(data)
        zz0 = [0] * 64
        zz0[1] = 3
        zz2 = [0] * 64
        zz2[1] = -2
        want = self._expected([zz0, [0] * 64, zz2, [0] * 64])
        assert np.array_equal(out, want)


def test_progressive_unexpected_rst_is_valueerror():
    """An un-announced RSTn inside a progressive scan must surface as the
    documented loud ValueError, never the internal control-flow class."""
    img = (np.arange(16 * 16, dtype=np.uint8)).reshape(16, 16)
    data = encode_jpeg(img, quality=85, progressive=True)
    sos = data.index(b"\xff\xda")
    seglen = struct.unpack(">H", data[sos + 2 : sos + 4])[0]
    scan_at = sos + 2 + seglen
    corrupt = bytearray(data)
    corrupt[scan_at + 2 : scan_at + 2] = b"\xff\xd3"
    with pytest.raises(ValueError):
        decode_jpeg(bytes(corrupt))


class TestExifOrientation:
    """EXIF orientation (r10): APP1 parse via the TIFF IFD walker, the
    splice builder, and the eight numpy transforms."""

    def test_roundtrip_all_orientations(self):
        import numpy as np

        from ecollector_spark.datapipe.jpeg_codec import (
            add_exif_orientation,
            encode_jpeg,
            exif_orientation,
            jpeg_header,
        )

        base = encode_jpeg(np.full((8, 12), 128, dtype=np.uint8))
        assert exif_orientation(base) == 1  # no EXIF -> upright
        for o in range(1, 9):
            tagged = add_exif_orientation(base, o)
            assert exif_orientation(tagged) == o
            # the spliced segment must not break ordinary decode paths
            assert jpeg_header(tagged) == jpeg_header(base)

    def test_big_endian_exif_block(self):
        import struct

        import numpy as np

        from ecollector_spark.datapipe.jpeg_codec import (
            encode_jpeg,
            exif_orientation,
        )

        base = encode_jpeg(np.zeros((4, 4), dtype=np.uint8))
        tiff = (
            b"MM" + struct.pack(">HI", 42, 8)
            + struct.pack(">H", 1)
            + struct.pack(">HHIHH", 274, 3, 1, 6, 0)
            + struct.pack(">I", 0)
        )
        payload = b"Exif\x00\x00" + tiff
        app1 = b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload
        assert exif_orientation(base[:2] + app1 + base[2:]) == 6

    def test_malformed_exif_degrades_to_upright(self):
        import struct

        import numpy as np

        from ecollector_spark.datapipe.jpeg_codec import (
            add_exif_orientation,
            encode_jpeg,
            exif_orientation,
        )

        base = encode_jpeg(np.zeros((4, 4), dtype=np.uint8))
        tagged = bytearray(add_exif_orientation(base, 6))
        tagged[10:12] = b"XX"  # corrupt the TIFF byte-order mark
        assert exif_orientation(bytes(tagged)) == 1
        with pytest.raises(ValueError, match="SOI"):
            exif_orientation(b"not a jpeg")
        with pytest.raises(ValueError, match="1..8"):
            add_exif_orientation(base, 9)

    def test_apply_orientation_transforms(self):
        import numpy as np

        from ecollector_spark.datapipe.jpeg_codec import apply_orientation

        img = np.arange(6, dtype=np.uint8).reshape(2, 3)
        assert np.array_equal(apply_orientation(img, 1), img)
        assert np.array_equal(apply_orientation(img, 2), img[:, ::-1])
        assert np.array_equal(apply_orientation(img, 3), np.rot90(img, 2))
        assert np.array_equal(apply_orientation(img, 4), img[::-1])
        assert np.array_equal(apply_orientation(img, 5), img.T)
        assert np.array_equal(apply_orientation(img, 6), np.rot90(img, -1))
        # transverse = flip along the anti-diagonal (PIL TRANSVERSE)
        assert np.array_equal(apply_orientation(img, 7), img.T[::-1, ::-1])
        assert np.array_equal(apply_orientation(img, 8), np.rot90(img, 1))
        # 5-8 swap the canvas
        assert apply_orientation(img, 6).shape == (3, 2)
        # color arrays keep their channel axis
        rgb = np.arange(24, dtype=np.uint8).reshape(2, 4, 3)
        assert apply_orientation(rgb, 6).shape == (4, 2, 3)

    def test_orientation_composes_with_real_decode(self):
        """Tag a gradient, decode, undo the orientation — the bright
        corner must land where orientation 6 (90 CW) says it should."""
        import numpy as np

        from ecollector_spark.datapipe.jpeg_codec import (
            add_exif_orientation,
            apply_orientation,
            decode_jpeg,
            exif_orientation,
        )

        img = np.add.outer(
            np.arange(0, 160, 20, dtype=np.uint16),
            np.arange(0, 96, 8, dtype=np.uint16),
        ).astype(np.uint8)  # 8x12, brightest bottom-right
        from ecollector_spark.datapipe.jpeg_codec import encode_jpeg

        tagged = add_exif_orientation(encode_jpeg(img, quality=95), 6)
        o = exif_orientation(tagged)
        up = apply_orientation(decode_jpeg(tagged), o)
        assert up.shape == (12, 8)
        # the stored image is upright with its bright corner at
        # bottom-right; undoing orientation 6 (transpose + column flip)
        # moves that corner to bottom-LEFT of the new canvas
        corners = {
            (0, 0): up[0, 0], (0, -1): up[0, -1],
            (-1, 0): up[-1, 0], (-1, -1): up[-1, -1],
        }
        assert max(corners, key=lambda k: int(corners[k])) == (-1, 0)

    def test_corner_permutations_distinct_across_all_eight(self):
        """The mm_jpeg_exif_orientation gate's premise: over a quadrant
        image with four distinct block values, the oriented corner
        tuple is a DISTINCT permutation for every orientation — so the
        gate pins which transform ran, and the oracle's CASE table
        matches the codec's transforms exactly."""
        import numpy as np

        from ecollector_spark.datapipe.jpeg_codec import apply_orientation

        img = np.zeros((16, 16), np.uint8)
        img[:8, :8], img[:8, 8:], img[8:, :8], img[8:, 8:] = 10, 70, 140, 200
        seen = {}
        # the oracle's permutation table (tl, tr, bl, br) per orientation
        want = {
            1: (10, 70, 140, 200), 2: (70, 10, 200, 140),
            3: (200, 140, 70, 10), 4: (140, 200, 10, 70),
            5: (10, 140, 70, 200), 6: (140, 10, 200, 70),
            7: (200, 70, 140, 10), 8: (70, 200, 10, 140),
        }
        for o in range(1, 9):
            out = apply_orientation(img, o)
            t = (int(out[0, 0]), int(out[0, -1]),
                 int(out[-1, 0]), int(out[-1, -1]))
            assert t == want[o], (o, t)
            seen[t] = o
        assert len(seen) == 8  # all eight distinct

    def test_extract_oriented_corners_spark(self, spark):
        """The Spark surface behind the gate: synthesize, decode, undo,
        corners — closed form for a couple of doc_ids."""
        import math

        from ecollector_spark.datapipe.multimodal import (
            attach_synthetic_exif_jpeg_media,
            extract_oriented_corners,
        )

        def dec(v, q):
            q00 = max(1, min(255, (16 * (200 - 2 * q) + 50) // 100))
            dc = math.floor(8.0 * (v - 128) / q00 + 0.5)
            return max(0, min(255, math.floor(dc * q00 / 8.0 + 0.5) + 128))

        docs = spark.createDataFrame([(4,), (13,)], "doc_id long")
        out = {
            r["doc_id"]: r
            for r in extract_oriented_corners(
                attach_synthetic_exif_jpeg_media(docs)
            ).collect()
        }
        # doc 4: orientation 5 (transpose) -> (a, c, b, d)
        q, a, b, c, d = 79, 4, 68, 132, 196
        r = out[4]
        assert r["orientation"] == 5
        assert (r["tl"], r["tr"], r["bl"], r["br"]) == (
            dec(a, q), dec(c, q), dec(b, q), dec(d, q))
        # doc 13: orientation 6 (rot 90 CW) -> (c, a, d, b)
        q, a, b, c, d = 88, 13, 77, 141, 205
        r = out[13]
        assert r["orientation"] == 6
        assert (r["tl"], r["tr"], r["bl"], r["br"]) == (
            dec(c, q), dec(a, q), dec(d, q), dec(b, q))
