"""Pure-Python FLAC codec — real compressed-audio decode for the
multimodal operators, from scratch against the public xiph.org FLAC
format specification (and RFC 9639).

The sandbox has no ffmpeg/libFLAC, but FLAC is a fully-published
lossless format implementable with stdlib + numpy: a STREAMINFO
metadata block, then frames of bit-packed subframes (CONSTANT /
VERBATIM / FIXED-predictor / LPC) whose residuals are Rice-coded in
partitions. Because the format is LOSSLESS, ``decode_flac(encode_flac(
x)) == x`` exactly, so — like the GIF codec — the value gate needs no
numeric tolerance and a DuckDB oracle can predict audio features
analytically for synthetic waveforms without reading FLAC.

Scope (refusals are loud and by name, the repo's codec contract):

- decode: 8/16-bit samples, all four channel assignments (independent,
  left/side, right/side, mid/side), subframe types CONSTANT, VERBATIM,
  FIXED (orders 0-4) and LPC (orders 1-32), both Rice methods
  (4-bit RICE and 5-bit RICE2 params) incl. the escape-to-verbatim
  partition, wasted bits, fixed and variable blocking strategies,
  CRC-8 / CRC-16 / MD5 integrity checks.
- encode: 16-bit mono/stereo, fixed blocking, per-block best FIXED
  predictor (order 0-4 by least sum |residual|) or CONSTANT, one Rice
  partition with a cost-chosen parameter, independent / left-side /
  mid-side stereo decorrelation.
- NOT implemented (raise ``NotImplementedError`` naming the feature):
  12/20/24/32-bit sample sizes, >2 channels on encode.

Reference parity: the reference has no audio path — this backs SURVEY
§"multimodal" (training-data pipeline requirement, not an ecollector
feature). Corrupt input fails with ``ValueError`` like the other
codecs (bounds-checked reads, CRC/MD5 verification).
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

_SYNC = 0b11111111111110

#: frame-header sample-rate code table (code -> Hz); 0 = STREAMINFO,
#: 12/13/14 read trailing bytes, 15 invalid
_RATE_CODES = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}

#: frame-header sample-size code table (code -> bits); 0 = STREAMINFO
_BPS_CODES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}

#: fixed-predictor coefficients by order (order o predicts x[n] from
#: the binomial combination of the o previous samples)
_FIXED_COEF = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _crc_table(poly: int, width: int) -> list[int]:
    mask, top = (1 << width) - 1, 1 << (width - 1)
    table = []
    for b in range(256):
        r = b << (width - 8)
        for _ in range(8):
            r = ((r << 1) ^ poly) & mask if r & top else (r << 1) & mask
        table.append(r)
    return table


_CRC8 = _crc_table(0x07, 8)
_CRC16 = _crc_table(0x8005, 16)


def _crc8(data: bytes) -> int:
    r = 0
    for b in data:
        r = _CRC8[r ^ b]
    return r


def _crc16(data: bytes) -> int:
    r = 0
    for b in data:
        r = ((r << 8) & 0xFFFF) ^ _CRC16[((r >> 8) ^ b) & 0xFF]
    return r


class _Bits:
    """MSB-first bit reader with bounds-checked reads (truncated input
    is a ValueError, the codec corrupt-input contract)."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos  # byte position
        self.bit = 0  # bits consumed within data[pos]

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        end_bit = self.pos * 8 + self.bit + n
        if end_bit > len(self.data) * 8:
            raise ValueError("truncated FLAC stream (bit read past end)")
        out = 0
        need = n
        while need > 0:
            avail = 8 - self.bit
            take = min(avail, need)
            byte = self.data[self.pos]
            out = (out << take) | ((byte >> (avail - take)) & ((1 << take) - 1))
            self.bit += take
            need -= take
            if self.bit == 8:
                self.bit = 0
                self.pos += 1
        return out

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >= 1 << (n - 1) else v

    def unary(self) -> int:
        """Count 0-bits up to the terminating 1-bit (libFLAC unary)."""
        count = 0
        while True:
            if self.pos >= len(self.data):
                raise ValueError("truncated FLAC stream (unary past end)")
            byte = self.data[self.pos]
            rest = byte & ((1 << (8 - self.bit)) - 1)
            if rest == 0:
                count += 8 - self.bit
                self.bit = 0
                self.pos += 1
                continue
            lead = (8 - self.bit) - rest.bit_length()
            count += lead
            self.bit += lead + 1
            if self.bit == 8:
                self.bit = 0
                self.pos += 1
            return count

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.pos += 1


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        if n == 0:
            return
        self.acc = (self.acc << n) | (value & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_unary(self, value: int) -> None:
        while value >= 32:
            self.write(0, 32)
            value -= 32
        self.write(1, value + 1)

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.buf)


def _utf8_number(value: int) -> bytes:
    """FLAC's extended-UTF-8 coded frame/sample number."""
    if value < 0x80:
        return bytes([value])
    for nbytes in range(2, 8):
        payload_bits = 6 * (nbytes - 1) + (7 - nbytes if nbytes < 7 else 0)
        if value < (1 << payload_bits):
            parts = []
            v = value
            for _ in range(nbytes - 1):
                parts.append(0x80 | (v & 0x3F))
                v >>= 6
            if nbytes < 7:
                lead = ((0xFF << (8 - nbytes)) & 0xFF) | v
            else:
                lead = 0xFE
            return bytes([lead] + parts[::-1])
    raise ValueError(f"number too large for FLAC UTF-8 coding: {value}")


def _read_utf8_number(bits: _Bits) -> int:
    b0 = bits.read(8)
    if b0 < 0x80:
        return b0
    if b0 == 0xFE:
        nbytes, value = 7, 0
    else:
        nbytes = 8 - (b0 ^ 0xFF).bit_length()
        if nbytes < 2 or nbytes > 6:
            raise ValueError(f"bad UTF-8 coded number lead byte {b0:#x}")
        value = b0 & (0x7F >> nbytes)
    for _ in range(nbytes - 1):
        b = bits.read(8)
        if b & 0xC0 != 0x80:
            raise ValueError("bad UTF-8 coded number continuation byte")
        value = (value << 6) | (b & 0x3F)
    return value


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------


def _zigzag(res: np.ndarray) -> np.ndarray:
    r = res.astype(np.int64)
    return np.where(r >= 0, r << 1, (-r << 1) - 1)


def _best_rice_param(u: np.ndarray) -> tuple[int, int]:
    """(param, cost_bits) minimizing unary+binary cost for zigzagged
    residuals, capped below the RICE escape code."""
    best_p, best_cost = 0, None
    for p in range(15):
        cost = int(np.sum(u >> p)) + len(u) * (p + 1)
        if best_cost is None or cost < best_cost:
            best_p, best_cost = p, cost
    return best_p, best_cost


def _write_residual(w: _BitWriter, res: np.ndarray) -> None:
    """One-partition Rice residual (partition order 0), escaping to
    raw b-bit storage when cheaper (huge residual spikes)."""
    u = _zigzag(res)
    param, cost = _best_rice_param(u)
    raw_bits = max(int(u.max(initial=0)).bit_length() + 1, 1)
    if raw_bits < 31 and len(u) * raw_bits + 5 < cost:
        w.write(0b00, 2)  # method: RICE
        w.write(0, 4)  # partition order 0
        w.write(0b1111, 4)  # escape
        w.write(raw_bits, 5)
        for v in res.astype(np.int64):
            w.write(int(v) & ((1 << raw_bits) - 1), raw_bits)
        return
    w.write(0b00, 2)
    w.write(0, 4)
    w.write(param, 4)
    for v in u:
        w.write_unary(int(v) >> param)
        w.write(int(v), param)


def _encode_subframe(w: _BitWriter, x: np.ndarray, bps: int) -> None:
    x = x.astype(np.int64)
    n = len(x)
    if n and np.all(x == x[0]):
        w.write(0, 1)
        w.write(0b000000, 6)  # CONSTANT
        w.write(0, 1)  # no wasted bits
        w.write(int(x[0]) & ((1 << bps) - 1), bps)
        return
    best_o, best_res, best_cost = 0, x, int(np.sum(np.abs(x)))
    for o in range(1, min(5, n)):
        coef = np.array(_FIXED_COEF[o], dtype=np.int64)
        pred = np.zeros(n - o, dtype=np.int64)
        for j, c in enumerate(coef):
            pred += c * x[o - 1 - j : n - 1 - j]
        res = x[o:] - pred
        cost = int(np.sum(np.abs(res)))
        if cost < best_cost:
            best_o, best_res, best_cost = o, res, cost
    w.write(0, 1)
    w.write(0b001000 | best_o, 6)  # FIXED, order
    w.write(0, 1)
    for v in x[:best_o]:  # warm-up
        w.write(int(v) & ((1 << bps) - 1), bps)
    _write_residual(w, best_res if best_o else x)


def encode_flac(
    samples: np.ndarray,
    rate: int = 8000,
    block_size: int = 4096,
    stereo_mode: str = "independent",
) -> bytes:
    """FLAC bytes from int16 samples — (n,) mono or (n, 2) stereo.
    ``stereo_mode``: independent | left_side | mid_side (decode
    handles all assignments; the non-default modes exist so tests
    exercise every decorrelation path with in-repo streams)."""
    arr = np.asarray(samples, dtype=np.int16).astype(np.int64)
    if arr.ndim == 1:
        arr = arr[:, None]
    if arr.ndim != 2 or arr.shape[0] < 1:
        raise ValueError(f"unsupported sample shape {np.asarray(samples).shape}")
    n, ch = arr.shape
    if ch not in (1, 2):
        raise NotImplementedError(
            f"FLAC encode for {ch} channels is not implemented (mono/stereo only)"
        )
    if stereo_mode not in ("independent", "left_side", "mid_side"):
        raise ValueError(f"unknown stereo_mode {stereo_mode!r}")
    bps = 16
    md5 = hashlib.md5(
        np.ascontiguousarray(arr.astype("<i2")).tobytes()
    ).digest()
    # STREAMINFO: fixed block size (last frame may be short)
    bs = min(block_size, 1 << 16)
    si = _BitWriter()
    si.write(bs, 16)
    si.write(bs, 16)
    si.write(0, 24)  # min frame size unknown
    si.write(0, 24)  # max frame size unknown
    si.write(int(rate), 20)
    si.write(ch - 1, 3)
    si.write(bps - 1, 5)
    si.write(n & ((1 << 36) - 1), 36)
    streaminfo = si.bytes() + md5
    out = bytearray(b"fLaC")
    out += bytes([0x80]) + len(streaminfo).to_bytes(3, "big") + streaminfo
    for fi, start in enumerate(range(0, n, bs)):
        block = arr[start : start + bs]
        m = len(block)
        w = _BitWriter()
        w.write(_SYNC, 14)
        w.write(0, 1)  # mandatory 0
        w.write(0, 1)  # fixed blocksize strategy
        # blocksize: use 16-bit-at-end code (0111) — always valid
        w.write(0b0111, 4)
        w.write(0b0000, 4)  # sample rate from STREAMINFO
        if ch == 1 or stereo_mode == "independent":
            w.write(ch - 1, 4)
            subs = [block[:, c] for c in range(ch)]
            sub_bps = [bps] * ch
        elif stereo_mode == "left_side":
            w.write(0b1000, 4)
            subs = [block[:, 0], block[:, 0] - block[:, 1]]
            sub_bps = [bps, bps + 1]
        else:  # mid_side
            w.write(0b1010, 4)
            side = block[:, 0] - block[:, 1]
            mid = (block[:, 0] + block[:, 1]) >> 1
            subs = [mid, side]
            sub_bps = [bps, bps + 1]
        w.write(0b100, 3)  # 16-bit samples
        w.write(0, 1)  # mandatory 0
        for b in _utf8_number(fi):
            w.write(b, 8)
        w.write(m - 1, 16)  # the 0b0111 trailing blocksize
        hdr = w.buf + (
            bytes([(w.acc << (8 - w.nbits)) & 0xFF]) if w.nbits else b""
        )
        w.write(_crc8(bytes(hdr)), 8)
        for x, sb in zip(subs, sub_bps):
            _encode_subframe(w, x, sb)
        w.align()
        frame = w.bytes()
        out += frame + struct.pack(">H", _crc16(frame))
    return bytes(out)


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------


def flac_header(data: bytes) -> tuple[int, int, int, int]:
    """(channels, sample_rate, bits_per_sample, n_samples) from
    STREAMINFO without decoding frames — the cheap metadata probe."""
    if data[:4] != b"fLaC":
        raise ValueError("not a FLAC stream (bad fLaC magic)")
    pos = 4
    while True:
        if pos + 4 > len(data):
            raise ValueError("truncated FLAC metadata")
        last, btype = data[pos] >> 7, data[pos] & 0x7F
        length = int.from_bytes(data[pos + 1 : pos + 4], "big")
        if pos + 4 + length > len(data):
            raise ValueError("truncated FLAC metadata block")
        if btype == 0:
            if length < 34:
                raise ValueError("short STREAMINFO block")
            b = _Bits(data, pos + 4)
            b.read(16), b.read(16), b.read(24), b.read(24)
            rate = b.read(20)
            ch = b.read(3) + 1
            bps = b.read(5) + 1
            nsamp = b.read(36)
            return ch, rate, bps, nsamp
        if btype == 127:
            raise ValueError("invalid FLAC metadata block type 127")
        pos += 4 + length
        if last:
            break
    raise ValueError("FLAC stream has no STREAMINFO block")


def _read_residual(bits: _Bits, block_size: int, order: int) -> np.ndarray:
    method = bits.read(2)
    if method not in (0, 1):
        raise ValueError(f"reserved residual coding method {method}")
    plen = 4 if method == 0 else 5
    escape = (1 << plen) - 1
    porder = bits.read(4)
    nparts = 1 << porder
    if block_size % nparts:
        raise ValueError(
            f"block size {block_size} not divisible by 2^{porder} partitions"
        )
    out = np.empty(block_size - order, dtype=np.int64)
    idx = 0
    for part in range(nparts):
        count = block_size >> porder
        if part == 0:
            count -= order
        if count < 0:
            raise ValueError("residual partition shorter than predictor order")
        param = bits.read(plen)
        if param == escape:
            width = bits.read(5)
            for i in range(count):
                out[idx + i] = bits.read_signed(width) if width else 0
        else:
            for i in range(count):
                q = bits.unary()
                u = (q << param) | bits.read(param)
                out[idx + i] = (u >> 1) ^ -(u & 1)
        idx += count
    return out


def _decode_subframe(bits: _Bits, block_size: int, bps: int) -> np.ndarray:
    if bits.read(1):
        raise ValueError("subframe header pad bit set")
    stype = bits.read(6)
    wasted = 0
    if bits.read(1):
        wasted = bits.unary() + 1
        bps -= wasted
        if bps <= 0:
            raise ValueError("wasted bits exceed sample size")
    if stype == 0b000000:
        x = np.full(block_size, bits.read_signed(bps), dtype=np.int64)
    elif stype == 0b000001:
        x = np.array(
            [bits.read_signed(bps) for _ in range(block_size)], dtype=np.int64
        )
    elif 0b001000 <= stype <= 0b001100:
        order = stype & 0b000111
        if order > block_size:
            raise ValueError("FIXED order exceeds block size")
        warm = [bits.read_signed(bps) for _ in range(order)]
        res = _read_residual(bits, block_size, order)
        x = np.empty(block_size, dtype=np.int64)
        x[:order] = warm
        coef = _FIXED_COEF[order]
        for i in range(order, block_size):
            pred = 0
            for j, c in enumerate(coef):
                pred += c * x[i - 1 - j]
            x[i] = res[i - order] + pred
    elif stype >= 0b100000:
        order = (stype & 0b011111) + 1
        if order > block_size:
            raise ValueError("LPC order exceeds block size")
        warm = [bits.read_signed(bps) for _ in range(order)]
        prec = bits.read(4)
        if prec == 0b1111:
            raise ValueError("invalid LPC precision code 1111")
        prec += 1
        shift = bits.read_signed(5)
        if shift < 0:
            raise ValueError("negative LPC shift")
        coef = [bits.read_signed(prec) for _ in range(order)]
        res = _read_residual(bits, block_size, order)
        x = np.empty(block_size, dtype=np.int64)
        x[:order] = warm
        for i in range(order, block_size):
            acc = 0
            for j in range(order):
                acc += coef[j] * x[i - 1 - j]
            x[i] = res[i - order] + (acc >> shift)
    else:
        raise ValueError(f"reserved subframe type {stype:#08b}")
    return x << wasted if wasted else x


def decode_flac(data: bytes) -> tuple[np.ndarray, int]:
    """Decode to (samples, sample_rate) — int32 (n,) mono or
    (n, channels). Verifies frame CRC-8/CRC-16 and the STREAMINFO MD5
    when present; failures raise ValueError (corrupt-input contract).
    Sample sizes other than 8/16 bits refuse by name."""
    ch, rate, bps, nsamp = flac_header(data)
    if bps not in (8, 16):
        raise NotImplementedError(
            f"FLAC {bps}-bit samples are not implemented (8/16-bit only)"
        )
    # find end of metadata
    if data[:4] != b"fLaC":
        raise ValueError("not a FLAC stream")
    pos = 4
    md5_expect = b"\x00" * 16
    while True:
        if pos + 4 > len(data):
            raise ValueError("truncated FLAC metadata")
        last, btype = data[pos] >> 7, data[pos] & 0x7F
        length = int.from_bytes(data[pos + 1 : pos + 4], "big")
        if pos + 4 + length > len(data):
            raise ValueError("truncated FLAC metadata block")
        if btype == 0:
            md5_expect = data[pos + 4 + 18 : pos + 4 + 34]
        pos += 4 + length
        if last:
            break
    channels = [[] for _ in range(ch)]
    got = 0
    while pos < len(data) and (nsamp == 0 or got < nsamp):
        bits = _Bits(data, pos)
        if bits.read(14) != _SYNC:
            raise ValueError(f"bad frame sync at byte {pos}")
        if bits.read(1):
            raise ValueError("frame header reserved bit set")
        bits.read(1)  # blocking strategy (number coding differs only)
        bs_code = bits.read(4)
        rate_code = bits.read(4)
        ch_code = bits.read(4)
        bps_code = bits.read(3)
        if bits.read(1):
            raise ValueError("frame header mandatory-zero bit set")
        _read_utf8_number(bits)
        if bs_code == 0:
            raise ValueError("reserved block size code 0")
        elif bs_code == 1:
            block_size = 192
        elif bs_code <= 5:
            block_size = 576 << (bs_code - 2)
        elif bs_code == 6:
            block_size = bits.read(8) + 1
        elif bs_code == 7:
            block_size = bits.read(16) + 1
        else:
            block_size = 256 << (bs_code - 8)
        if rate_code == 0:
            pass
        elif rate_code in _RATE_CODES:
            if _RATE_CODES[rate_code] != rate:
                raise ValueError("frame sample rate disagrees with STREAMINFO")
        elif rate_code == 12:
            bits.read(8)
        elif rate_code in (13, 14):
            bits.read(16)
        else:
            raise ValueError("invalid sample rate code 15")
        frame_bps = bps if bps_code == 0 else _BPS_CODES.get(bps_code)
        if frame_bps is None:
            raise ValueError(f"reserved sample size code {bps_code}")
        if frame_bps != bps:
            raise ValueError("frame sample size disagrees with STREAMINFO")
        hdr_end = bits.pos + (1 if bits.bit else 0)
        crc8 = bits.read(8)
        if _crc8(data[pos:hdr_end]) != crc8:
            raise ValueError("frame header CRC-8 mismatch")
        if ch_code <= 0b0111:
            if ch_code + 1 != ch:
                raise ValueError("frame channel count disagrees with STREAMINFO")
            subs = [_decode_subframe(bits, block_size, bps) for _ in range(ch)]
        elif ch_code in (0b1000, 0b1001, 0b1010):
            if ch != 2:
                raise ValueError("stereo decorrelation on a non-stereo stream")
            # the SIDE channel carries one extra bit
            if ch_code == 0b1000:  # left/side
                left = _decode_subframe(bits, block_size, bps)
                side = _decode_subframe(bits, block_size, bps + 1)
                subs = [left, left - side]
            elif ch_code == 0b1001:  # right/side
                side = _decode_subframe(bits, block_size, bps + 1)
                right = _decode_subframe(bits, block_size, bps)
                subs = [side + right, right]
            else:  # mid/side
                mid = _decode_subframe(bits, block_size, bps)
                side = _decode_subframe(bits, block_size, bps + 1)
                m2 = (mid << 1) | (side & 1)
                subs = [(m2 + side) >> 1, (m2 - side) >> 1]
        else:
            raise ValueError(f"reserved channel assignment {ch_code:#06b}")
        bits.align()
        if bits.pos + 2 > len(data):
            raise ValueError("truncated frame footer")
        (crc16,) = struct.unpack(">H", data[bits.pos : bits.pos + 2])
        if _crc16(data[pos : bits.pos]) != crc16:
            raise ValueError("frame CRC-16 mismatch")
        for c in range(ch):
            channels[c].append(subs[c])
        got += block_size
        pos = bits.pos + 2
    if nsamp and got < nsamp:
        raise ValueError(
            f"truncated FLAC stream: {got} of {nsamp} samples decoded"
        )
    cols = [np.concatenate(chan)[: nsamp or None] for chan in channels]
    arr = np.stack(cols, axis=1).astype(np.int32)
    lo, hi = -(1 << (bps - 1)), (1 << (bps - 1)) - 1
    if arr.min(initial=0) < lo or arr.max(initial=0) > hi:
        raise ValueError("decoded sample exceeds the declared sample size")
    if md5_expect != b"\x00" * 16:
        dtype = "<i2" if bps == 16 else "i1"
        if hashlib.md5(
            np.ascontiguousarray(arr.astype(dtype)).tobytes()
        ).digest() != md5_expect:
            raise ValueError("decoded audio MD5 mismatch (corrupt stream)")
    return (arr[:, 0] if ch == 1 else arr), rate
