"""Pure-Python baseline JPEG codec (stdlib + numpy) — closes the one
codec gap a real training corpus hits immediately (VERDICT r7 missing #1:
"a real user's corpus is mostly JPEG").

Implements ITU-T T.81 Huffman DCT modes, 8-bit:

- **encode**: grayscale or RGB, 4:4:4 or 4:2:0, Annex K quant tables
  scaled by the libjpeg quality formula, Annex K standard Huffman
  tables, JFIF APP0; baseline single-scan (optionally with DRI/RSTn) or
  progressive (SOF2) via a fixed scan script covering all four Annex-G
  scan modes.
- **decode**: SOF0 baseline, SOF1 extended sequential (identical syntax
  at 8-bit), and SOF2 progressive frames — spectral selection +
  successive approximation, DC/AC first and refinement scans, general
  EOBn end-of-band runs — 1-4 components with sampling factors up to
  2x2 (covers 4:4:4 / 4:2:2 / 4:2:0 from real encoders), multiple
  DQT/DHT segments, DRI + RSTn restart handling, APPn/COM skipped.
- **refused, loudly**: lossless (SOF3), arithmetic coding (SOF9-15),
  differential modes, 12-bit precision, DNL. NotImplementedError names
  the feature — never a silently wrong decode.

Determinism: the DCT/IDCT are the orthonormal 8-point basis in float64
(IEEE-identical everywhere), and every round is an explicit
``floor(x + 0.5)`` (half-up) so a SQL oracle can replicate the exact
integer outputs. For a FLAT gray image the whole pipeline collapses to a
closed form the driver gate checks end-to-end:

    dc   = floor(8*(v - 128)/q00 + 0.5)        # quantized DC, AC all 0
    v'   = clip(floor(dc*q00/8 + 0.5) + 128)   # every decoded pixel

Reference parity: the reference has no image path at all — this backs
SURVEY §"multimodal" (training-data pipeline requirement, like
png_codec.py / wav_codec.py / avi_codec.py).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# Annex K tables (ITU-T T.81 K.1/K.2 quantization, K.3.3 Huffman)
# ---------------------------------------------------------------------------

_QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64).reshape(8, 8)

_QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64).reshape(8, 8)

#: zigzag scan order: _ZIGZAG[i] = flat row-major index of the i-th
#: zigzag position
_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)
_UNZIGZAG = np.argsort(_ZIGZAG)

# Annex K.3.3 standard Huffman specs: (BITS counts per code length 1-16,
# HUFFVAL symbol list)
_DC_LUMA_SPEC = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROMA_SPEC = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUMA_SPEC = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_AC_CHROMA_SPEC = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

#: orthonormal 8-point DCT basis: C[0]=1/sqrt(8), C[k,n]=cos((2n+1)k*pi/16)/2.
#: 2-D: coef = C @ block @ C.T; block = C.T @ coef @ C. DC of a flat block
#: of value d is exactly 8d — the closed form the value gate uses.
_C = np.zeros((8, 8), dtype=np.float64)
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = (1.0 / np.sqrt(8.0)) if _k == 0 else (
            0.5 * np.cos((2 * _n + 1) * _k * np.pi / 16.0)
        )


def _round_half_up(x: np.ndarray) -> np.ndarray:
    """floor(x + 0.5): the one rounding used everywhere, chosen because a
    SQL oracle reproduces it exactly (numpy's np.round is half-even)."""
    return np.floor(x + 0.5).astype(np.int64)


def quality_scaled_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """libjpeg quality scaling: scale = 5000/Q (Q<50) else 200-2Q;
    q = clip((base*scale + 50)/100, 1, 255)."""
    q = max(1, min(100, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    out = []
    for base in (_QUANT_LUMA, _QUANT_CHROMA):
        t = (base * scale + 50) // 100
        out.append(np.clip(t, 1, 255).astype(np.int64))
    return out[0], out[1]


def _build_huff_encoder(spec) -> dict[int, tuple[int, int]]:
    """symbol -> (code, nbits), canonical code assignment (T.81 C.2)."""
    bits, vals = spec
    table: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for nbits in range(1, 17):
        for _ in range(bits[nbits - 1]):
            table[vals[k]] = (code, nbits)
            code += 1
            k += 1
        code <<= 1
    return table


def _build_huff_decoder(bits, vals) -> dict[tuple[int, int], int]:
    """(nbits, code) -> symbol."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for nbits in range(1, 17):
        for _ in range(bits[nbits - 1]):
            table[(nbits, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _magnitude(v: int) -> tuple[int, int]:
    """(size, amplitude bits) per T.81 F.1.2.1: negative values encode as
    v + 2^size - 1."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = a.bit_length()
    if v < 0:
        v = v + (1 << size) - 1
    return size, v & ((1 << size) - 1)


def _extend(bits_val: int, size: int) -> int:
    """Inverse of _magnitude (T.81 F.2.2.1 EXTEND)."""
    if size == 0:
        return 0
    if bits_val < (1 << (size - 1)):
        return bits_val - (1 << size) + 1
    return bits_val


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, code: int, nbits: int) -> None:
        self._acc = (self._acc << nbits) | (code & ((1 << nbits) - 1))
        self._n += nbits
        while self._n >= 8:
            byte = (self._acc >> (self._n - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self._n -= 8
            self._acc &= (1 << self._n) - 1

    def flush(self) -> bytes:
        if self._n:
            pad = 8 - self._n
            self.write((1 << pad) - 1, pad)  # 1-fill per spec
        return bytes(self.out)


class _BitReader:
    """Entropy-segment bit reader: un-stuffs 0xFF00, stops at markers."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("truncated JPEG: entropy stream exhausted mid-scan")
        b = self.data[self.pos]
        if b == 0xFF:
            if self.pos + 1 >= len(self.data):
                raise ValueError("truncated JPEG: dangling 0xFF at end of scan")
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartMarker(nxt)
            else:
                raise ValueError(f"unexpected marker 0xFF{nxt:02X} in scan")
        else:
            self.pos += 1
        self._acc = (self._acc << 8) | b
        self._n += 8

    def read_bit(self) -> int:
        if self._n == 0:
            self._fill()
        self._n -= 1
        return (self._acc >> self._n) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for nbits in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((nbits, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in scan")

    def align_and_expect_restart(self, n: int) -> None:
        """Skip to the RSTn marker at a restart interval boundary."""
        self._acc = 0
        self._n = 0
        while self.pos + 1 < len(self.data) and (
            self.data[self.pos] != 0xFF or self.data[self.pos + 1] == 0x00
        ):
            self.pos += 1
        if self.pos + 1 >= len(self.data):
            raise ValueError("truncated JPEG: scan ended before RST marker")
        marker = self.data[self.pos + 1]
        if marker != 0xD0 + (n & 7):
            raise ValueError(
                f"expected RST{n & 7}, found 0xFF{marker:02X}"
            )
        self.pos += 2


class _RestartMarker(Exception):
    def __init__(self, marker: int):
        self.marker = marker


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


def _rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    r = img[:, :, 0].astype(np.float64)
    g = img[:, :, 1].astype(np.float64)
    b = img[:, :, 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    out = np.stack([y, cb, cr], axis=2)
    return np.clip(_round_half_up(out), 0, 255)


def _blocks_of(comp: np.ndarray) -> tuple[np.ndarray, int, int]:
    """Edge-replicate pad to multiples of 8 and split into 8x8 blocks;
    returns (blocks[by, bx, 8, 8], by, bx)."""
    h, w = comp.shape
    ph, pw = (-h) % 8, (-w) % 8
    comp = np.pad(comp, ((0, ph), (0, pw)), mode="edge")
    H, W = comp.shape
    by, bx = H // 8, W // 8
    blocks = comp.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3)
    return blocks, by, bx


def _encode_component_blocks(blocks: np.ndarray, qtab: np.ndarray) -> np.ndarray:
    """FDCT + quantize every 8x8 block: (by, bx, 8, 8) int64 zigzagged
    coefficient vectors (by, bx, 64).

    The DC term is computed EXACTLY as sum/8 (the DC basis is the
    constant 1/8; an integer sum divided by a power of two is exact in
    float64) instead of through the einsum — the matrix product loses an
    ulp, which flips quantization on exact .5 boundaries and would break
    the flat-image closed form the value gate's oracle predicts."""
    shifted = blocks.astype(np.float64) - 128.0
    coefs = np.einsum("km,ijmn,ln->ijkl", _C, shifted, _C)
    coefs[:, :, 0, 0] = shifted.sum(axis=(2, 3)) / 8.0
    q = _round_half_up(coefs / qtab)
    return q.reshape(*q.shape[:2], 64)[:, :, _ZIGZAG]


def _huff_encode_block(w: _BitWriter, zz: np.ndarray, pred: int,
                       dc_tab, ac_tab) -> int:
    dc = int(zz[0])
    size, amp = _magnitude(dc - pred)
    code, nbits = dc_tab[size]
    w.write(code, nbits)
    if size:
        w.write(amp, size)
    run = 0
    nz = np.nonzero(zz[1:])[0]
    last = nz[-1] + 1 if len(nz) else 0
    for i in range(1, last + 1):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, nbits = ac_tab[0xF0]  # ZRL
            w.write(code, nbits)
            run -= 16
        size, amp = _magnitude(v)
        code, nbits = ac_tab[(run << 4) | size]
        w.write(code, nbits)
        w.write(amp, size)
        run = 0
    if last < 63:
        code, nbits = ac_tab[0x00]  # EOB
        w.write(code, nbits)
    return dc


def _emit_ac_first(w: _BitWriter, zzb, ss, se, al, ac_tab) -> None:
    """AC-first progressive block (T.81 G.1.2.2): baseline RLE over the
    band with the point transform (divide by 2^al toward zero); runs past
    the last significant coefficient end in a plain EOB0."""
    run = 0
    for k in range(ss, se + 1):
        v = int(zzb[k])
        t = abs(v) >> al
        if t == 0:
            run += 1
            continue
        while run > 15:
            code, nb = ac_tab[0xF0]
            w.write(code, nb)
            run -= 16
        sv = t if v > 0 else -t
        size, amp = _magnitude(sv)
        code, nb = ac_tab[(run << 4) | size]
        w.write(code, nb)
        w.write(amp, size)
        run = 0
    if run > 0:
        code, nb = ac_tab[0x00]
        w.write(code, nb)


def _emit_ac_refine(w: _BitWriter, zzb, ss, se, al, ac_tab) -> None:
    """AC-refinement progressive block (T.81 G.1.2.3): one correction bit
    per already-nonzero coefficient, (run, 1)+sign insertions for newly
    significant ones, correction bits buffered and flushed after the next
    emitted symbol so the decoder reads them in k order during its
    advance; trailing state ends in EOB0 + the remaining buffered bits."""
    absv = [abs(int(zzb[k])) >> al for k in range(ss, se + 1)]
    eob = ss - 1
    for k in range(ss, se + 1):
        if absv[k - ss] == 1:
            eob = k
    run = 0
    pending: list[int] = []
    for k in range(ss, se + 1):
        t = absv[k - ss]
        if t == 0:
            run += 1
            continue
        while run > 15 and k <= eob:
            code, nb = ac_tab[0xF0]
            w.write(code, nb)
            run -= 16
            for b in pending:
                w.write(b, 1)
            pending = []
        if t > 1:  # already significant: correction bit only
            pending.append(t & 1)
            continue
        code, nb = ac_tab[(run << 4) | 1]
        w.write(code, nb)
        w.write(1 if int(zzb[k]) > 0 else 0, 1)
        for b in pending:
            w.write(b, 1)
        pending = []
        run = 0
    if run > 0 or pending:
        code, nb = ac_tab[0x00]
        w.write(code, nb)
        for b in pending:
            w.write(b, 1)


def _encode_progressive_scans(planes, samp, qy, qc, h, w) -> bytes:
    """All SOS segments of the fixed progressive scan script (see
    encode_jpeg): DC first interleaved at Al=1 -> per-component AC first
    (luma band split 1-5 / 6-63) at Al=1 -> DC refinement bit-plane ->
    per-component AC refinement to Al=0."""
    ncomp = len(planes)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    zz = []
    for ci, plane in enumerate(planes):
        hs, vs = samp[ci]
        need_h, need_w = mcuy * vs * 8, mcux * hs * 8
        ph, pw = need_h - plane.shape[0], need_w - plane.shape[1]
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
        blocks, _, _ = _blocks_of(plane)
        zz.append(_encode_component_blocks(blocks, qy if ci == 0 else qc))

    def scan_dims(ci):
        hs, vs = samp[ci]
        return -(-(-(-h * vs // vmax)) // 8), -(-(-(-w * hs // hmax)) // 8)

    enc = {
        (0, 0): _build_huff_encoder(_DC_LUMA_SPEC),
        (1, 0): _build_huff_encoder(_AC_LUMA_SPEC),
        (0, 1): _build_huff_encoder(_DC_CHROMA_SPEC),
        (1, 1): _build_huff_encoder(_AC_CHROMA_SPEC),
    }

    def sos_header(comps, ss, se, ah, al):
        seg = bytes([len(comps)])
        for ci in comps:
            seg += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
        seg += bytes([ss, se, (ah << 4) | al])
        return b"\xff\xda" + struct.pack(">H", len(seg) + 2) + seg

    out = bytearray()
    al = 1

    def dc_walk(emit):
        for my in range(mcuy):
            for mx in range(mcux):
                for ci in range(ncomp):
                    hs, vs = samp[ci]
                    for bv in range(vs):
                        for bh in range(hs):
                            emit(ci, int(zz[ci][my * vs + bv, mx * hs + bh, 0]))

    # DC first (interleaved, diff-coded on the >> al point transform)
    out += sos_header(list(range(ncomp)), 0, 0, 0, al)
    wtr = _BitWriter()
    preds = [0] * ncomp

    def _dc_first(ci, dc):
        v = dc >> al  # arithmetic shift per T.81 G.1.2.1
        size, amp = _magnitude(v - preds[ci])
        code, nb = enc[(0, 0 if ci == 0 else 1)][size]
        wtr.write(code, nb)
        if size:
            wtr.write(amp, size)
        preds[ci] = v

    dc_walk(_dc_first)
    out += wtr.flush()

    # AC first scans at Al=1 (luma split into two spectral bands)
    for ci in range(ncomp):
        ac_tab = enc[(1, 0 if ci == 0 else 1)]
        nbh, nbw = scan_dims(ci)
        for band in ([(1, 5), (6, 63)] if ci == 0 else [(1, 63)]):
            out += sos_header([ci], band[0], band[1], 0, al)
            wtr = _BitWriter()
            for by in range(nbh):
                for bx in range(nbw):
                    _emit_ac_first(wtr, zz[ci][by, bx], band[0], band[1],
                                   al, ac_tab)
            out += wtr.flush()

    # DC refinement bit-plane (interleaved, one raw bit per block)
    out += sos_header(list(range(ncomp)), 0, 0, al, 0)
    wtr = _BitWriter()
    dc_walk(lambda ci, dc: wtr.write(dc & 1, 1))
    out += wtr.flush()

    # AC refinement to Al=0
    for ci in range(ncomp):
        ac_tab = enc[(1, 0 if ci == 0 else 1)]
        nbh, nbw = scan_dims(ci)
        out += sos_header([ci], 1, 63, al, 0)
        wtr = _BitWriter()
        for by in range(nbh):
            for bx in range(nbw):
                _emit_ac_refine(wtr, zz[ci][by, bx], 1, 63, 0, ac_tab)
        out += wtr.flush()
    return bytes(out)


def _dqt_segment(tid: int, qtab: np.ndarray) -> bytes:
    payload = bytes([tid]) + bytes(int(x) for x in qtab.reshape(64)[_ZIGZAG])
    return b"\xff\xdb" + struct.pack(">H", len(payload) + 2) + payload


def _dht_segment(cls: int, tid: int, spec) -> bytes:
    bits, vals = spec
    payload = bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", len(payload) + 2) + payload


def _box_downsample(plane: np.ndarray) -> np.ndarray:
    """2x2 box average with half-up rounding (edge-replicated to even
    dims first) — the 4:2:0 chroma reduction."""
    h, w = plane.shape
    plane = np.pad(plane, ((0, h % 2), (0, w % 2)), mode="edge")
    s = (
        plane[0::2, 0::2] + plane[0::2, 1::2]
        + plane[1::2, 0::2] + plane[1::2, 1::2]
    )
    return _round_half_up(s / 4.0)


def encode_jpeg(
    img: np.ndarray,
    quality: int = 90,
    subsampling: str = "4:4:4",
    restart_interval: int = 0,
    progressive: bool = False,
) -> bytes:
    """JFIF bytes from (h, w) grayscale or (h, w, 3) RGB uint8.

    ``subsampling``: "4:4:4" (every component full-resolution) or
    "4:2:0" (chroma box-averaged 2x2; 16x16 MCUs). ``restart_interval``
    > 0 emits a DRI segment and RSTn markers every that-many MCUs.

    ``progressive`` (r9) emits a SOF2 frame with a fixed scan script
    covering all four Annex-G scan modes — interleaved DC first at Al=1,
    per-component AC first scans over split spectral bands at Al=1, a DC
    refinement bit-plane, then AC refinement to Al=0. The script ends at
    Al=0 everywhere, so the transmitted coefficients equal the baseline
    encoder's EXACTLY and the decode is pixel-identical to the baseline
    encoding of the same image (the round-trip pin the tests assert).
    End-of-band runs are always coded as plain EOB0 — spec-valid (an
    encoder may flush its EOB run after every block) and the Annex-K AC
    tables carry no EOBn>0 symbols; the decoder handles general EOBn."""
    img = np.ascontiguousarray(np.asarray(img, dtype=np.uint8))
    if img.ndim == 2:
        planes = [img.astype(np.int64)]
    elif img.ndim == 3 and img.shape[2] == 3:
        ycc = _rgb_to_ycbcr(img)
        planes = [ycc[:, :, 0], ycc[:, :, 1], ycc[:, :, 2]]
    else:
        raise ValueError(f"unsupported array shape {img.shape}")
    h, w = img.shape[:2]
    if h < 1 or w < 1:
        raise ValueError("empty image")
    if subsampling not in ("4:4:4", "4:2:0"):
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    ncomp = len(planes)
    if subsampling == "4:2:0" and ncomp == 3:
        samp = [(2, 2), (1, 1), (1, 1)]
        planes = [planes[0], _box_downsample(planes[1]), _box_downsample(planes[2])]
    else:
        samp = [(1, 1)] * ncomp
    qy, qc = quality_scaled_tables(quality)

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += (  # APP0 JFIF 1.01, no thumbnail
        b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
        + struct.pack(">HH", 1, 1) + b"\x00\x00"
    )
    out += _dqt_segment(0, qy)
    if ncomp == 3:
        out += _dqt_segment(1, qc)
    # SOF0 (baseline) / SOF2 (progressive)
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        qid = 0 if ci == 0 else 1
        hs, vs = samp[ci]
        sof += bytes([ci + 1, (hs << 4) | vs, qid])
    out += (b"\xff\xc2" if progressive else b"\xff\xc0") + struct.pack(
        ">H", len(sof) + 2
    ) + sof
    out += _dht_segment(0, 0, _DC_LUMA_SPEC)
    out += _dht_segment(1, 0, _AC_LUMA_SPEC)
    if ncomp == 3:
        out += _dht_segment(0, 1, _DC_CHROMA_SPEC)
        out += _dht_segment(1, 1, _AC_CHROMA_SPEC)
    if progressive:
        if restart_interval:
            raise NotImplementedError(
                "restart markers are not emitted in progressive mode"
            )
        out += _encode_progressive_scans(planes, samp, qy, qc, h, w)
        out += b"\xff\xd9"
        return bytes(out)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOS
    sos = bytes([ncomp])
    for ci in range(ncomp):
        tabs = 0x00 if ci == 0 else 0x11
        sos += bytes([ci + 1, tabs])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos

    dc_y = _build_huff_encoder(_DC_LUMA_SPEC)
    ac_y = _build_huff_encoder(_AC_LUMA_SPEC)
    dc_c = _build_huff_encoder(_DC_CHROMA_SPEC)
    ac_c = _build_huff_encoder(_AC_CHROMA_SPEC)

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    zz = []
    for ci, plane in enumerate(planes):
        hs, vs = samp[ci]
        # pad this component's plane so it holds mcuy*vs x mcux*hs blocks
        need_h, need_w = mcuy * vs * 8, mcux * hs * 8
        ph, pw = need_h - plane.shape[0], need_w - plane.shape[1]
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
        blocks, _, _ = _blocks_of(plane)
        zz.append(_encode_component_blocks(blocks, qy if ci == 0 else qc))

    writer = _BitWriter()
    preds = [0] * ncomp
    rst_n = 0
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count == restart_interval:
                out_bits = writer.flush()
                out += out_bits
                out += bytes([0xFF, 0xD0 + rst_n])
                rst_n = (rst_n + 1) & 7
                writer = _BitWriter()
                preds = [0] * ncomp
                mcu_count = 0
            for ci in range(ncomp):
                hs, vs = samp[ci]
                dc_tab, ac_tab = (dc_y, ac_y) if ci == 0 else (dc_c, ac_c)
                for bv in range(vs):
                    for bh in range(hs):
                        preds[ci] = _huff_encode_block(
                            writer,
                            zz[ci][my * vs + bv, mx * hs + bh],
                            preds[ci],
                            dc_tab,
                            ac_tab,
                        )
            mcu_count += 1
    out += writer.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

#: Huffman-coded SOF markers this decoder ACCEPTS (r9: SOF1 extended
#: sequential is syntactically identical to SOF0 at 8-bit precision —
#: only 12-bit input and the 4-table allowance differ, both checked
#: downstream — and SOF2 progressive is fully implemented via the
#: multi-scan accumulation path below).
_ACCEPTED_SOF = {0xC0, 0xC1, 0xC2}

_REFUSED_SOF = {
    0xC3: "lossless (SOF3)",
    0xC5: "differential sequential (SOF5)",
    0xC6: "differential progressive (SOF6)",
    0xC7: "differential lossless (SOF7)",
    0xC9: "arithmetic sequential (SOF9)",
    0xCA: "arithmetic progressive (SOF10)",
    0xCB: "arithmetic lossless (SOF11)",
    0xCD: "differential arithmetic sequential (SOF13)",
    0xCE: "differential arithmetic progressive (SOF14)",
    0xCF: "differential arithmetic lossless (SOF15)",
}


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    y = y.astype(np.float64)
    cb = cb.astype(np.float64) - 128.0
    cr = cr.astype(np.float64) - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    out = np.stack([r, g, b], axis=2)
    return np.clip(_round_half_up(out), 0, 255).astype(np.uint8)


def _seglen(data: bytes, pos: int) -> int:
    """Validated marker-segment length. Corrupt/truncated input must
    surface as the documented loud ValueError (ADVICE r8), never as a
    struct.error / IndexError from an unchecked slice."""
    if pos + 2 > len(data):
        raise ValueError("truncated JPEG: marker segment length missing")
    (seglen,) = struct.unpack(">H", data[pos : pos + 2])
    if seglen < 2 or pos + seglen > len(data):
        raise ValueError(
            f"truncated JPEG: segment length {seglen} at offset {pos} overruns data"
        )
    return seglen


def decode_jpeg(data: bytes) -> np.ndarray:
    """(h, w) uint8 for grayscale JPEGs, (h, w, 3) RGB for color.

    Handles baseline sequential (SOF0), 8-bit extended sequential (SOF1)
    and progressive (SOF2) frames; progressive scans — spectral selection
    + successive approximation, DC/AC first and refinement passes with
    EOB-run coding per T.81 Annex G — accumulate into per-component
    coefficient arrays that are dequantized and inverse-transformed once
    at EOI."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None
    restart_interval = 0
    coefs: dict[int, np.ndarray] = {}  # progressive: comp id -> (by,bx,64)
    progressive_scans = 0
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at offset {pos}")
        if pos + 2 > len(data):
            raise ValueError("truncated JPEG: dangling 0xFF at end of data")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue  # parameterless
        seglen = _seglen(data, pos)
        seg = data[pos + 2 : pos + seglen]
        if marker in _REFUSED_SOF:
            raise NotImplementedError(
                f"unsupported JPEG mode: {_REFUSED_SOF[marker]}; only "
                "Huffman sequential (SOF0/SOF1) and progressive (SOF2) "
                "are implemented"
            )
        if marker in _ACCEPTED_SOF:  # SOF0 / SOF1 / SOF2
            if len(seg) < 6:
                raise ValueError("truncated JPEG: short SOF segment")
            prec, h, w, ncomp = struct.unpack(">BHHB", seg[:6])
            if len(seg) < 6 + 3 * ncomp:
                raise ValueError("truncated JPEG: SOF component list short")
            if prec != 8:
                raise NotImplementedError(
                    f"{prec}-bit precision; only 8-bit is implemented"
                )
            if h * w > (1 << 27) or h < 1 or w < 1:
                # a crafted header must not become a multi-GB plane
                # allocation before any pixel data is validated
                raise ValueError(f"unreasonable JPEG dimensions {w}x{h}")
            comps = []
            for ci in range(ncomp):
                cid, hv, qid = seg[6 + 3 * ci : 9 + 3 * ci]
                hs, vs = hv >> 4, hv & 0xF
                if hs not in (1, 2) or vs not in (1, 2):
                    raise NotImplementedError(
                        f"sampling factor {hs}x{vs}; only 1-2 supported"
                    )
                comps.append({"id": cid, "h": hs, "v": vs, "q": qid})
            frame = {"h": h, "w": w, "comps": comps,
                     "progressive": marker == 0xC2}
        elif marker == 0xC4:  # DHT (possibly several tables)
            p = 0
            while p < len(seg):
                if p + 17 > len(seg):
                    raise ValueError("truncated JPEG: short DHT segment")
                tc_th = seg[p]
                bits = list(seg[p + 1 : p + 17])
                n = sum(bits)
                if p + 17 + n > len(seg):
                    raise ValueError("truncated JPEG: DHT value list short")
                vals = list(seg[p + 17 : p + 17 + n])
                huff[(tc_th >> 4, tc_th & 0xF)] = _build_huff_decoder(bits, vals)
                p += 17 + n
        elif marker == 0xDB:  # DQT (possibly several tables)
            p = 0
            while p < len(seg):
                if p + 65 > len(seg):
                    raise ValueError("truncated JPEG: short DQT segment")
                pq_tq = seg[p]
                if pq_tq >> 4:
                    raise NotImplementedError("16-bit quantization tables")
                tab = np.zeros(64, dtype=np.int64)
                tab[_ZIGZAG] = np.frombuffer(
                    seg[p + 1 : p + 65], dtype=np.uint8
                ).astype(np.int64)
                qtables[pq_tq & 0xF] = tab.reshape(8, 8)
                p += 65
        elif marker == 0xDD:  # DRI
            if len(seg) < 2:
                raise ValueError("truncated JPEG: short DRI segment")
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            if not seg or len(seg) < 4 + 2 * seg[0]:
                raise ValueError("truncated JPEG: short SOS segment")
            ns = seg[0]
            scan = []
            for si in range(ns):
                cid, tabs = seg[1 + 2 * si : 3 + 2 * si]
                comp = next(
                    (c for c in frame["comps"] if c["id"] == cid), None
                )
                if comp is None:
                    raise ValueError(
                        f"SOS references unknown component id {cid}"
                    )
                scan.append((comp, tabs >> 4, tabs & 0xF))
            if not frame["progressive"]:
                return _decode_scan(
                    data, pos + seglen, frame, scan, qtables, huff,
                    restart_interval,
                )
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ah_al = seg[3 + 2 * ns]
            if not coefs:
                for c in frame["comps"]:
                    nby, nbx = _comp_mcu_blocks(frame, c)
                    coefs[c["id"]] = np.zeros((nby, nbx, 64), dtype=np.int64)
            try:
                pos = _decode_progressive_scan(
                    data, pos + seglen, frame, scan, huff, restart_interval,
                    coefs, ss, se, ah_al >> 4, ah_al & 0xF,
                )
            except _RestartMarker as e:
                # same loud-ValueError contract as the baseline scan
                raise ValueError(
                    f"unexpected restart marker RST{e.marker & 7} in scan data"
                ) from None
            progressive_scans += 1
            continue
        elif marker == 0xDC:
            raise NotImplementedError("DNL (define number of lines)")
        # APPn / COM / others: skip
        pos += seglen
    if progressive_scans:
        return _reconstruct(frame, coefs, qtables)
    raise ValueError("no scan data found (missing SOS)")


def _decode_scan(data, pos, frame, scan, qtables, huff, restart_interval):
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = {}
    for comp, _, _ in scan:
        planes[comp["id"]] = np.zeros(
            (mcuy * comp["v"] * 8, mcux * comp["h"] * 8), dtype=np.float64
        )
    for comp, dc_id, ac_id in scan:
        for key, kind in (
            (comp["q"], "quantization"),
            ((0, dc_id), "DC Huffman"),
            ((1, ac_id), "AC Huffman"),
        ):
            table = qtables if kind == "quantization" else huff
            if key not in table:
                raise ValueError(f"scan references undefined {kind} table {key}")
    reader = _BitReader(data, pos)
    preds = {comp["id"]: 0 for comp, _, _ in scan}
    try:
        _decode_mcus(
            reader, frame, scan, qtables, huff, restart_interval, planes,
            preds, mcux, mcuy,
        )
    except _RestartMarker as e:
        # un-stuffed RSTn outside a restart boundary (corrupt stream or a
        # DRI/segment mismatch): keep the documented loud-ValueError
        # contract instead of leaking the internal control-flow class
        raise ValueError(
            f"unexpected restart marker RST{e.marker & 7} in scan data"
        ) from None
    # finalize: round, clip, upsample to full res, color-convert
    full = []
    for comp in (c for c, _, _ in scan):
        plane = np.clip(_round_half_up(planes[comp["id"]]), 0, 255)
        ry, rx = vmax // comp["v"], hmax // comp["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        full.append(plane[:h, :w].astype(np.uint8))
    if len(full) == 1:
        return full[0]
    if len(full) == 3:
        return _ycbcr_to_rgb(full[0], full[1], full[2])
    raise NotImplementedError(f"{len(full)}-component scan (CMYK?)")


def _decode_mcus(
    reader, frame, scan, qtables, huff, restart_interval, planes, preds,
    mcux, mcuy,
):
    rst_n = 0
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count == restart_interval:
                reader.align_and_expect_restart(rst_n)
                rst_n = (rst_n + 1) & 7
                preds.update({cid: 0 for cid in preds})
                mcu_count = 0
            for comp, dc_id, ac_id in scan:
                qtab = qtables[comp["q"]]
                dc_tab = huff[(0, dc_id)]
                ac_tab = huff[(1, ac_id)]
                for bv in range(comp["v"]):
                    for bh in range(comp["h"]):
                        zz = _decode_block(reader, dc_tab, ac_tab, preds, comp)
                        coef = (zz[_UNZIGZAG].reshape(8, 8) * qtab).astype(
                            np.float64
                        )
                        # DC handled exactly (dq/8, a power-of-two
                        # division) — the matrix product's ulp error
                        # flips the final half-up round on exact .5
                        # reconstructions; mirrors the encoder
                        dc_exact = coef[0, 0] / 8.0
                        coef[0, 0] = 0.0
                        pix = _C.T @ coef @ _C + dc_exact + 128.0
                        y0 = (my * comp["v"] + bv) * 8
                        x0 = (mx * comp["h"] + bh) * 8
                        planes[comp["id"]][y0 : y0 + 8, x0 : x0 + 8] = pix
            mcu_count += 1


def _decode_block(reader, dc_tab, ac_tab, preds, comp):
    zz = np.zeros(64, dtype=np.int64)
    size = reader.decode_symbol(dc_tab)
    if size > 15:
        # a corrupt DHT can map codes to arbitrary byte symbols; a DC
        # size past the spec's 0-11 range would read `size` raw bits and
        # overflow the int64 coefficient store (fuzz pin, r9)
        raise ValueError(f"corrupt JPEG: DC size category {size} out of range")
    diff = _extend(reader.read_bits(size), size) if size else 0
    preds[comp["id"]] += diff
    zz[0] = preds[comp["id"]]
    k = 1
    while k < 64:
        rs = reader.decode_symbol(ac_tab)
        run, size = rs >> 4, rs & 0xF
        if size == 0:
            if run == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += run
        if k > 63:
            raise ValueError("AC run past end of block")
        zz[k] = _extend(reader.read_bits(size), size)
        k += 1
    return zz


def _comp_mcu_blocks(frame, comp) -> tuple[int, int]:
    """Block-grid dims of a component's MCU-padded coefficient store
    (the grid interleaved scans cover)."""
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    mcux = -(-frame["w"] // (8 * hmax))
    mcuy = -(-frame["h"] // (8 * vmax))
    return mcuy * comp["v"], mcux * comp["h"]


def _comp_scan_blocks(frame, comp) -> tuple[int, int]:
    """Block-grid dims a NON-interleaved scan codes (T.81 A.2.2: the
    component's true sample dims rounded up to blocks — smaller than the
    MCU-padded store when sampling factors differ)."""
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    cw = -(-frame["w"] * comp["h"] // hmax)
    ch = -(-frame["h"] * comp["v"] // vmax)
    return -(-ch // 8), -(-cw // 8)


def _scan_skip_to_marker(data: bytes, pos: int) -> int:
    """Position of the next real marker after entropy-coded data
    (skipping stuffed 0xFF00 and any stray RSTn)."""
    while pos + 1 < len(data):
        if data[pos] == 0xFF and data[pos + 1] != 0x00 and not (
            0xD0 <= data[pos + 1] <= 0xD7
        ):
            return pos
        pos += 1
    raise ValueError("truncated JPEG: no marker after scan data")


def _decode_progressive_scan(
    data, pos, frame, scan, huff, restart_interval, coefs, ss, se, ah, al
):
    """One progressive SOS (T.81 Annex G.2): accumulate into ``coefs``
    (zigzag-indexed per-component arrays) and return the data position of
    the marker following the entropy segment.

    Four modes by (ss, ah): DC first (diff-coded, values << al), DC
    refinement (one raw bit sets bit al), AC first (baseline RLE over
    [ss, se] plus EOBn end-of-band runs), AC refinement (correction bits
    for already-nonzero coefficients interleaved with newly-significant
    +-1<<al insertions — the libjpeg-documented G.1.2.3 bit order).
    Restart markers reset DC predictors and the EOB run."""
    if ss == 0 and se != 0:
        raise ValueError("progressive scan mixes DC and AC (Ss=0, Se>0)")
    if ss > 0 and len(scan) != 1:
        raise ValueError("progressive AC scan must be non-interleaved")
    if se > 63 or ss > se:
        raise ValueError(f"bad spectral selection {ss}..{se}")
    reader = _BitReader(data, pos)
    p1 = 1 << al

    if ss == 0 and ah == 0:  # DC first
        for comp, dc_id, _ in scan:
            if (0, dc_id) not in huff:
                raise ValueError(f"scan references undefined DC table {dc_id}")
        preds = {c["id"]: 0 for c, _, _ in scan}

        def _dc_first(comp, dc_id, by, bx):
            size = reader.decode_symbol(huff[(0, dc_id)])
            if size > 15:
                raise ValueError(
                    f"corrupt JPEG: DC size category {size} out of range"
                )
            diff = _extend(reader.read_bits(size), size) if size else 0
            preds[comp["id"]] += diff
            coefs[comp["id"]][by, bx, 0] = preds[comp["id"]] << al

        def _reset():
            preds.update({k: 0 for k in preds})

        _walk_scan_blocks(frame, scan, reader, restart_interval, _dc_first, _reset)
    elif ss == 0:  # DC refinement: one raw bit per block

        def _dc_refine(comp, dc_id, by, bx):
            if reader.read_bit():
                coefs[comp["id"]][by, bx, 0] |= p1

        _walk_scan_blocks(
            frame, scan, reader, restart_interval, _dc_refine, lambda: None
        )
    else:  # AC scans (single component)
        comp, _, ac_id = scan[0]
        if (1, ac_id) not in huff:
            raise ValueError(f"scan references undefined AC table {ac_id}")
        ac_tab = huff[(1, ac_id)]
        block = coefs[comp["id"]]
        state = {"eobrun": 0}

        if ah == 0:  # AC first

            def _ac_block(by, bx):
                if state["eobrun"] > 0:
                    state["eobrun"] -= 1
                    return
                zz = block[by, bx]
                k = ss
                while k <= se:
                    rs = reader.decode_symbol(ac_tab)
                    r, size = rs >> 4, rs & 0xF
                    if size == 0:
                        if r == 15:
                            k += 16
                            continue
                        state["eobrun"] = (1 << r) - 1
                        if r:
                            state["eobrun"] += reader.read_bits(r)
                        break
                    k += r
                    if k > se:
                        raise ValueError("AC run past spectral band")
                    zz[k] = _extend(reader.read_bits(size), size) << al
                    k += 1
        else:  # AC refinement
            m1 = -p1

            def _correct(zz, k):
                if reader.read_bit() and not (int(zz[k]) & p1):
                    zz[k] += p1 if zz[k] >= 0 else m1

            def _ac_block(by, bx):
                zz = block[by, bx]
                k = ss
                if state["eobrun"] == 0:
                    while k <= se:
                        rs = reader.decode_symbol(ac_tab)
                        r, size = rs >> 4, rs & 0xF
                        val = 0
                        if size:
                            if size != 1:
                                raise ValueError(
                                    "AC refinement amplitude must be 1"
                                )
                            val = p1 if reader.read_bit() else m1
                        elif r != 15:
                            state["eobrun"] = (1 << r)
                            if r:
                                state["eobrun"] += reader.read_bits(r)
                            break
                        # advance over r zero-history positions, applying
                        # correction bits to nonzero ones along the way
                        while k <= se:
                            if zz[k] != 0:
                                _correct(zz, k)
                            else:
                                if r == 0:
                                    break
                                r -= 1
                            k += 1
                        if val:
                            if k > se:
                                raise ValueError("AC refinement run past band")
                            zz[k] = val
                        k += 1
                if state["eobrun"] > 0:
                    while k <= se:
                        if zz[k] != 0:
                            _correct(zz, k)
                        k += 1
                    state["eobrun"] -= 1

        def _reset_ac():
            state["eobrun"] = 0

        nbh, nbw = _comp_scan_blocks(frame, comp)
        n_since_rst, rst_n = 0, 0
        for by in range(nbh):
            for bx in range(nbw):
                if restart_interval and n_since_rst == restart_interval:
                    reader.align_and_expect_restart(rst_n)
                    rst_n = (rst_n + 1) & 7
                    _reset_ac()
                    n_since_rst = 0
                _ac_block(by, bx)
                n_since_rst += 1
    return _scan_skip_to_marker(data, reader.pos)


def _walk_scan_blocks(frame, scan, reader, restart_interval, visit, reset):
    """Drive a DC-scan block walk: MCU-interleaved when the scan has
    several components, the component's true block raster otherwise;
    restart markers handled at interval boundaries."""
    n_since_rst, rst_n = 0, 0
    if len(scan) > 1:
        hmax = max(c["h"] for c in frame["comps"])
        vmax = max(c["v"] for c in frame["comps"])
        mcux = -(-frame["w"] // (8 * hmax))
        mcuy = -(-frame["h"] // (8 * vmax))
        for my in range(mcuy):
            for mx in range(mcux):
                if restart_interval and n_since_rst == restart_interval:
                    reader.align_and_expect_restart(rst_n)
                    rst_n = (rst_n + 1) & 7
                    reset()
                    n_since_rst = 0
                for comp, dc_id, _ in scan:
                    for bv in range(comp["v"]):
                        for bh in range(comp["h"]):
                            visit(comp, dc_id, my * comp["v"] + bv,
                                  mx * comp["h"] + bh)
                n_since_rst += 1
    else:
        comp, dc_id, _ = scan[0]
        nbh, nbw = _comp_scan_blocks(frame, comp)
        for by in range(nbh):
            for bx in range(nbw):
                if restart_interval and n_since_rst == restart_interval:
                    reader.align_and_expect_restart(rst_n)
                    rst_n = (rst_n + 1) & 7
                    reset()
                    n_since_rst = 0
                visit(comp, dc_id, by, bx)
                n_since_rst += 1


def _reconstruct(frame, coefs, qtables) -> np.ndarray:
    """Dequantize + IDCT every component's accumulated coefficient array
    and finalize (round half-up, clip, upsample, crop, color-convert) —
    the progressive twin of _decode_scan's tail, vectorized over blocks.
    The DC term keeps the exact dq/8 handling (module docstring)."""
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    full = []
    for comp in frame["comps"]:
        if comp["q"] not in qtables:
            raise ValueError(f"undefined quantization table {comp['q']}")
        qtab = qtables[comp["q"]]
        zz = coefs[comp["id"]]
        nby, nbx = zz.shape[:2]
        c = (zz[:, :, _UNZIGZAG].reshape(nby, nbx, 8, 8) * qtab).astype(
            np.float64
        )
        dc_exact = c[:, :, 0, 0] / 8.0
        c[:, :, 0, 0] = 0.0
        pix = np.einsum("mk,ijmn,nl->ijkl", _C, c, _C)
        pix += dc_exact[:, :, None, None] + 128.0
        plane = pix.transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8)
        plane = np.clip(_round_half_up(plane), 0, 255)
        ry, rx = vmax // comp["v"], hmax // comp["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        full.append(plane[:h, :w].astype(np.uint8))
    if len(full) == 1:
        return full[0]
    if len(full) == 3:
        return _ycbcr_to_rgb(full[0], full[1], full[2])
    raise NotImplementedError(f"{len(full)}-component frame (CMYK?)")


def jpeg_header(data: bytes) -> tuple[int, int, int]:
    """(width, height, n_components) from the SOF0 header without a full
    decode; refuses non-baseline modes like decode_jpeg."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    while pos < len(data) - 1:
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at offset {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue
        seglen = _seglen(data, pos)
        if marker in _REFUSED_SOF:
            raise NotImplementedError(
                f"unsupported JPEG mode: {_REFUSED_SOF[marker]}"
            )
        if marker in _ACCEPTED_SOF:
            if seglen < 8:
                raise ValueError("truncated JPEG: short SOF segment")
            _, h, w, ncomp = struct.unpack(">BHHB", data[pos + 2 : pos + 8])
            return w, h, ncomp
        pos += seglen
    raise ValueError("missing SOF header")


# ---------------------------------------------------------------------------
# EXIF orientation (r10): the one ancillary field a crawl pipeline MUST
# honor — phone photos carry their rotation here, and a trainer that
# ignores it learns sideways images.
# ---------------------------------------------------------------------------

_EXIF_ORIENTATION_TAG = 274


def exif_orientation(data: bytes) -> int:
    """Orientation (1..8) from the APP1 EXIF segment; 1 (upright) when
    no EXIF / no orientation tag is present. The EXIF payload is a
    self-contained TIFF block, so the bounds-checked IFD walker from
    tiff_codec reads it — both byte orders. A malformed EXIF block
    degrades to 1 (ancillary data never fails a decode), but a
    non-JPEG input still fails loud."""
    from ecollector_spark.datapipe.tiff_codec import _read_ifd

    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            break
        marker = data[pos + 1]
        if marker == 0xDA or marker == 0xD9:  # SOS/EOI: no more APPn
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        (seglen,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        if marker == 0xE1 and data[pos + 4 : pos + 10] == b"Exif\x00\x00":
            block = data[pos + 10 : pos + 2 + seglen]
            try:
                bo = {"II": "<", "MM": ">"}[block[:2].decode("latin-1")]
                tags = _read_ifd(block, bo)
                o = int(tags[_EXIF_ORIENTATION_TAG][2][0])
                return o if 1 <= o <= 8 else 1
            except (KeyError, ValueError, struct.error, UnicodeDecodeError):
                return 1
        pos += 2 + seglen
    return 1


def add_exif_orientation(data: bytes, orientation: int) -> bytes:
    """Splice an APP1 EXIF segment carrying ``orientation`` (1..8) right
    after SOI — the test/builder twin of :func:`exif_orientation`
    (little-endian TIFF block, one SHORT tag)."""
    if not 1 <= int(orientation) <= 8:
        raise ValueError(f"orientation must be 1..8, got {orientation}")
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    tiff = (
        b"II" + struct.pack("<HI", 42, 8)  # byte order, magic, IFD @8
        + struct.pack("<H", 1)  # one entry
        + struct.pack("<HHIHH", _EXIF_ORIENTATION_TAG, 3, 1, int(orientation), 0)
        + struct.pack("<I", 0)  # next IFD
    )
    payload = b"Exif\x00\x00" + tiff
    app1 = b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload
    return data[:2] + app1 + data[2:]


def apply_orientation(img, orientation: int):
    """Undo an EXIF orientation on a decoded array (h, w[, c]) — the
    eight spec transforms, pure numpy index ops (no interpolation):
    1 upright, 2 mirror, 3 rotate 180, 4 vertical flip, 5 transpose,
    6 rotate 90 CW, 7 transverse, 8 rotate 90 CCW."""
    import numpy as np

    o = int(orientation)
    if o == 1:
        return img
    if o == 2:
        return img[:, ::-1]
    if o == 3:
        return img[::-1, ::-1]
    if o == 4:
        return img[::-1]
    if o == 5:
        return np.swapaxes(img, 0, 1)
    if o == 6:
        return np.swapaxes(img, 0, 1)[:, ::-1]
    if o == 7:
        return np.swapaxes(img, 0, 1)[::-1, ::-1]
    if o == 8:
        return np.swapaxes(img, 0, 1)[::-1]
    raise ValueError(f"orientation must be 1..8, got {orientation}")
