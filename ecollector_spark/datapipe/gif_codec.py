"""Pure-Python GIF codec (stdlib + numpy) — the lossless web-image
format next after JPEG in a real crawl corpus.

Implements the public GIF87a/89a specification:

- **encode**: grayscale (256-gray global palette) or RGB quantized to
  the image's own distinct colors (<= 256, loud error above), real LZW
  with variable code width and dictionary reset at 4096, optional
  4-pass interlace, sub-block framing.
- **decode**: header + logical screen descriptor, global and local
  color tables, variable-width LSB-first LZW (clear/EOI codes,
  deferred-clear tolerant), interlaced and non-interlaced images,
  extension blocks skipped (0x21: graphic control / comment /
  application), first image frame returned (animation = first frame,
  stated, not guessed).
- **loud failures**: truncated streams, bad codes, missing trailer
  data, oversized palettes — always ValueError / NotImplementedError.

GIF is LOSSLESS for palettable content, so decode(encode(img)) == img
EXACTLY — the strongest possible round-trip pin, and the driver gate's
oracle can predict the decoded pixel of a flat image with no math at
all (lum_decoded = v).

Reference parity: the reference has no image path — this backs SURVEY
§"multimodal" like png_codec / jpeg_codec / wav_codec / avi_codec.
"""

from __future__ import annotations

import struct

import numpy as np

#: 4-pass interlace row schedule: (first row, step) per pass
_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _interlace_order(h: int) -> list[int]:
    out = []
    for first, step in _INTERLACE_PASSES:
        out.extend(range(first, h, step))
    return out


# ---------------------------------------------------------------------------
# LZW (variable width, LSB-first — the GIF flavor)
# ---------------------------------------------------------------------------


class _LzwWriter:
    def __init__(self, min_code_size: int):
        self.min = min_code_size
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, code: int, width: int) -> None:
        self._acc |= code << self._n
        self._n += width
        while self._n >= 8:
            self.out.append(self._acc & 0xFF)
            self._acc >>= 8
            self._n -= 8

    def flush(self) -> bytes:
        if self._n:
            self.out.append(self._acc & 0xFF)
            self._acc, self._n = 0, 0
        return bytes(self.out)


def lzw_encode(data: bytes, min_code_size: int) -> bytes:
    """GIF-flavor LZW: emits CLEAR first, resets the dictionary when it
    reaches 4096 entries, ends with EOI."""
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    w = _LzwWriter(min_code_size)

    def fresh():
        return {bytes([i]): i for i in range(1 << min_code_size)}

    table = fresh()
    next_code = eoi + 1
    width = min_code_size + 1
    w.write(clear, width)
    prefix = b""
    for b in data:
        cand = prefix + bytes([b])
        if cand in table:
            prefix = cand
            continue
        w.write(table[prefix], width)
        table[cand] = next_code
        next_code += 1
        if next_code > (1 << width) and width < 12:
            width += 1
        elif next_code >= 4096:
            w.write(clear, width)
            table = fresh()
            next_code = eoi + 1
            width = min_code_size + 1
        prefix = bytes([b])
    if prefix:
        w.write(table[prefix], width)
    w.write(eoi, width)
    return w.flush()


def lzw_decode(data: bytes, min_code_size: int, expected: int) -> bytes:
    """Decode ``expected`` pixels; tolerant of missing EOI (some
    encoders rely on the image size), loud on bad codes/truncation."""
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    out = bytearray()
    pos_bits = 0
    total_bits = 8 * len(data)

    def read(width: int) -> int:
        nonlocal pos_bits
        if pos_bits + width > total_bits:
            raise ValueError("truncated GIF: LZW stream exhausted")
        byte0 = pos_bits >> 3
        chunk = int.from_bytes(data[byte0 : byte0 + 3], "little")
        v = (chunk >> (pos_bits & 7)) & ((1 << width) - 1)
        pos_bits += width
        return v

    table: list[bytes] = []

    def reset():
        nonlocal table, width, prev
        table = [bytes([i]) for i in range(1 << min_code_size)]
        table += [b"", b""]  # clear, eoi placeholders
        width = min_code_size + 1
        prev = None

    width = min_code_size + 1
    prev: bytes | None = None
    reset()
    while len(out) < expected:
        code = read(width)
        if code == clear:
            reset()
            continue
        if code == eoi:
            break
        if code < len(table) and code not in (clear, eoi):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError(f"corrupt GIF: LZW code {code} out of range")
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    if len(out) < expected:
        raise ValueError(
            f"truncated GIF: {len(out)} of {expected} pixels decoded"
        )
    return bytes(out[:expected])


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------


def encode_gif(img: np.ndarray, interlace: bool = False) -> bytes:
    """GIF89a bytes from (h, w) grayscale uint8 (256-gray palette) or
    (h, w, 3) RGB uint8 with at most 256 distinct colors (GIF is
    palette-indexed; a richer image needs quantization the caller owns —
    loud ValueError, never a silent recolor)."""
    img = np.ascontiguousarray(np.asarray(img, dtype=np.uint8))
    if img.ndim == 2:
        h, w = img.shape
        palette = np.stack([np.arange(256)] * 3, axis=1).astype(np.uint8)
        idx = img
        pal_bits = 8
    elif img.ndim == 3 and img.shape[2] == 3:
        h, w = img.shape[:2]
        flat = img.reshape(-1, 3)
        colors, inverse = np.unique(flat, axis=0, return_inverse=True)
        if len(colors) > 256:
            raise ValueError(
                f"GIF needs a <=256-color palette; image has {len(colors)} "
                "distinct colors (quantize first)"
            )
        pal_bits = max(1, int(len(colors) - 1).bit_length())
        palette = np.zeros((1 << pal_bits, 3), dtype=np.uint8)
        palette[: len(colors)] = colors
        idx = inverse.reshape(h, w).astype(np.uint8)
    else:
        raise ValueError(f"unsupported array shape {img.shape}")
    if h < 1 or w < 1:
        raise ValueError("empty image")

    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | ((pal_bits - 1) << 4) | (pal_bits - 1), 0, 0])
    out += palette.tobytes()
    # image descriptor
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h)
    out += bytes([0x40 if interlace else 0x00])
    rows = idx[_interlace_order(h)] if interlace else idx
    min_code = max(2, pal_bits)
    out += bytes([min_code])
    compressed = lzw_encode(rows.tobytes(), min_code)
    for i in range(0, len(compressed), 255):
        chunk = compressed[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00"  # block terminator
    out += b"\x3b"  # trailer
    return bytes(out)


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------


def gif_header(data: bytes) -> tuple[int, int]:
    """(width, height) from the logical screen descriptor."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF (missing GIF87a/GIF89a signature)")
    if len(data) < 13:
        raise ValueError("truncated GIF: short logical screen descriptor")
    w, h = struct.unpack("<HH", data[6:10])
    return w, h


def decode_gif(data: bytes) -> np.ndarray:
    """(h, w) uint8 when the palette is pure gray, else (h, w, 3) RGB.
    Animations decode to their FIRST image frame (stated contract)."""
    sw, sh = gif_header(data)
    packed = data[10]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        if pos + 3 * n > len(data):
            raise ValueError("truncated GIF: short global color table")
        gct = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
        pos += 3 * n
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks, skip
            if pos >= len(data):
                raise ValueError("truncated GIF: dangling extension introducer")
            pos += 1
            while True:
                if pos >= len(data):
                    raise ValueError("truncated GIF: unterminated extension")
                ln = data[pos]
                pos += 1
                if ln == 0:
                    break
                pos += ln
            continue
        if block != 0x2C:
            raise ValueError(f"corrupt GIF: unknown block 0x{block:02X}")
        if pos + 9 > len(data):
            raise ValueError("truncated GIF: short image descriptor")
        left, top, w, h = struct.unpack("<HHHH", data[pos : pos + 8])
        if w * h > (1 << 27) or w < 1 or h < 1:
            # LZW legitimately expands far beyond its input — a crafted
            # descriptor must not become a multi-GB decode target
            raise ValueError(f"unreasonable GIF dimensions {w}x{h}")
        ipacked = data[pos + 8]
        pos += 9
        table = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            if pos + 3 * n > len(data):
                raise ValueError("truncated GIF: short local color table")
            table = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
            pos += 3 * n
        if table is None:
            raise ValueError("corrupt GIF: image has no color table")
        if pos >= len(data):
            raise ValueError("truncated GIF: missing LZW minimum code size")
        min_code = data[pos]
        pos += 1
        if not (2 <= min_code <= 11):
            raise ValueError(f"corrupt GIF: bad LZW minimum code size {min_code}")
        chunks = bytearray()
        while True:
            if pos >= len(data):
                raise ValueError("truncated GIF: unterminated image data")
            ln = data[pos]
            pos += 1
            if ln == 0:
                break
            if pos + ln > len(data):
                raise ValueError("truncated GIF: short data sub-block")
            chunks += data[pos : pos + ln]
            pos += ln
        idx = np.frombuffer(
            lzw_decode(bytes(chunks), min_code, w * h), dtype=np.uint8
        ).reshape(h, w)
        if idx.max(initial=0) >= len(table):
            raise ValueError("corrupt GIF: pixel index outside color table")
        if ipacked & 0x40:  # interlaced: invert the 4-pass row order
            order = _interlace_order(h)
            de = np.empty_like(idx)
            de[order] = idx
            idx = de
        rgb = table[idx]
        if np.array_equal(rgb[:, :, 0], rgb[:, :, 1]) and np.array_equal(
            rgb[:, :, 1], rgb[:, :, 2]
        ):
            return rgb[:, :, 0].copy()
        return rgb
    raise ValueError("no image data found in GIF")
