"""Pure-Python PNG codec (stdlib zlib + numpy) — the real decode kernel
behind the multimodal operators.

The sandbox has no Pillow/ffmpeg, but PNG itself needs neither: the
format is zlib-compressed filtered scanlines (RFC 2083). This module
implements the 8-bit non-interlaced subset — grayscale / RGB / RGBA,
all five scanline filters on decode — which is enough to run REAL
image decode, resize and feature extraction through the mapInPandas
stages instead of a stub. Audio/video stay honestly stubbed (their
codecs genuinely need external libraries).

Everything is deterministic integer math (the PNG spec's own mod-256
arithmetic; nearest-neighbor resampling), so decode outputs are
bit-identical across engines and a DuckDB oracle can predict them
analytically for synthetic images — the property the driver's value
gate (``mm_real_decode``) relies on.

Not a Pillow replacement: no interlacing, no 16-bit, no palette, no
ancillary-chunk interpretation. Reference parity: the reference has no
image path at all — this backs SURVEY §"multimodal" (a training-data
pipeline requirement, not an ecollector feature).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
#: color type -> channel count (8-bit only)
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray) -> bytes:
    """8-bit PNG bytes from (h, w) grayscale or (h, w, 3|4) RGB(A)
    arrays. Filter type 0 on every scanline (encode simplicity; decode
    handles all five)."""
    arr = np.ascontiguousarray(np.asarray(arr, dtype=np.uint8))
    if arr.ndim == 2:
        color_type = 0
    elif arr.ndim == 3 and arr.shape[2] == 3:
        color_type = 2
    elif arr.ndim == 3 and arr.shape[2] == 4:
        color_type = 6
    else:
        raise ValueError(f"unsupported array shape {arr.shape}")
    h, w = arr.shape[:2]
    if h < 1 or w < 1:
        raise ValueError("empty image")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


def png_header(data: bytes) -> tuple[int, int, int]:
    """(width, height, channels) from the IHDR without inflating pixel
    data — the cheap metadata probe."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    if data[12:16] != b"IHDR":
        raise ValueError("IHDR is not the first chunk")
    if len(data) < 29:
        raise ValueError("truncated PNG: short IHDR")
    w, h, depth, ctype, _comp, _filt, inter = struct.unpack(">IIBBBBB", data[16:29])
    if depth != 8 or inter != 0 or ctype not in _CHANNELS:
        raise NotImplementedError(
            f"unsupported PNG variant (depth={depth}, color={ctype}, interlace={inter})"
        )
    return w, h, _CHANNELS[ctype]


def decode_png(data: bytes) -> np.ndarray:
    """Decode to a uint8 array — (h, w) for grayscale, (h, w, c)
    otherwise. Validates chunk CRCs; implements all five scanline
    filters (None/Sub/Up/Average/Paeth) with the spec's exact integer
    arithmetic."""
    w, h, channels = png_header(data)
    pos, idat = 8, bytearray()
    while pos + 12 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        if pos + 12 + length > len(data):
            # corrupt/truncated chunk length must fail loud, not as a
            # struct.error from the short CRC slice (fuzz pin, r9)
            raise ValueError(
                f"truncated PNG: chunk length {length} at offset {pos} overruns data"
            )
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(tag + payload) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {tag!r} chunk")
        if tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        pos += 12 + length
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise ValueError(f"corrupt PNG: zlib inflate failed ({e})") from None
    stride = w * channels
    if len(raw) != h * (stride + 1):
        raise ValueError("pixel data length mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    bpp = channels  # bytes per pixel at 8-bit depth
    p = 0
    for y in range(h):
        ft = raw[p]
        row = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=p + 1).astype(
            np.int32
        )
        p += 1 + stride
        prev = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        if ft == 0:  # None
            cur = row
        elif ft == 2:  # Up — vectorized (no intra-row dependency)
            cur = (row + prev) & 0xFF
        elif ft in (1, 3, 4):  # Sub/Average/Paeth — sequential along x
            cur = np.empty(stride, np.int32)
            for x in range(stride):
                a = int(cur[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                if ft == 1:
                    v = row[x] + a
                elif ft == 3:
                    v = row[x] + ((a + b) >> 1)
                else:
                    c = int(prev[x - bpp]) if x >= bpp else 0
                    pd = a + b - c
                    pa, pb, pc = abs(pd - a), abs(pd - b), abs(pd - c)
                    pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    v = row[x] + pr
                cur[x] = v & 0xFF
        else:
            raise ValueError(f"bad scanline filter {ft}")
        out[y] = cur.astype(np.uint8)
    img = out.reshape(h, w, channels)
    return img[:, :, 0] if channels == 1 else img


def resize_nearest(img: np.ndarray, new_w: int, new_h: int) -> np.ndarray:
    """Nearest-neighbor resample — pure integer index math
    (``src = dst * old // new``), deterministic everywhere, no
    interpolation kernel to disagree about."""
    h, w = img.shape[:2]
    ys = (np.arange(int(new_h)) * h) // int(new_h)
    xs = (np.arange(int(new_w)) * w) // int(new_w)
    return img[ys][:, xs]
