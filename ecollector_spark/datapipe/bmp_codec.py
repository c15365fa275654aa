"""Pure-Python BMP codec (stdlib + numpy) — the trivial-but-ubiquitous
uncompressed DIB container (same row layout the in-repo AVI codec's
frames use: bottom-up BGR rows, 4-byte padding).

- **encode**: (h, w, 3) RGB as 24-bit BI_RGB; (h, w) grayscale as 8-bit
  with a 256-gray palette.
- **decode**: BITMAPINFOHEADER (40+ byte headers), 24-bit BI_RGB and
  8-bit palette images, bottom-up and top-down (negative height) rows.
- **refused loudly**: RLE/bitfields compression, 1/4/16/32-bit depths.

Lossless, so decode(encode(img)) == img exactly.
"""

from __future__ import annotations

import struct

import numpy as np


def _row_stride(bits_per_px: int, w: int) -> int:
    return (w * bits_per_px + 31) // 32 * 4


def encode_bmp(img: np.ndarray) -> bytes:
    img = np.ascontiguousarray(np.asarray(img, dtype=np.uint8))
    if img.ndim == 2:
        h, w = img.shape
        bpp, n_pal = 8, 256
        palette = b"".join(bytes([v, v, v, 0]) for v in range(256))
        stride = _row_stride(8, w)
        rows = np.zeros((h, stride), dtype=np.uint8)
        rows[:, :w] = img[::-1]
        pixels = rows.tobytes()
    elif img.ndim == 3 and img.shape[2] == 3:
        h, w = img.shape[:2]
        bpp, n_pal, palette = 24, 0, b""
        stride = _row_stride(24, w)
        rows = np.zeros((h, stride), dtype=np.uint8)
        rows[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)
        pixels = rows.tobytes()
    else:
        raise ValueError(f"unsupported array shape {img.shape}")
    if h < 1 or w < 1:
        raise ValueError("empty image")
    off = 14 + 40 + len(palette)
    header = b"BM" + struct.pack("<IHHI", off + len(pixels), 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, bpp, 0, len(pixels),
                       2835, 2835, n_pal, 0)
    return header + info + palette + pixels


def bmp_header(data: bytes) -> tuple[int, int, int]:
    """(width, height, bits_per_pixel); refuses like decode_bmp."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP (missing BM signature)")
    if len(data) < 54:
        raise ValueError("truncated BMP: short header")
    size, w, h, _planes, bpp, comp = struct.unpack("<IiiHHI", data[14:34])
    if size < 40:
        raise NotImplementedError(f"BMP core-header size {size}; need BITMAPINFOHEADER")
    if comp != 0:
        raise NotImplementedError(f"compressed BMP (biCompression={comp})")
    if bpp not in (8, 24):
        raise NotImplementedError(f"{bpp}-bit BMP; 8-bit palette and 24-bit supported")
    return w, abs(h), bpp


def decode_bmp(data: bytes) -> np.ndarray:
    """(h, w) uint8 for gray-palette 8-bit, (h, w, 3) RGB for 24-bit
    (and non-gray 8-bit palettes)."""
    w, h, bpp = bmp_header(data)
    (off,) = struct.unpack("<I", data[10:14])
    (info_size,) = struct.unpack("<I", data[14:18])
    raw_h = struct.unpack("<i", data[22:26])[0]
    top_down = raw_h < 0
    stride = _row_stride(bpp, w)
    if off + stride * h > len(data):
        raise ValueError("truncated BMP: pixel data short")
    rows = np.frombuffer(data[off : off + stride * h], dtype=np.uint8).reshape(
        h, stride
    )
    if not top_down:
        rows = rows[::-1]
    if bpp == 24:
        return rows[:, : w * 3].reshape(h, w, 3)[:, :, ::-1].copy()
    (n_pal,) = struct.unpack("<I", data[46:50])
    n_pal = n_pal or 256
    pal_at = 14 + info_size
    if pal_at + 4 * n_pal > len(data):
        raise ValueError("truncated BMP: short palette")
    pal = np.frombuffer(data[pal_at : pal_at + 4 * n_pal], dtype=np.uint8).reshape(
        n_pal, 4
    )[:, :3][:, ::-1]  # BGRx -> RGB
    idx = rows[:, :w]
    if idx.max(initial=0) >= n_pal:
        raise ValueError("corrupt BMP: pixel index outside palette")
    rgb = pal[idx]
    if np.array_equal(rgb[:, :, 0], rgb[:, :, 1]) and np.array_equal(
        rgb[:, :, 1], rgb[:, :, 2]
    ):
        return rgb[:, :, 0].copy()
    return rgb
