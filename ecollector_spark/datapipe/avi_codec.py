"""Pure-Python AVI (RIFF, uncompressed DIB frames) codec — the real
video-decode kernel behind the multimodal operators.

The sandbox has no ffmpeg, but an uncompressed AVI needs none: the
container is a RIFF chunk tree (``hdrl`` with the main/stream headers,
``movi`` holding one ``00db`` chunk per frame, an optional ``idx1``
index), and a BI_RGB DIB frame is just raw 24-bit BGR rows stored
bottom-up with 4-byte row padding. This module implements that subset
— enough to run REAL video decode and frame sampling through the
mapInPandas stages instead of a stub. Compressed codecs (h264/mp4/vp9,
MJPEG) stay honestly unimplemented: those genuinely need external
libraries, and ``decode_avi`` refuses them by fourCC/biCompression
instead of guessing.

Everything is exact integer math (row un-padding, bottom-up flip,
BGR byte order), so decode outputs are bit-identical across engines
and a DuckDB oracle can predict per-frame statistics analytically for
synthetic gradient frames — the property the driver's value gate
(``mm_video_frames``) relies on. The gradient matters: a constant
frame cannot distinguish a correct decoder from one that forgets the
bottom-up flip or mis-strides the row padding, while a row gradient
makes both bugs shift the sampled top-row value.

Reference parity: the reference has no video path at all — this backs
SURVEY §"multimodal" (a training-data pipeline requirement, not an
ecollector feature).
"""

from __future__ import annotations

import struct

import numpy as np


def _chunk(tag: bytes, payload: bytes) -> bytes:
    # RIFF chunks are word-aligned: odd payloads carry a pad byte that
    # is NOT counted in the chunk length
    return tag + struct.pack("<I", len(payload)) + payload + (b"\x00" * (len(payload) & 1))


def _list(tag: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", tag + payload)


def _row_stride(width: int) -> int:
    return (width * 3 + 3) & ~3


def encode_avi(frames: np.ndarray, fps: int = 10, grayscale: bool | None = None) -> bytes:
    """Uncompressed AVI bytes from (n, h, w) grayscale or (n, h, w, 3)
    RGB uint8 frames: BI_RGB 24-bit DIB payloads (bottom-up BGR rows,
    4-byte row padding) in ``00db`` chunks, plus the ``idx1`` index
    real players expect.

    ``grayscale`` disambiguates 3-D input whose last dim is 3, which is
    otherwise rejected (ADVICE r8: the bare guard also lost legitimate
    n-frame stacks of width-3 grayscale): True reads (n, h, 3) as n
    grayscale frames of width 3; False reads (h, w, 3) as ONE RGB frame."""
    arr = np.ascontiguousarray(np.asarray(frames, dtype=np.uint8))
    if arr.ndim == 3 and arr.shape[2] == 3 and grayscale is not None:
        arr = np.repeat(arr[:, :, :, None], 3, axis=3) if grayscale else arr[None]
    elif arr.ndim == 3:
        # a single RGB frame passed as (h, w, 3) would be silently
        # misread as h grayscale 3-pixel-wide frames — reject it
        if arr.shape[2] == 3:
            raise ValueError(
                "ambiguous (h, w, 3) input: a single RGB frame needs a "
                "leading frame axis — pass frames[None] for (1, h, w, 3), "
                "or pass grayscale=True for n grayscale frames of width 3"
            )
        arr = np.repeat(arr[:, :, :, None], 3, axis=3)
    if arr.ndim != 4 or arr.shape[3] != 3 or min(arr.shape[:3]) < 1:
        raise ValueError(f"unsupported frame shape {np.asarray(frames).shape}")
    n, h, w, _ = arr.shape
    stride = _row_stride(w)
    frame_bytes = stride * h
    # DIB rows: bottom-up, BGR, padded to the 4-byte stride
    padded = np.zeros((n, h, stride), dtype=np.uint8)
    padded[:, :, : w * 3] = arr[:, ::-1, :, ::-1].reshape(n, h, w * 3)

    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps,  # dwMicroSecPerFrame
        frame_bytes * fps,  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        0x10,  # dwFlags: AVIF_HASINDEX
        n,  # dwTotalFrames
        0,  # dwInitialFrames
        1,  # dwStreams
        frame_bytes,  # dwSuggestedBufferSize
        w,
        h,
        0, 0, 0, 0,  # dwReserved
    )
    strh = (
        b"vids"
        + b"DIB "
        + struct.pack(
            "<IHHIIIIIIIi",
            0,  # dwFlags
            0, 0,  # wPriority, wLanguage
            0,  # dwInitialFrames
            1,  # dwScale
            fps,  # dwRate (fps = rate/scale)
            0,  # dwStart
            n,  # dwLength (frames)
            frame_bytes,  # dwSuggestedBufferSize
            0,  # dwQuality
            0,  # dwSampleSize (0: one sample per chunk)
        )
        + struct.pack("<hhhh", 0, 0, w, h)  # rcFrame
    )
    strf = struct.pack(
        "<IiiHHIIiiII",
        40,  # biSize
        w,
        h,  # positive: bottom-up DIB
        1,  # biPlanes
        24,  # biBitCount
        0,  # biCompression = BI_RGB
        frame_bytes,  # biSizeImage
        0, 0, 0, 0,  # biXPels, biYPels, biClrUsed, biClrImportant
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih) + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_frames = b"".join(_chunk(b"00db", padded[i].tobytes()) for i in range(n))
    movi = _list(b"movi", movi_frames)
    # idx1: one entry per frame — offset counts from the start of the
    # 'movi' fourCC (the common convention), flags 0x10 = AVIIF_KEYFRAME
    idx_entries, off = [], 4
    for _ in range(n):
        idx_entries.append(struct.pack("<4sIII", b"00db", 0x10, off, frame_bytes))
        off += 8 + frame_bytes + (frame_bytes & 1)
    idx1 = _chunk(b"idx1", b"".join(idx_entries))
    return _chunk(b"RIFF", b"AVI " + hdrl + movi + idx1)


def _walk(data: bytes, pos: int, end: int):
    """Yield (tag, payload_start, payload_len) for each chunk in
    data[pos:end]; LIST chunks yield their list-type as tag with the
    inner body (so callers recurse by tag)."""
    while pos + 8 <= end:
        tag = data[pos : pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        if pos + 8 + length > end:
            raise ValueError("truncated chunk")
        yield tag, pos + 8, length
        pos += 8 + length + (length & 1)


def avi_header(data: bytes) -> tuple[int, int, int, int]:
    """(width, height, n_frames, fps) from the chunk headers without
    touching frame bytes — the cheap metadata probe. Refuses compressed
    streams honestly (NotImplementedError) rather than misreading."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI (bad RIFF/AVI header)")
    avih = strh = strf = None
    for tag, start, length in _walk(data, 12, len(data)):
        if tag == b"LIST" and data[start : start + 4] == b"hdrl":
            for t2, s2, l2 in _walk(data, start + 4, start + length):
                if t2 == b"avih":
                    avih = struct.unpack("<IIIIIIIIII", data[s2 : s2 + 40])
                elif t2 == b"LIST" and data[s2 : s2 + 4] == b"strl":
                    for t3, s3, l3 in _walk(data, s2 + 4, s2 + l2):
                        if t3 == b"strh":
                            strh = data[s3 : s3 + l3]
                        elif t3 == b"strf":
                            strf = data[s3 : s3 + l3]
    if avih is None or strh is None or strf is None:
        raise ValueError("missing avih/strh/strf header")
    if strh[:4] != b"vids":
        raise NotImplementedError(
            f"unsupported stream type {strh[:4]!r}; only 'vids' is implemented"
        )
    handler = strh[4:8]
    if len(strh) < 28 or len(strf) < 40:
        raise ValueError(
            f"truncated strh/strf header (strh={len(strh)}B, strf={len(strf)}B)"
        )
    _, _, _, _, scale, rate = struct.unpack("<IHHIII", strh[8:28])
    # BITMAPINFOHEADER: biWidth/biHeight at 4/8 (signed), biBitCount at
    # 14, biCompression at 16
    bm_w, bm_h = struct.unpack("<ii", strf[4:12])
    bits, compression = struct.unpack("<HI", strf[14:20])
    if handler not in (b"DIB ", b"\x00\x00\x00\x00") or compression != 0 or bits != 24:
        raise NotImplementedError(
            f"unsupported AVI codec (handler={handler!r}, biCompression="
            f"{compression}, bits={bits}); only uncompressed 24-bit BI_RGB "
            "is implemented — compressed video genuinely needs ffmpeg"
        )
    if bm_h < 0:
        # a negative biHeight is a top-down DIB; decoding it with the
        # bottom-up row flip would silently invert every frame
        raise NotImplementedError(
            "top-down DIB (negative biHeight) is not implemented; only "
            "bottom-up uncompressed frames decode"
        )
    w, h, n = avih[8], avih[9], avih[4]
    if (bm_w, bm_h) != (w, h):
        raise ValueError(
            f"strf geometry {bm_w}x{bm_h} disagrees with avih {w}x{h}"
        )
    fps = rate // scale if scale else 0
    return w, h, n, fps


def decode_avi(data: bytes) -> tuple[np.ndarray, int]:
    """Decode to ((n, h, w, 3) uint8 RGB frames, fps): walk the movi
    list, un-pad each DIB row, flip bottom-up to top-down, swap BGR to
    RGB. Validates chunk sizes against the header geometry."""
    w, h, n, fps = avi_header(data)
    stride = _row_stride(w)
    frames = []
    for tag, start, length in _walk(data, 12, len(data)):
        if tag == b"LIST" and data[start : start + 4] == b"movi":
            for t2, s2, l2 in _walk(data, start + 4, start + length):
                if t2 in (b"00db", b"00dc"):
                    if l2 != stride * h:
                        raise ValueError(
                            f"frame chunk size {l2} != expected {stride * h}"
                        )
                    rows = np.frombuffer(data[s2 : s2 + l2], dtype=np.uint8)
                    img = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
                    frames.append(img[::-1, :, ::-1])
    if len(frames) != n:
        raise ValueError(f"found {len(frames)} frames, header promises {n}")
    return np.stack(frames), fps
