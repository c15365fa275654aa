"""Pure-Python WAV (RIFF) codec — the real audio-decode kernel behind
the multimodal operators.

The sandbox has no ffmpeg, but the common WAV variants need none: the
container is a RIFF chunk list (RIFF/WAVE, `fmt ` describing the
layout, `data` holding the samples). Implemented sample formats:

- integer PCM (format 1): 8-bit unsigned, 16/24/32-bit signed LE —
  decoded to a canonical signed dtype (8-bit recentered ``(x-128)<<8``
  to int16, the usual widening convention)
- IEEE float PCM (format 3): 32-bit, returned as float32
- G.711 companded telephony audio (formats 6/7): A-law and mu-law,
  from the published companding formulas (segment/mantissa fields;
  the classic anchors hold exactly — mu-law max 32124 with a true
  zero at byte 0xFF, A-law max 32256 / min magnitude 8)

FLAC has its own from-scratch codec (``flac_codec``, r9); lossy
codecs (mp3/aac) stay honestly unimplemented: their conformance
tables cannot be reproduced verifiably here.

Everything is exact integer/IEEE math, so decode outputs are
bit-identical across engines and a DuckDB oracle can predict features
analytically for synthetic waveforms — the property the driver's value
gates (``mm_audio_features``, ``mm_g711_decode``) rely on: the
companding chain is plain shift/mask arithmetic a SQL CASE can mirror.

Reference parity: the reference has no audio path at all — this backs
SURVEY §"multimodal" (a training-data pipeline requirement, not an
ecollector feature).
"""

from __future__ import annotations

import struct

import numpy as np

#: G.711 segment lower bounds (both laws): exponent/segment = number of
#: bounds <= magnitude — exact integer logic, no float log2
_G711_BOUNDS = np.array([256, 512, 1024, 2048, 4096, 8192, 16384], dtype=np.int64)


def ulaw_encode(x: np.ndarray) -> np.ndarray:
    """int16 -> mu-law bytes (G.711): bias 132, clip 32635, byte is the
    ones-complement of sign|exponent|mantissa."""
    x = np.asarray(x, dtype=np.int64)
    sign = (x < 0).astype(np.int64)
    mag = np.minimum(np.abs(x), 32635) + 132
    e = np.searchsorted(_G711_BOUNDS, mag, side="right")
    q = (mag >> (e + 3)) & 0xF
    return (~((sign << 7) | (e << 4) | q) & 0xFF).astype(np.uint8)


def ulaw_decode(b: np.ndarray) -> np.ndarray:
    """mu-law bytes -> int16 (exact G.711 expansion)."""
    u = ~np.asarray(b, dtype=np.int64) & 0xFF
    sign, e, q = u >> 7, (u >> 4) & 7, u & 0xF
    mag = (((q << 3) + 132) << e) - 132
    return np.where(sign == 1, -mag, mag).astype(np.int16)


def alaw_encode(x: np.ndarray) -> np.ndarray:
    """int16 -> A-law bytes (G.711): sign bit means POSITIVE, byte is
    XOR 0x55 of sign|segment|mantissa."""
    x = np.asarray(x, dtype=np.int64)
    sign = (x >= 0).astype(np.int64)
    mag = np.minimum(np.abs(x), 32767)
    s = np.searchsorted(_G711_BOUNDS, mag, side="right")
    q = np.where(s == 0, mag >> 4, (mag >> (s + 3)) & 0xF)
    return ((((sign << 7) | (s << 4) | q) ^ 0x55) & 0xFF).astype(np.uint8)


def alaw_decode(b: np.ndarray) -> np.ndarray:
    """A-law bytes -> int16 (exact G.711 expansion; never yields 0 —
    the smallest magnitude is 8)."""
    a = (np.asarray(b, dtype=np.int64) ^ 0x55) & 0xFF
    sign, s, q = a >> 7, (a >> 4) & 7, a & 0xF
    mag = np.where(s == 0, (q << 4) + 8, ((q + 16) << (s + 3)) + (1 << (s + 2)))
    return np.where(sign == 1, mag, -mag).astype(np.int16)


def encode_wav(
    samples: np.ndarray, rate: int = 8000, fmt: str = "pcm16"
) -> bytes:
    """WAV bytes from a sample array — (n,) mono or (n, channels)
    interleaved. ``fmt``: pcm8 (int16 in, truncated to the unsigned
    8-bit grid), pcm16 (default), pcm24, pcm32 (int32 in), float32,
    ulaw, alaw (int16 in, G.711-companded)."""
    arr = np.asarray(samples)
    if arr.ndim == 1:
        arr = arr[:, None]
    if arr.ndim != 2 or arr.shape[0] < 1 or arr.shape[1] < 1:
        raise ValueError(f"unsupported sample shape {np.asarray(samples).shape}")
    n, ch = arr.shape
    if fmt == "pcm16":
        code, bits, data = 1, 16, np.ascontiguousarray(arr.astype("<i2")).tobytes()
    elif fmt == "pcm8":
        code, bits = 1, 8
        data = ((arr.astype(np.int64) >> 8) + 128).astype(np.uint8).tobytes()
    elif fmt == "pcm24":
        code, bits = 1, 24
        le32 = np.ascontiguousarray(arr.astype("<i4")).view(np.uint8).reshape(-1, 4)
        data = np.ascontiguousarray(le32[:, :3]).tobytes()  # low 3 LE bytes
    elif fmt == "pcm32":
        code, bits, data = 1, 32, np.ascontiguousarray(arr.astype("<i4")).tobytes()
    elif fmt == "float32":
        code, bits, data = 3, 32, np.ascontiguousarray(arr.astype("<f4")).tobytes()
    elif fmt == "ulaw":
        code, bits, data = 7, 8, ulaw_encode(arr).tobytes()
    elif fmt == "alaw":
        code, bits, data = 6, 8, alaw_encode(arr).tobytes()
    else:
        raise ValueError(f"unknown WAV sample format {fmt!r}")
    block_align = ch * (bits // 8)
    fmt_chunk = struct.pack(
        "<HHIIHH", code, ch, int(rate), int(rate) * block_align, block_align, bits
    )
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt_chunk))
        + fmt_chunk
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_header(data: bytes) -> tuple[int, int, int, int]:
    """(channels, sample_rate, bits_per_sample, n_samples) from the
    chunk headers without touching sample bytes — the cheap metadata
    probe."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV (bad RIFF/WAVE header)")
    pos, fmt, data_len = 12, None, None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        if tag == b"fmt ":
            fmt = struct.unpack("<HHIIHH", data[pos + 8 : pos + 24])
        elif tag == b"data":
            data_len = length
        # chunks are word-aligned: odd sizes carry a pad byte
        pos += 8 + length + (length & 1)
    if fmt is None or data_len is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, ch, rate, _brate, _balign, bits = fmt
    supported = {(1, 8), (1, 16), (1, 24), (1, 32), (3, 32), (6, 8), (7, 8)}
    if (audio_format, bits) not in supported:
        raise NotImplementedError(
            f"unsupported WAV variant (format={audio_format}, bits={bits}); "
            "implemented: 8/16/24/32-bit integer PCM, 32-bit float PCM, "
            "G.711 A-law/mu-law"
        )
    if ch < 1:
        raise ValueError("zero channels")
    return ch, rate, bits, data_len // (ch * (bits // 8))


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Decode to (samples, sample_rate) — (n,) for mono, (n, channels)
    otherwise. Dtype by source format: int16 for 8/16-bit PCM (8-bit
    recentered ``(x-128)<<8``) and G.711, int32 for 24/32-bit PCM
    (24-bit sign-extended, NOT shifted), float32 for float PCM.
    Validates chunk sizes and layout."""
    ch, rate, bits, n = wav_header(data)
    pos, fmt_code = 12, None
    raw = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        if tag == b"fmt ":
            fmt_code = struct.unpack("<H", data[pos + 8 : pos + 10])[0]
        elif tag == b"data":
            raw = data[pos + 8 : pos + 8 + length]
            if len(raw) != length:
                raise ValueError("truncated data chunk")
        pos += 8 + length + (length & 1)
    if raw is None:
        raise ValueError("missing data chunk")
    if fmt_code == 1 and bits == 16:
        arr = np.frombuffer(raw, dtype="<i2")
    elif fmt_code == 1 and bits == 8:
        arr = ((np.frombuffer(raw, dtype=np.uint8).astype(np.int16) - 128) << 8)
    elif fmt_code == 1 and bits == 24:
        b3 = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3).astype(np.int32)
        arr = b3[:, 0] | (b3[:, 1] << 8) | (b3[:, 2] << 16)
        arr = np.where(arr >= 1 << 23, arr - (1 << 24), arr).astype(np.int32)
    elif fmt_code == 1 and bits == 32:
        arr = np.frombuffer(raw, dtype="<i4")
    elif fmt_code == 3:
        arr = np.frombuffer(raw, dtype="<f4")
    elif fmt_code == 7:
        arr = ulaw_decode(np.frombuffer(raw, dtype=np.uint8))
    elif fmt_code == 6:
        arr = alaw_decode(np.frombuffer(raw, dtype=np.uint8))
    else:  # unreachable: wav_header already refused
        raise NotImplementedError(f"unsupported WAV format {fmt_code}")
    arr = arr.reshape(n, ch)
    return (arr[:, 0] if ch == 1 else arr), rate
