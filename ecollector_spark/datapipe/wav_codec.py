"""Pure-Python WAV (RIFF PCM) codec — the real audio-decode kernel
behind the multimodal operators.

The sandbox has no ffmpeg, but uncompressed PCM WAV needs none: the
container is a RIFF chunk list (RIFF/WAVE, `fmt ` describing the PCM
layout, `data` holding little-endian samples). This module implements
the 16-bit integer-PCM subset — mono or interleaved multi-channel —
which is enough to run REAL audio decode and feature extraction
through the mapInPandas stages instead of a stub. FLAC has its own
from-scratch codec (``flac_codec``, r9); lossy codecs (mp3/aac) stay
honestly unimplemented: those genuinely need external libraries.

Everything is exact integer/IEEE math, so decode outputs are
bit-identical across engines and a DuckDB oracle can predict features
analytically for synthetic waveforms — the property the driver's value
gate (``mm_audio_features``) relies on.

Reference parity: the reference has no audio path at all — this backs
SURVEY §"multimodal" (a training-data pipeline requirement, not an
ecollector feature).
"""

from __future__ import annotations

import struct

import numpy as np


def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """16-bit PCM WAV bytes from an int16 array — (n,) mono or
    (n, channels) interleaved."""
    arr = np.asarray(samples, dtype="<i2")
    if arr.ndim == 1:
        arr = arr[:, None]
    if arr.ndim != 2 or arr.shape[0] < 1 or arr.shape[1] < 1:
        raise ValueError(f"unsupported sample shape {np.asarray(samples).shape}")
    n, ch = arr.shape
    data = np.ascontiguousarray(arr).tobytes()
    block_align = ch * 2
    fmt = struct.pack(
        "<HHIIHH", 1, ch, int(rate), int(rate) * block_align, block_align, 16
    )
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
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
    if audio_format != 1 or bits != 16:
        raise NotImplementedError(
            f"unsupported WAV variant (format={audio_format}, bits={bits}); "
            "only 16-bit integer PCM is implemented"
        )
    if ch < 1:
        raise ValueError("zero channels")
    return ch, rate, bits, data_len // (ch * 2)


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Decode to (samples, sample_rate) — int16 (n,) for mono,
    (n, channels) otherwise. Validates chunk sizes and PCM layout."""
    ch, rate, _bits, n = wav_header(data)
    pos = 12
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        if tag == b"data":
            raw = data[pos + 8 : pos + 8 + length]
            if len(raw) != length:
                raise ValueError("truncated data chunk")
            arr = np.frombuffer(raw, dtype="<i2").reshape(n, ch)
            return (arr[:, 0] if ch == 1 else arr), rate
        pos += 8 + length + (length & 1)
    raise ValueError("missing data chunk")
