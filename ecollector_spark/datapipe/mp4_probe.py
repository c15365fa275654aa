"""MP4 / ISO-BMFF metadata probe — box-tree walker, no decode.

Built from scratch against the public ISO base-media file format
(ISO/IEC 14496-12): a file is a tree of length-prefixed boxes
``[size:u32][type:4cc][payload]`` (size 1 -> 64-bit largesize follows;
size 0 -> box runs to end of file). The probe walks ftyp (brand), moov/
mvhd (timescale + duration), each trak's tkhd (track id, 16.16
fixed-point presentation width/height) and mdia/hdlr (handler 4cc:
``vide``/``soun``/...) — the triage a crawl pipeline needs to route
video payloads by duration/geometry without touching a single sample.

Why probe-only: the sample DATA is H.264/AAC — entropy-coded bitstreams
whose decoders (CABAC context tables, MDCT windows, scalefactor bands)
are out of honest reach in this sandbox (see mp3_probe's refusal note;
h264 was already judged legitimately out of scope in r9). The box
layer, by contrast, is pure structure: lengths chain exactly, every
field below is fixed-offset arithmetic, and ``build_mp4`` constructs
the same tree for tests — so the walker is self-checking end to end.
"""

from __future__ import annotations

import struct


def _walk(data: bytes, start: int, end: int):
    """Yield (type, payload_start, payload_end) of each box in
    [start, end); loud on lengths that do not chain."""
    pos = start
    while pos < end:
        if pos + 8 > end:
            raise ValueError(f"truncated box header at offset {pos}")
        (size,) = struct.unpack(">I", data[pos : pos + 4])
        btype = data[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError(f"truncated largesize box at offset {pos}")
            (size,) = struct.unpack(">Q", data[pos + 8 : pos + 16])
            body = pos + 16
        elif size == 0:
            size = end - pos
        if size < body - pos or pos + size > end:
            raise ValueError(
                f"box {btype!r} at offset {pos}: size {size} overruns container"
            )
        yield btype, body, pos + size
        pos += size


def _child(data: bytes, start: int, end: int, btype: bytes):
    for t, b, e in _walk(data, start, end):
        if t == btype:
            return b, e
    return None


def looks_like_mp4(data: bytes) -> bool:
    """Magic sniff: a leading ftyp box (the near-universal first box)."""
    return len(data) >= 12 and data[4:8] == b"ftyp"


def mp4_probe(data: bytes) -> dict:
    """Metadata of an ISO-BMFF file:

    ``brand`` (ftyp major), ``timescale``, ``duration`` (mvhd units),
    ``duration_s`` (duration/timescale, float), ``n_tracks``,
    ``handlers`` (sorted list of handler 4ccs), ``width``/``height``
    (the first video track's tkhd presentation size, integer part) —
    None when absent. Walks headers only; sample data (mdat) is never
    read."""
    if not looks_like_mp4(data):
        raise ValueError("not an ISO-BMFF file (no leading ftyp box)")
    out = {
        "brand": None,
        "timescale": None,
        "duration": None,
        "duration_s": None,
        "n_tracks": 0,
        "handlers": [],
        "width": None,
        "height": None,
    }
    moov = None
    for btype, b, e in _walk(data, 0, len(data)):
        if btype == b"ftyp":
            if e - b < 8:
                raise ValueError("truncated ftyp payload")
            out["brand"] = data[b : b + 4].decode("latin-1")
        elif btype == b"moov":
            moov = (b, e)
    if moov is None:
        raise ValueError("no moov box (metadata not present)")
    mb, me = moov
    mv = _child(data, mb, me, b"mvhd")
    if mv is None:
        raise ValueError("moov without mvhd")
    vb, ve = mv
    version = data[vb]
    if version == 0:
        if ve - vb < 24:
            raise ValueError("truncated mvhd v0")
        out["timescale"], out["duration"] = struct.unpack(
            ">II", data[vb + 12 : vb + 20]
        )
    elif version == 1:
        if ve - vb < 32:
            raise ValueError("truncated mvhd v1")
        (out["timescale"],) = struct.unpack(">I", data[vb + 20 : vb + 24])
        (out["duration"],) = struct.unpack(">Q", data[vb + 24 : vb + 32])
    else:
        raise ValueError(f"unknown mvhd version {version}")
    if out["timescale"]:
        out["duration_s"] = out["duration"] / out["timescale"]
    for btype, tb, te in _walk(data, mb, me):
        if btype != b"trak":
            continue
        out["n_tracks"] += 1
        handler = None
        md = _child(data, tb, te, b"mdia")
        if md is not None:
            hd = _child(data, md[0], md[1], b"hdlr")
            if hd is not None and hd[1] - hd[0] >= 12:
                handler = data[hd[0] + 8 : hd[0] + 12].decode("latin-1")
                out["handlers"].append(handler)
        tk = _child(data, tb, te, b"tkhd")
        if tk is None:
            continue
        kb, ke = tk
        tv = data[kb]
        # width/height are the LAST 8 payload bytes (16.16 fixed) in
        # both tkhd versions — offset from the end avoids the
        # version-dependent leading-field widths
        if ke - kb < 8:
            raise ValueError(f"truncated tkhd v{tv}")
        w_fx, h_fx = struct.unpack(">II", data[ke - 8 : ke])
        if handler == "vide" and out["width"] is None:
            out["width"], out["height"] = w_fx >> 16, h_fx >> 16
    out["handlers"].sort()
    return out


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def build_mp4(
    timescale: int = 1000,
    duration: int = 60000,
    width: int | None = 640,
    height: int | None = 360,
    audio: bool = False,
    brand: str = "isom",
) -> bytes:
    """Minimal valid ISO-BMFF tree for probe tests: ftyp + moov{mvhd,
    trak{tkhd, mdia{hdlr=vide}}[, audio trak]} + an empty mdat. Headers
    only — there are no samples (decode refuses by name anyway)."""
    ftyp = _box(b"ftyp", brand.encode("latin-1") + struct.pack(">I", 0) + b"isom")
    mvhd = _box(
        b"mvhd",
        bytes(4)  # version 0 + flags
        + bytes(8)  # ctime, mtime
        + struct.pack(">II", timescale, duration)
        + struct.pack(">I", 0x00010000)  # rate 1.0
        + struct.pack(">H", 0x0100)  # volume 1.0
        + bytes(10)  # reserved
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + bytes(24)  # predefined
        + struct.pack(">I", 3),  # next track id
    )
    def trak(track_id: int, handler: bytes, w: int, h: int) -> bytes:
        tkhd = _box(
            b"tkhd",
            b"\x00\x00\x00\x07"  # v0, enabled|in-movie|in-preview
            + bytes(8)
            + struct.pack(">I", track_id)
            + bytes(4)
            + struct.pack(">I", duration)
            + bytes(8)
            + struct.pack(">hh", 0, 0)  # layer, alternate group
            + struct.pack(">H", 0x0100 if handler == b"soun" else 0)
            + bytes(2)
            + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
            + struct.pack(">II", w << 16, h << 16),
        )
        hdlr = _box(
            b"hdlr", bytes(4) + bytes(4) + handler + bytes(12) + b"probe\x00"
        )
        mdia = _box(b"mdia", hdlr)
        return _box(b"trak", tkhd + mdia)

    traks = b""
    if width is not None and height is not None:
        traks += trak(1, b"vide", width, height)
    if audio:
        traks += trak(2, b"soun", 0, 0)
    moov = _box(b"moov", mvhd + traks)
    return ftyp + moov + _box(b"mdat", b"")
