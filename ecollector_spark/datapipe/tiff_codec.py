"""Pure-Python baseline TIFF codec — from scratch against the public
TIFF 6.0 specification.

Scope (the baseline-TIFF subset real scanned/exported corpora carry,
refusals loud and by name like the other codecs):

- decode: both byte orders (II little / MM big), 8-bit grayscale
  (PhotometricInterpretation 0 WhiteIsZero / 1 BlackIsZero) and 8-bit
  RGB, Compression 1 (none), 32773 (PackBits), 8/32946 (Deflate —
  zlib per strip, the Adobe extension) and 5 (LZW, r10 — MSB-first
  variable-width codes with the spec's EARLY-CHANGE width bumps, §13),
  Predictor 2 (horizontal differencing, §14, the usual LZW pairing),
  multi-strip, chunky planar layout; BitsPerSample other than 8,
  CCITT/JPEG compression, PlanarConfiguration 2 and tiled files raise
  ``NotImplementedError`` naming the feature.
- encode: little-endian, grayscale (n, h) or RGB (h, w, 3) uint8,
  compression none / "packbits" / "deflate" / "lzw", optional
  horizontal-differencing predictor, configurable rows per strip.

Both paths are LOSSLESS for the supported subset, so
``decode_tiff(encode_tiff(x)) == x`` exactly — the math-free oracle
property the GIF/FLAC gates use. Corrupt input fails with ValueError
(bounds-checked IFD walk, strip sizes validated).

Reference parity: the reference has no image path — this backs SURVEY
§"multimodal" (training-data pipeline requirement).
"""

from __future__ import annotations

import struct

import numpy as np

#: TIFF tag ids (TIFF 6.0 §8)
_WIDTH, _LENGTH, _BPS, _COMPRESSION = 256, 257, 258, 259
_PHOTOMETRIC, _STRIP_OFFSETS, _SPP = 262, 273, 277
_ROWS_PER_STRIP, _STRIP_COUNTS, _PLANAR = 278, 279, 284
_PREDICTOR = 317

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}

#: allocation guard (same ceiling class as the other image codecs)
_MAX_DIM = 1 << 16


def packbits_encode(data: bytes) -> bytes:
    """Apple PackBits RLE (TIFF 6.0 §9): runs of >= 3 equal bytes become
    (257-n, byte); literals are copied in <= 128-byte chunks."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 3:
            out += bytes([257 - run, data[i]])
            i += run
            continue
        lit_start = i
        i += run
        while i < n and i - lit_start < 128:
            run = 1
            while i + run < n and run < 3 and data[i + run] == data[i]:
                run += 1
            if run >= 3:
                break
            i += 1
        out += bytes([i - lit_start - 1]) + data[lit_start:i]
    return bytes(out)


def packbits_decode(data: bytes, expected: int) -> bytes:
    """Inverse of :func:`packbits_encode`; ``expected`` bounds the
    output so a crafted stream cannot balloon."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n and len(out) < expected:
        c = data[i]
        i += 1
        if c == 128:  # noop
            continue
        if c < 128:  # literal run of c+1
            if i + c + 1 > n:
                raise ValueError("truncated PackBits literal run")
            out += data[i : i + c + 1]
            i += c + 1
        else:  # repeat next byte 257-c times
            if i >= n:
                raise ValueError("truncated PackBits repeat run")
            out += bytes([data[i]]) * (257 - c)
            i += 1
    if len(out) != expected:
        raise ValueError(
            f"PackBits decoded {len(out)} bytes, expected {expected}"
        )
    return bytes(out)


def lzw_encode_tiff(data: bytes) -> bytes:
    """TIFF-flavor LZW (TIFF 6.0 §13). Same algorithm family as the GIF
    codec's ``lzw_encode`` but with the format's three quirks: MSB-first
    bit packing, fixed 8-bit symbols (Clear=256, EOI=257, first table
    entry 258, codes start at 9 bits), and the EARLY-CHANGE convention —
    the code width bumps when the table reaches 2^width - 1 entries, one
    code earlier than GIF. The dictionary resets with a ClearCode as
    soon as entry 4093 has been assigned (next would be 4094, the spec's
    mandated reset point)."""
    out = bytearray()
    acc = n = 0

    def write(code: int, width: int) -> None:
        nonlocal acc, n
        acc = (acc << width) | code
        n += width
        while n >= 8:
            out.append((acc >> (n - 8)) & 0xFF)
            n -= 8
            acc &= (1 << n) - 1

    CLEAR, EOI = 256, 257

    def fresh():
        return {bytes([i]): i for i in range(256)}

    table = fresh()
    next_code, width = 258, 9
    write(CLEAR, width)
    prefix = b""
    for b in data:
        cand = prefix + bytes([b])
        if cand in table:
            prefix = cand
            continue
        write(table[prefix], width)
        table[cand] = next_code
        next_code += 1
        if next_code == 4094:
            write(CLEAR, width)
            table = fresh()
            next_code, width = 258, 9
        elif next_code == (1 << width) - 1 and width < 12:
            width += 1
        prefix = bytes([b])
    if prefix:
        write(table[prefix], width)
    write(EOI, width)
    if n:
        out.append((acc << (8 - n)) & 0xFF)
    return bytes(out)


def lzw_decode_tiff(data: bytes, expected: int) -> bytes:
    """Decode ``expected`` bytes of TIFF LZW. Mirrors the encoder's
    early-change rule from the DECODER's seat: the reader lags the
    writer by exactly one table entry, so the width bumps when the
    local table reaches 2^width - 2 entries (one less than the
    encoder's threshold) — the classic off-by-one that makes naive
    GIF-style decoders tear TIFF streams apart mid-image. Tolerant of a
    missing EOI (strip byte counts bound the output), loud on bad
    codes/truncation."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    pos = 0
    total = 8 * len(data)

    def read(width: int) -> int:
        nonlocal pos
        if pos + width > total:
            raise ValueError("truncated TIFF strip: LZW stream exhausted")
        byte0 = pos >> 3
        chunk = int.from_bytes(data[byte0 : byte0 + 4].ljust(4, b"\x00"), "big")
        v = (chunk >> (32 - (pos & 7) - width)) & ((1 << width) - 1)
        pos += width
        return v

    table: list[bytes] = []
    width = 9
    prev: bytes | None = None

    def reset():
        nonlocal table, width, prev
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9
        prev = None

    reset()
    while len(out) < expected:
        code = read(width)
        if code == CLEAR:
            reset()
            continue
        if code == EOI:
            break
        if code < len(table) and code not in (CLEAR, EOI):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError(f"corrupt TIFF strip: LZW code {code} out of range")
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) - 2 and width < 12:
                width += 1
        prev = entry
    if len(out) < expected:
        raise ValueError(
            f"truncated TIFF strip: {len(out)} of {expected} bytes decoded"
        )
    return bytes(out[:expected])


def _hdiff(rows: np.ndarray, spp: int) -> bytes:
    """Horizontal differencing (Predictor 2, TIFF 6.0 §14): per row,
    each sample becomes the mod-256 difference from the same channel of
    the previous pixel."""
    a = rows.astype(np.int16).reshape(rows.shape[0], -1, spp)
    d = a.copy()
    d[:, 1:, :] -= a[:, :-1, :]
    return (d & 0xFF).astype(np.uint8).tobytes()


def _hundiff(arr: np.ndarray, spp: int) -> np.ndarray:
    """Inverse of :func:`_hdiff`: mod-256 cumulative sum along each row
    per channel (vectorized — uint8 addition wraps exactly like the
    encoder's subtraction)."""
    a = arr.reshape(arr.shape[0], -1, spp)
    return (
        np.cumsum(a.astype(np.int64), axis=1) & 0xFF
    ).astype(np.uint8).reshape(arr.shape)


def encode_tiff(
    img: np.ndarray,
    packbits: bool = False,
    rows_per_strip: int = 32,
    compression: str | None = None,
    predictor: bool = False,
) -> bytes:
    """Little-endian baseline TIFF from uint8 (h, w) grayscale or
    (h, w, 3) RGB. ``compression``: None (or "none"), "packbits",
    "deflate" (zlib per strip, tag value 8), "lzw" (tag value 5, r10);
    the legacy ``packbits`` flag is equivalent to
    compression="packbits". ``predictor`` writes Predictor=2 tags and
    horizontally differences each row first (the pairing real LZW TIFFs
    almost always use — flat rows collapse to near-nothing)."""
    if compression is None:
        compression = "packbits" if packbits else "none"
    if compression not in ("none", "packbits", "deflate", "lzw"):
        raise ValueError(f"unknown TIFF compression {compression!r}")
    arr = np.asarray(img, dtype=np.uint8)
    if arr.ndim == 2:
        spp, photometric = 1, 1  # BlackIsZero
    elif arr.ndim == 3 and arr.shape[2] == 3:
        spp, photometric = 3, 2  # RGB
    else:
        raise ValueError(f"unsupported image shape {arr.shape}")
    h, w = arr.shape[:2]
    if not (0 < h <= _MAX_DIM and 0 < w <= _MAX_DIM):
        raise ValueError(f"unsupported dimensions {w}x{h}")
    rps = max(1, min(rows_per_strip, h))
    if predictor:
        raw = _hdiff(arr.reshape(h, w * spp), spp)
    else:
        raw = np.ascontiguousarray(arr).tobytes()
    row_bytes = w * spp
    import zlib

    strips = []
    for r0 in range(0, h, rps):
        chunk = raw[r0 * row_bytes : min(r0 + rps, h) * row_bytes]
        if compression == "packbits":
            chunk = packbits_encode(chunk)
        elif compression == "deflate":
            chunk = zlib.compress(chunk)
        elif compression == "lzw":
            chunk = lzw_encode_tiff(chunk)
        strips.append(chunk)
    compression = {"none": 1, "packbits": 32773, "deflate": 8, "lzw": 5}[
        compression
    ]

    entries = []  # (tag, type, count, value) — SHORT/LONG inline values

    def entry(tag, typ, count, value):
        entries.append((tag, typ, count, value))

    # layout: header(8) + IFD + strip data
    n_entries = 11 if predictor else 10
    ifd_size = 2 + n_entries * 12 + 4
    data_start = 8 + ifd_size
    # strip offsets array (LONG) and byte counts (LONG) live after the
    # IFD when more than one strip (else inline)
    extra = b""
    if len(strips) > 1:
        off_array_pos = data_start
        cnt_array_pos = off_array_pos + 4 * len(strips)
        strip_start = cnt_array_pos + 4 * len(strips)
    else:
        strip_start = data_start
    offsets, pos = [], strip_start
    for s in strips:
        offsets.append(pos)
        pos += len(s)
    entry(_WIDTH, 4, 1, w)
    entry(_LENGTH, 4, 1, h)
    if spp == 1:
        entry(_BPS, 3, 1, 8)
    else:
        # three SHORTs fit... 3*2=6 bytes > 4: store after strips
        bps_pos = pos
        extra = struct.pack("<3H", 8, 8, 8)
        entry(_BPS, 3, 3, bps_pos)
    entry(_COMPRESSION, 3, 1, compression)
    entry(_PHOTOMETRIC, 3, 1, photometric)
    if len(strips) > 1:
        entry(_STRIP_OFFSETS, 4, len(strips), off_array_pos)
    else:
        entry(_STRIP_OFFSETS, 4, 1, offsets[0])
    entry(_SPP, 3, 1, spp)
    entry(_ROWS_PER_STRIP, 4, 1, rps)
    if len(strips) > 1:
        entry(_STRIP_COUNTS, 4, len(strips), cnt_array_pos)
    else:
        entry(_STRIP_COUNTS, 4, 1, len(strips[0]))
    entry(_PLANAR, 3, 1, 1)
    if predictor:
        entry(_PREDICTOR, 3, 1, 2)
    assert len(entries) == n_entries
    out = bytearray(b"II" + struct.pack("<HI", 42, 8))
    out += struct.pack("<H", n_entries)
    for tag, typ, count, value in sorted(entries):
        out += struct.pack("<HHI", tag, typ, count)
        out += struct.pack("<I", value) if typ == 4 or count > 1 else struct.pack(
            "<HH", value, 0
        )
    out += struct.pack("<I", 0)  # next IFD
    if len(strips) > 1:
        out += struct.pack(f"<{len(strips)}I", *offsets)
        out += struct.pack(f"<{len(strips)}I", *[len(s) for s in strips])
    for s in strips:
        out += s
    out += extra
    return bytes(out)


def _read_ifd(data: bytes, bo: str):
    """First IFD as {tag: (type, count, values tuple)} with
    bounds-checked reads."""
    if len(data) < 8:
        raise ValueError("truncated TIFF header")
    (ifd_off,) = struct.unpack(bo + "I", data[4:8])
    if ifd_off + 2 > len(data):
        raise ValueError("IFD offset past end of file")
    (n,) = struct.unpack(bo + "H", data[ifd_off : ifd_off + 2])
    if ifd_off + 2 + n * 12 + 4 > len(data):
        raise ValueError("truncated IFD")
    tags = {}
    for i in range(n):
        epos = ifd_off + 2 + i * 12
        tag, typ, count = struct.unpack(bo + "HHI", data[epos : epos + 8])
        if typ not in _TYPE_SIZE:
            continue  # unknown type: skip per spec
        total = _TYPE_SIZE[typ] * count
        if total <= 4:
            vpos = epos + 8
        else:
            (vpos,) = struct.unpack(bo + "I", data[epos + 8 : epos + 12])
            if vpos + total > len(data):
                raise ValueError(f"tag {tag} value past end of file")
        if typ == 3:
            vals = struct.unpack(bo + f"{count}H", data[vpos : vpos + 2 * count])
        elif typ == 4:
            vals = struct.unpack(bo + f"{count}I", data[vpos : vpos + 4 * count])
        elif typ == 1:
            vals = tuple(data[vpos : vpos + count])
        else:
            vals = ()
        tags[tag] = (typ, count, vals)
    return tags


def tiff_header(data: bytes) -> tuple[int, int, int]:
    """(width, height, samples_per_pixel) from the first IFD without
    touching strip data — the cheap metadata probe."""
    if data[:2] == b"II":
        bo = "<"
    elif data[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError("not a TIFF (bad byte-order mark)")
    if struct.unpack(bo + "H", data[2:4])[0] != 42:
        raise ValueError("not a TIFF (bad magic 42)")
    tags = _read_ifd(data, bo)

    def one(tag, default=None):
        if tag not in tags:
            if default is None:
                raise ValueError(f"missing required TIFF tag {tag}")
            return default
        return tags[tag][2][0]

    w, h = one(_WIDTH), one(_LENGTH)
    if not (0 < w <= _MAX_DIM and 0 < h <= _MAX_DIM):
        raise ValueError(f"unreasonable TIFF dimensions {w}x{h}")
    return w, h, one(_SPP, 1)


def decode_tiff(data: bytes) -> np.ndarray:
    """Decode to uint8 (h, w) grayscale or (h, w, 3) RGB."""
    w, h, spp = tiff_header(data)
    bo = "<" if data[:2] == b"II" else ">"
    tags = _read_ifd(data, bo)

    def vals(tag, default=None):
        if tag not in tags:
            if default is None:
                raise ValueError(f"missing required TIFF tag {tag}")
            return default
        return tags[tag][2]

    bps = vals(_BPS, (8,))
    if any(b != 8 for b in bps):
        raise NotImplementedError(
            f"TIFF BitsPerSample {bps} is not implemented (8-bit only)"
        )
    comp = vals(_COMPRESSION, (1,))[0]
    if comp not in (1, 32773, 8, 32946, 5):
        names = {6: "old-JPEG", 7: "JPEG", 2: "CCITT G3"}
        raise NotImplementedError(
            f"TIFF compression {comp} ({names.get(comp, 'unknown')}) is not "
            "implemented (none/PackBits/Deflate/LZW only)"
        )
    pred = vals(_PREDICTOR, (1,))[0]
    if pred not in (1, 2):
        raise NotImplementedError(f"TIFF predictor {pred} is not implemented")
    if vals(_PLANAR, (1,))[0] != 1:
        raise NotImplementedError("TIFF planar configuration 2 is not implemented")
    if 322 in tags or 323 in tags:
        raise NotImplementedError("tiled TIFF is not implemented (strips only)")
    photometric = vals(_PHOTOMETRIC)[0]
    if photometric not in (0, 1, 2):
        raise NotImplementedError(
            f"TIFF photometric {photometric} is not implemented "
            "(grayscale/RGB only)"
        )
    if spp not in (1, 3) or (photometric == 2) != (spp == 3):
        raise ValueError(f"inconsistent SamplesPerPixel {spp} / photometric {photometric}")
    offsets = vals(_STRIP_OFFSETS)
    counts = vals(_STRIP_COUNTS)
    if len(offsets) != len(counts):
        raise ValueError("StripOffsets/StripByteCounts length mismatch")
    rps = vals(_ROWS_PER_STRIP, (h,))[0]
    row_bytes = w * spp
    raw = bytearray()
    rows_done = 0
    for i, (off, cnt) in enumerate(zip(offsets, counts)):
        if off + cnt > len(data):
            raise ValueError(f"strip {i} past end of file")
        chunk = data[off : off + cnt]
        n_rows = min(rps, h - rows_done)
        if n_rows <= 0:
            raise ValueError("more strips than image rows")
        if comp == 32773:
            chunk = packbits_decode(chunk, n_rows * row_bytes)
        elif comp == 5:
            chunk = lzw_decode_tiff(chunk, n_rows * row_bytes)
        elif comp in (8, 32946):
            import zlib

            try:
                # max_length caps the inflate output — a crafted strip
                # cannot balloon past the declared geometry
                dec = zlib.decompressobj()
                chunk = dec.decompress(bytes(chunk), n_rows * row_bytes)
                overflow = bool(dec.unconsumed_tail) or bool(
                    dec.decompress(b"", 1)
                )
            except zlib.error as e:
                raise ValueError(f"strip {i}: bad Deflate stream ({e})") from None
            if overflow or len(chunk) != n_rows * row_bytes:
                raise ValueError(
                    f"strip {i}: Deflate yields {len(chunk)}+ bytes, "
                    f"expected exactly {n_rows * row_bytes}"
                )
        elif len(chunk) != n_rows * row_bytes:
            raise ValueError(
                f"strip {i}: {len(chunk)} bytes for {n_rows} rows of {row_bytes}"
            )
        raw += chunk
        rows_done += n_rows
    if rows_done != h:
        raise ValueError(f"strips cover {rows_done} of {h} rows")
    arr = np.frombuffer(bytes(raw), dtype=np.uint8)
    if pred == 2:  # undo horizontal differencing before anything else
        arr = _hundiff(arr.reshape(h, row_bytes), spp).reshape(-1)
    arr = arr.reshape(h, w) if spp == 1 else arr.reshape(h, w, 3)
    if photometric == 0:  # WhiteIsZero: invert to BlackIsZero convention
        arr = 255 - arr
    return arr
