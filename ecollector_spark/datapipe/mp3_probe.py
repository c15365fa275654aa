"""MPEG audio (MP3) metadata probe — frame-sync walker, no decode.

Built from scratch against the public MPEG-1/2 audio frame header
layout (ISO/IEC 11172-3 §2.4.1.3 / 13818-3): 32-bit headers on an
11-bit sync word carrying version, layer, bitrate index, sampling-rate
index, padding and channel mode. The probe walks every frame (each
header states its own frame length), skips a leading ID3v2 tag
(synchsafe size), and reports channels / sample rate / bitrate / frame
count / total samples — the triage a crawl pipeline needs before
deciding what to do with an audio payload.

Why probe-only: full Layer III DECODE needs the spec's normative
tabulated data — the 512-coefficient polyphase synthesis window (Table
B.3, shared by all three layers) and ~2000 Huffman codewords across 34
tables (Table B.7). Those are numeric tables with no generating
formula; unlike JPEG's Annex K (example tables every encoder bakes in,
reproduced for the r8 JPEG codec) or FLAC (fully algorithmic, r9),
they cannot be re-derived in this sandbox nor verified against a
reference decoder — and a decoder built on misremembered tables would
pass its own round-trip tests while SILENTLY corrupting real MP3s,
which is strictly worse than ``extract_features``'s loud
NotImplementedError. The header layout, bitrate/sample-rate tables and
frame-length arithmetic below ARE small, widely-published and
self-checkable (frame lengths must chain exactly through the file), so
the triage half ships; the decode half stays a named refusal.

``build_mp3`` synthesizes structurally-valid frame sequences (correct
headers, chained lengths, zeroed audio payload) for tests and the
triage gate — explicitly NOT decodable audio semantics.

FINAL DISPOSITION (r11, VERDICT r10 #4 — the Layer I/II experiment,
settled by analysis): implementing Layer I or Layer II would NOT
escape the blocker. Their bit-allocation and scalefactor tables
(11172-3 Tables B.2a-d / 3-B.1) are indeed small, but every layer's
output runs through the same polyphase SYNTHESIS filterbank, whose
window is the 512-coefficient Table B.3 — a tabulated prototype
lowpass filter with NO generating formula in the spec (the matrixing
cosines N(i,k) = cos((16+i)(2k+1)π/64) are algorithmic; the window D[]
is not). A Layer I/II decoder with a guessed window has exactly the
failure mode the refusal exists to prevent: it passes its own
round-trips (any self-consistent analysis/synthesis pair does) while
producing wrong PCM for real files, with no in-sandbox reference to
catch it. So MPEG audio decode is a FINAL named refusal — all three
layers, one shared root cause — and the effort went to the raw-crawl
WARC response path instead (VERDICT r10 #1, this round). Production
wiring: ffmpeg behind the same mapInPandas contract, swapped in where
``extract_features`` raises today.
"""

from __future__ import annotations

import struct

#: bitrate kbps by [version-group][layer][index]; index 0 is "free"
#: (refused — the walker cannot chain frames without a stated length),
#: index 15 is forbidden. Version group 0 = MPEG-1, 1 = MPEG-2/2.5.
_BITRATES = {
    (0, 1): (None, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448),
    (0, 2): (None, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),
    (0, 3): (None, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320),
    (1, 1): (None, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256),
    (1, 2): (None, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
    (1, 3): (None, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
}
#: sample rates by version bits (00=MPEG-2.5, 10=MPEG-2, 11=MPEG-1)
_RATES = {3: (44100, 48000, 32000), 2: (22050, 24000, 16000), 0: (11025, 12000, 8000)}
#: samples per frame by (version-group, layer)
_SPF = {(0, 1): 384, (0, 2): 1152, (0, 3): 1152, (1, 1): 384, (1, 2): 1152, (1, 3): 576}


def _id3v2_size(data: bytes) -> int:
    """Bytes to skip for a leading ID3v2 tag (0 if none): 'ID3' + ver(2)
    + flags(1) + 4 synchsafe size bytes + the stated payload."""
    if data[:3] != b"ID3" or len(data) < 10:
        return 0
    if any(b & 0x80 for b in data[6:10]):
        raise ValueError("corrupt ID3v2 tag: non-synchsafe size byte")
    size = (data[6] << 21) | (data[7] << 14) | (data[8] << 7) | data[9]
    return 10 + size


def _parse_frame_header(data: bytes, pos: int) -> dict:
    """One 32-bit frame header at ``pos`` -> fields + frame length."""
    if pos + 4 > len(data):
        raise ValueError("truncated MP3: no room for a frame header")
    (h,) = struct.unpack(">I", data[pos : pos + 4])
    if (h >> 21) & 0x7FF != 0x7FF:
        raise ValueError(f"not an MPEG frame header at offset {pos}")
    vbits = (h >> 19) & 3
    if vbits == 1:
        raise ValueError("reserved MPEG version bits")
    lbits = (h >> 17) & 3
    if lbits == 0:
        raise ValueError("reserved MPEG layer bits")
    layer = 4 - lbits  # 11->I, 10->II, 01->III
    vgroup = 0 if vbits == 3 else 1
    bidx = (h >> 12) & 0xF
    if bidx == 15:
        raise ValueError("forbidden bitrate index 15")
    if bidx == 0:
        raise NotImplementedError(
            "free-format MP3 (bitrate index 0) is not implemented"
        )
    bitrate = _BITRATES[(vgroup, layer)][bidx]
    ridx = (h >> 10) & 3
    if ridx == 3:
        raise ValueError("reserved sampling-rate index 3")
    rate = _RATES[vbits][ridx]
    padding = (h >> 9) & 1
    mode = (h >> 6) & 3
    channels = 1 if mode == 3 else 2
    if layer == 1:
        frame_len = (12 * bitrate * 1000 // rate + padding) * 4
    else:
        spf = _SPF[(vgroup, layer)]
        frame_len = spf // 8 * bitrate * 1000 // rate + padding
    return {
        "version_bits": vbits,
        "layer": layer,
        "bitrate_kbps": bitrate,
        "sample_rate": rate,
        "channels": channels,
        "samples_per_frame": _SPF[(vgroup, layer)],
        "frame_len": frame_len,
    }


def mp3_header(data: bytes) -> tuple[int, int, int, int]:
    """(channels, sample_rate, bitrate_kbps, layer) of the FIRST frame,
    after skipping a leading ID3v2 tag — the O(1) metadata read."""
    f = _parse_frame_header(data, _id3v2_size(data))
    return f["channels"], f["sample_rate"], f["bitrate_kbps"], f["layer"]


def mp3_probe(data: bytes) -> tuple[int, int, int, int, int]:
    """(channels, sample_rate, bitrate_kbps, n_frames, n_samples) by
    walking EVERY frame: each header states its own length, so the walk
    is a strict chain — a frame that doesn't land on the next sync word
    (or exactly at end of file) fails loud. Mixed frame parameters
    (VBR) are allowed; channels/rate must be consistent; the reported
    bitrate is the first frame's. Trailing ID3v1 (128-byte 'TAG' block)
    is tolerated."""
    pos = _id3v2_size(data)
    n_frames = n_samples = 0
    first = None
    while pos < len(data):
        if data[pos : pos + 3] == b"TAG" and len(data) - pos == 128:
            break  # trailing ID3v1
        f = _parse_frame_header(data, pos)
        if first is None:
            first = f
        elif (f["channels"], f["sample_rate"]) != (
            first["channels"],
            first["sample_rate"],
        ):
            raise ValueError(
                f"inconsistent stream: frame {n_frames} changes "
                "channels/sample_rate mid-file"
            )
        if pos + f["frame_len"] > len(data):
            raise ValueError(
                f"truncated MP3: frame {n_frames} at offset {pos} overruns data"
            )
        n_frames += 1
        n_samples += f["samples_per_frame"]
        pos += f["frame_len"]
    if first is None:
        raise ValueError("no MPEG frames found")
    return (
        first["channels"],
        first["sample_rate"],
        first["bitrate_kbps"],
        n_frames,
        n_samples,
    )


def looks_like_mp3(data: bytes) -> bool:
    """Magic-byte sniff: leading ID3v2 tag, or a valid-looking frame
    sync at offset 0 (11 set bits + non-reserved version/layer)."""
    if data[:3] == b"ID3":
        return True
    if len(data) < 4:
        return False
    return (
        data[0] == 0xFF
        and (data[1] & 0xE0) == 0xE0
        and (data[1] >> 3) & 3 != 1  # version not reserved
        and (data[1] >> 1) & 3 != 0  # layer not reserved
    )


def build_mp3(
    n_frames: int,
    bitrate_kbps: int = 128,
    sample_rate: int = 44100,
    channels: int = 1,
    layer: int = 3,
    id3_bytes: int = 0,
) -> bytes:
    """Structurally-valid MPEG-1 frame sequence for probe tests: correct
    headers and chained frame lengths, zeroed payload (NOT decodable
    audio — decode refuses by name anyway). Optional leading ID3v2 tag
    of ``id3_bytes`` zero payload bytes."""
    if sample_rate not in _RATES[3]:
        raise ValueError(f"not an MPEG-1 rate: {sample_rate}")
    table = _BITRATES[(0, layer)]
    if bitrate_kbps not in table:
        raise ValueError(f"invalid Layer {layer} bitrate: {bitrate_kbps}")
    bidx = table.index(bitrate_kbps)
    ridx = _RATES[3].index(sample_rate)
    mode = 3 if channels == 1 else 0
    h = (
        (0x7FF << 21)
        | (3 << 19)  # MPEG-1
        | ((4 - layer) << 17)
        | (1 << 16)  # no CRC
        | (bidx << 12)
        | (ridx << 10)
        | (mode << 6)
    )
    hdr = struct.pack(">I", h)
    if layer == 1:
        frame_len = 12 * bitrate_kbps * 1000 // sample_rate * 4
    else:
        frame_len = _SPF[(0, layer)] // 8 * bitrate_kbps * 1000 // sample_rate
    out = bytearray()
    if id3_bytes:
        size = id3_bytes
        out += b"ID3\x04\x00\x00" + bytes(
            [(size >> 21) & 0x7F, (size >> 14) & 0x7F, (size >> 7) & 0x7F, size & 0x7F]
        )
        out += bytes(size)
    frame = hdr + bytes(frame_len - 4)
    out += frame * n_frames
    return bytes(out)
