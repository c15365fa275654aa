"""Seeded mutation fuzz over every image decoder (r9): corrupt input —
byte flips, deletions, insertions — must surface ONLY as the documented
loud contract (ValueError / NotImplementedError), never struct.error,
IndexError, OverflowError, zlib.error, or an unbounded allocation.

Deterministic (fixed seed, fixed counts) so a failure is reproducible
by index. The round-9 fuzz pass found and fixed: JPEG int64 overflow on
corrupt DC size categories, PNG struct.error on overrunning chunk
lengths + zlib.error leak, and crafted-header allocation bombs in
JPEG/GIF (dimension ceilings)."""

from __future__ import annotations

import numpy as np
import pytest

from ecollector_spark.datapipe.bmp_codec import decode_bmp, encode_bmp
from ecollector_spark.datapipe.gif_codec import decode_gif, encode_gif
from ecollector_spark.datapipe.jpeg_codec import decode_jpeg, encode_jpeg
from ecollector_spark.datapipe.png_codec import decode_png, encode_png


def _mutants(data: bytes, n: int, seed: int):
    rng = np.random.default_rng(seed)
    for _ in range(n):
        b = bytearray(data)
        for _ in range(int(rng.integers(1, 4))):
            op = int(rng.integers(0, 3))
            pos = int(rng.integers(0, len(b)))
            if op == 0:
                b[pos] = int(rng.integers(0, 256))
            elif op == 1 and len(b) > 1:
                del b[pos]
            else:
                b.insert(pos, int(rng.integers(0, 256)))
        yield bytes(b)


_IMG = (np.arange(12 * 14, dtype=np.int64) * 37 % 256).astype(np.uint8).reshape(12, 14)

_CASES = [
    ("gif", encode_gif, decode_gif, {}),
    ("bmp", encode_bmp, decode_bmp, {}),
    ("jpeg", encode_jpeg, decode_jpeg, {"quality": 85}),
    ("jpeg_progressive", encode_jpeg, decode_jpeg, {"quality": 85, "progressive": True}),
    ("png", encode_png, decode_png, {}),
]


@pytest.mark.parametrize("name,enc,dec,kw", _CASES, ids=[c[0] for c in _CASES])
def test_decoder_raises_only_documented_exceptions(name, enc, dec, kw):
    data = enc(_IMG, **kw)
    escaped = []
    for i, mutant in enumerate(_mutants(data, 150, seed=hash(name) % 2**32)):
        try:
            out = dec(mutant)
            assert out.dtype == np.uint8  # survived mutation: still sane
        except (ValueError, NotImplementedError):
            pass
        except Exception as e:  # noqa: BLE001 - the point of the test
            escaped.append((i, type(e).__name__, str(e)[:80]))
    assert not escaped, f"{name}: undocumented exceptions {escaped[:5]}"


def test_dimension_bombs_refused():
    """Crafted headers must not become multi-GB allocations."""
    import struct

    jpg = bytearray(encode_jpeg(_IMG, quality=85))
    sof = bytes(jpg).index(b"\xff\xc0")
    jpg[sof + 5 : sof + 9] = struct.pack(">HH", 65535, 65535)
    with pytest.raises(ValueError, match="dimensions"):
        decode_jpeg(bytes(jpg))

    gif = bytearray(encode_gif(_IMG))
    desc = 13 + 3 * 256  # image descriptor after the 256-entry palette
    gif[desc + 5 : desc + 9] = struct.pack("<HH", 65535, 65535)
    with pytest.raises(ValueError, match="dimensions"):
        decode_gif(bytes(gif))
