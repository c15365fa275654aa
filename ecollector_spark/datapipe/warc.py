"""WARC / WET container parsing — the ingestion format of real web
corpora (Common Crawl ships WARC for raw crawls and WET for extracted
text), built from scratch against the public ISO 28500 record layout:

    WARC/1.0\\r\\n
    <header-name>: <value>\\r\\n ...
    Content-Length: N\\r\\n
    \\r\\n
    <N payload bytes>\\r\\n\\r\\n

Files are either plain concatenated records or (the Common Crawl
convention) one gzip MEMBER per record, members concatenated — stdlib
zlib handles both (multi-member inflate loop, no external libs).

The Spark surface (:func:`read_warc_media`) is the standard multimodal
contract: Arrow-batched ``mapInPandas`` over binary payloads, one
output row per record — embarrassingly parallel, no shuffle; at 100 TB
each WARC file is one row of a ``binaryFile`` scan and record
explosion happens inside the Python stage (the same 1→N shape as
``extract_video_frames``). Corrupt input fails loud per file
(bounds-checked lengths, version check, Content-Length chaining);
:func:`build_wet` synthesizes byte-exact files for tests and the
closed-form gate.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

#: maximum records per file / header bytes per record — allocation
#: guards in the same class as the codecs' dimension ceilings
_MAX_RECORDS = 1 << 20
_MAX_HEADER = 1 << 16


def build_wet(
    records: list[dict],
    gzip_members: bool = False,
) -> bytes:
    """Byte-exact WET file from record dicts (keys: ``url``, ``date``,
    ``text``; optional ``warc_type``, default ``conversion`` — the WET
    text-extraction record type). ``gzip_members=True`` writes the
    Common Crawl layout: one gzip member per record, concatenated."""
    out = bytearray()
    for r in records:
        payload = r["text"].encode("utf-8")
        head = (
            "WARC/1.0\r\n"
            f"WARC-Type: {r.get('warc_type', 'conversion')}\r\n"
            f"WARC-Target-URI: {r['url']}\r\n"
            f"WARC-Date: {r['date']}\r\n"
            "Content-Type: text/plain\r\n"
            f"Content-Length: {len(payload)}\r\n"
            "\r\n"
        ).encode("utf-8")
        rec = head + payload + b"\r\n\r\n"
        if gzip_members:
            co = zlib.compressobj(9, zlib.DEFLATED, 16 + zlib.MAX_WBITS)
            rec = co.compress(rec) + co.flush()
        out += rec
    return bytes(out)


def _gunzip_members(data: bytes) -> bytes:
    """Concatenated gzip members -> concatenated plaintext. A trailing
    partial member fails loud (truncated upload, the common S3 tail
    corruption)."""
    out = bytearray()
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        try:
            out += d.decompress(data[pos:])
            out += d.flush()
        except zlib.error as e:
            raise ValueError(f"corrupt gzip member at offset {pos}: {e}") from None
        if not d.eof:
            raise ValueError(f"truncated gzip member at offset {pos}")
        consumed = len(data) - pos - len(d.unused_data)
        if consumed <= 0:
            raise ValueError(f"empty gzip member at offset {pos}")
        pos += consumed
    return bytes(out)


def parse_warc(data: bytes) -> list[dict]:
    """Every record of a WARC/WET file as
    ``{warc_type, url, date, content_length, text}`` — plain or
    gzip-member input (sniffed on the 0x1f8b magic). Loud on a bad
    version line, a missing/forged Content-Length, or truncation; the
    record chain must consume the file exactly."""
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_members(data)
    records: list[dict] = []
    pos = 0
    while pos < len(data):
        if len(records) >= _MAX_RECORDS:
            raise ValueError("unreasonable record count (corrupt chaining?)")
        hdr_end = data.find(b"\r\n\r\n", pos, pos + _MAX_HEADER)
        if hdr_end < 0:
            raise ValueError(
                f"record at offset {pos}: no header terminator within "
                f"{_MAX_HEADER} bytes"
            )
        head = data[pos:hdr_end].decode("utf-8", errors="replace")
        lines = head.split("\r\n")
        if not lines[0].startswith("WARC/"):
            raise ValueError(
                f"record at offset {pos}: bad version line {lines[0]!r}"
            )
        fields: dict[str, str] = {}
        for line in lines[1:]:
            k, _, v = line.partition(":")
            if not _:
                raise ValueError(
                    f"record at offset {pos}: malformed header line {line!r}"
                )
            fields[k.strip().lower()] = v.strip()
        try:
            clen = int(fields["content-length"])
        except (KeyError, ValueError):
            raise ValueError(
                f"record at offset {pos}: missing/invalid Content-Length"
            ) from None
        body_start = hdr_end + 4
        body_end = body_start + clen
        if body_end + 4 > len(data):
            raise ValueError(
                f"record at offset {pos}: Content-Length {clen} overruns file"
            )
        if data[body_end : body_end + 4] != b"\r\n\r\n":
            raise ValueError(
                f"record at offset {pos}: payload not followed by the "
                "record separator (Content-Length forged or corrupt)"
            )
        records.append(
            {
                "warc_type": fields.get("warc-type", ""),
                "url": fields.get("warc-target-uri", ""),
                "date": fields.get("warc-date", ""),
                "content_length": clen,
                "text": data[body_start:body_end].decode("utf-8", errors="replace"),
            }
        )
        pos = body_end + 4
    return records


WARC_RECORD_SCHEMA = (
    "doc_id long, rec_idx int, warc_type string, url string, date string, "
    "content_length long, text string"
)


def read_warc_media(media: DataFrame) -> DataFrame:
    """Explode a media table's WARC/WET payloads into one row per
    record: (doc_id, rec_idx, warc_type, url, date, content_length,
    text). Arrow-batched mapInPandas, no shuffle — the ingestion stage
    that turns a ``binaryFile`` scan of a crawl bucket into the
    ``documents``-shaped corpus every other datapipe operator eats."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                k: []
                for k in (
                    "doc_id", "rec_idx", "warc_type", "url", "date",
                    "content_length", "text",
                )
            }
            for doc_id, blob in zip(pdf["doc_id"], pdf["media"]):
                for i, rec in enumerate(parse_warc(bytes(blob or b""))):
                    out["doc_id"].append(int(doc_id))
                    out["rec_idx"].append(i)
                    out["warc_type"].append(rec["warc_type"])
                    out["url"].append(rec["url"])
                    out["date"].append(rec["date"])
                    out["content_length"].append(rec["content_length"])
                    out["text"].append(rec["text"])
            yield pd.DataFrame(out)

    return media.mapInPandas(op, schema=WARC_RECORD_SCHEMA)
