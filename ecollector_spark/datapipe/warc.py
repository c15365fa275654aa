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

The Spark surface is the standard multimodal contract: Arrow-batched
``mapInPandas`` over binary payloads, one output row per record —
embarrassingly parallel, no shuffle; at 100 TB each WARC file is one
row of a ``binaryFile`` scan and record explosion happens inside the
Python stage (the same 1→N shape as ``extract_video_frames``). Two
record paths (r11 completes the pair):

- :func:`read_warc_media` — WET ``conversion`` records (extracted
  text), the documents-table ingest.
- :func:`read_warc_responses` — raw-crawl ``response`` records, whose
  payload is a full HTTP message (status line + headers + body); the
  body is where the images/audio for the multimodal codecs live. The
  HTTP split honors Content-Type and Content-Length and strictly
  de-chunks ``Transfer-Encoding: chunked`` bodies — chunk framing is
  self-validating; extensions/trailers/stacked codings are refused by
  name (:func:`split_http_response`, r12).

Corrupt input fails loud per file (bounds-checked lengths, version
check, Content-Length chaining); :func:`build_wet` / :func:`build_warc`
synthesize byte-exact files for tests and the closed-form gates.
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


def _walk_records(data: bytes) -> list[tuple[dict, bytes]]:
    """The shared ISO 28500 record walk: every record of a WARC/WET
    file as ``(warc_fields, raw_payload_bytes)`` — plain or gzip-member
    input (sniffed on the 0x1f8b magic). Loud on a bad version line, a
    missing/forged Content-Length, or truncation; the record chain must
    consume the file exactly. Payload bytes stay RAW here so binary
    bodies (the ``response``-record path) survive — text decoding is
    the caller's choice."""
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_members(data)
    records: list[tuple[dict, bytes]] = []
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
        records.append((fields, data[body_start:body_end]))
        pos = body_end + 4
    return records


def parse_warc(data: bytes) -> list[dict]:
    """Every record of a WARC/WET file as
    ``{warc_type, url, date, content_length, text}`` — plain or
    gzip-member input (sniffed on the 0x1f8b magic). Loud on a bad
    version line, a missing/forged Content-Length, or truncation; the
    record chain must consume the file exactly."""
    return [
        {
            "warc_type": fields.get("warc-type", ""),
            "url": fields.get("warc-target-uri", ""),
            "date": fields.get("warc-date", ""),
            "content_length": len(payload),
            "text": payload.decode("utf-8", errors="replace"),
        }
        for fields, payload in _walk_records(data)
    ]


_HTTP_REASONS = {
    200: "OK",
    204: "No Content",
    301: "Moved Permanently",
    302: "Found",
    304: "Not Modified",
    403: "Forbidden",
    404: "Not Found",
    500: "Internal Server Error",
    503: "Service Unavailable",
}


def build_warc(records: list[dict], gzip_members: bool = False) -> bytes:
    """Byte-exact raw-crawl WARC file of ``response`` records — the
    layout real Common Crawl WARCs carry (vs :func:`build_wet`'s
    text-extraction ``conversion`` records). Each record dict:
    ``url``, ``date``, ``payload`` (the HTTP body, bytes); optional
    ``status`` (default 200) and ``content_type`` (the HTTP body's,
    default ``application/octet-stream``). The WARC payload is a full
    HTTP/1.1 response message (status line + headers + body) and the
    record's own Content-Type is ``application/http; msgtype=response``
    per ISO 28500 §6. ``gzip_members=True`` writes the Common Crawl
    one-gzip-member-per-record layout.

    ``chunk_sizes`` (r12): the record's HTTP body is written with
    ``Transfer-Encoding: chunked`` (and NO Content-Length, per RFC
    7230 §3.3.1) — the body splits at the listed byte counts, any
    remainder becomes the final data chunk, and size lines alternate
    upper/lower hex case to exercise the parser's case-insensitive
    hex. Mutually exclusive with ``truncate_to`` (a chunked cut is a
    separate test axis; compose manually when needed)."""
    out = bytearray()
    for r in records:
        body = bytes(r["payload"])
        status = int(r.get("status", 200))
        reason = _HTTP_REASONS.get(status, "Unknown")
        ctype = r.get("content_type", "application/octet-stream")
        # truncate_to: synthesize Common Crawl's marked cut — the HTTP
        # header still declares the FULL length, the stored body is a
        # prefix, and the record says so with WARC-Truncated: length
        cut = r.get("truncate_to")
        chunk_sizes = r.get("chunk_sizes")
        if chunk_sizes is not None and cut is not None:
            raise ValueError(
                "build_warc: chunk_sizes and truncate_to are mutually "
                "exclusive on one record"
            )
        stored = body if cut is None else body[: int(cut)]
        if chunk_sizes is not None:
            enc = bytearray()
            p = 0
            for i, s in enumerate(int(x) for x in chunk_sizes):
                piece = body[p : p + s]
                if not piece:
                    break  # body exhausted; never emit an empty chunk
                fmt = "{:X}" if i % 2 == 0 else "{:x}"
                enc += fmt.format(len(piece)).encode() + b"\r\n"
                enc += piece + b"\r\n"
                p += len(piece)
            if p < len(body):
                enc += f"{len(body) - p:x}".encode() + b"\r\n"
                enc += body[p:] + b"\r\n"
            enc += b"0\r\n\r\n"
            http = (
                f"HTTP/1.1 {status} {reason}\r\n"
                f"Content-Type: {ctype}\r\n"
                "Transfer-Encoding: chunked\r\n"
                "\r\n"
            ).encode("ascii") + bytes(enc)
        else:
            http = (
                f"HTTP/1.1 {status} {reason}\r\n"
                f"Content-Type: {ctype}\r\n"
                f"Content-Length: {len(body)}\r\n"
                "\r\n"
            ).encode("ascii") + stored
        head = (
            "WARC/1.0\r\n"
            "WARC-Type: response\r\n"
            f"WARC-Target-URI: {r['url']}\r\n"
            f"WARC-Date: {r['date']}\r\n"
            + ("WARC-Truncated: length\r\n" if cut is not None else "")
            + "Content-Type: application/http; msgtype=response\r\n"
            f"Content-Length: {len(http)}\r\n"
            "\r\n"
        ).encode("utf-8")
        rec = head + http + b"\r\n\r\n"
        if gzip_members:
            co = zlib.compressobj(9, zlib.DEFLATED, 16 + zlib.MAX_WBITS)
            rec = co.compress(rec) + co.flush()
        out += rec
    return bytes(out)


def _dechunk(raw: bytes, truncated: bool = False) -> bytes:
    """Strictly decode an RFC 7230 §4.1 ``chunked`` transfer coding.

    Chunk framing is SELF-VALIDATING — every hex size must chain
    exactly to the next size line and the chain must end at the
    ``0``-chunk terminator, consuming the body precisely — which is
    why de-chunking ships where MP3 decode did not (r12, VERDICT r11
    #2): a framing slip cannot pass silently. What can't be validated
    is refused by name: chunk extensions (``;`` parameters — opaque)
    and trailers (bytes between the last-chunk line and the final
    CRLF). ``truncated=True`` (the record carries ``WARC-Truncated``)
    accepts a clean OUT-OF-BYTES cut — the decoded prefix of all
    complete chunks plus the partial tail of the cut chunk — but any
    in-band violation (bad hex, extension, wrong separator) stays loud
    even then."""
    out = bytearray()
    pos, n = 0, len(raw)
    hexdigits = b"0123456789abcdefABCDEF"
    while True:
        eol = raw.find(b"\r\n", pos, pos + 32)
        if eol < 0:
            if truncated and n - pos < 32:
                return bytes(out)  # declared cut mid size-line
            raise ValueError(
                "chunked body: chunk size line not CRLF-terminated"
            )
        line = raw[pos:eol]
        if b";" in line:
            raise ValueError(
                "chunked body: chunk extension refused (opaque "
                "';' parameters cannot be validated)"
            )
        if not line or any(c not in hexdigits for c in line):
            raise ValueError(f"chunked body: bad chunk size {line!r}")
        size = int(line, 16)
        pos = eol + 2
        if size == 0:
            # last-chunk: the terminator CRLF must follow IMMEDIATELY
            # (no trailers) and end the body exactly
            if raw[pos : pos + 2] == b"\r\n":
                if pos + 2 != n:
                    raise ValueError(
                        "chunked body: trailing bytes after the "
                        "chunked terminator"
                    )
                return bytes(out)
            if truncated and n - pos < 2:
                return bytes(out)  # cut between last-chunk and CRLF
            if n - pos >= 2:
                raise ValueError(
                    "chunked body: trailers refused (bytes between "
                    "the last-chunk line and the final CRLF)"
                )
            raise ValueError(
                "chunked body: missing final CRLF (cut the record "
                "does not declare via WARC-Truncated)"
            )
        end = pos + size
        if end + 2 > n:
            if truncated:
                out += raw[pos : min(end, n)]
                return bytes(out)
            raise ValueError(
                f"chunked body: chunk of {size} bytes overruns the "
                "body (cut the record does not declare via "
                "WARC-Truncated)"
            )
        if raw[end : end + 2] != b"\r\n":
            raise ValueError(
                "chunked body: chunk data not CRLF-terminated "
                "(size forged or corrupt)"
            )
        out += raw[pos:end]
        pos = end + 2


def split_http_response(payload: bytes, truncated: bool = False) -> dict:
    """Split a ``response`` record's HTTP message into
    ``{status, reason, headers, body}`` (headers lower-cased).

    Honors the message's own ``Content-Length`` strictly: when present
    it must equal the remaining bytes exactly — a mismatch means the
    record Content-Length and the HTTP one disagree (forged header or
    an UNMARKED cut) and fails loud. The one legitimate exception is a
    capture the archive itself declares cut: real Common Crawl truncates
    long bodies and says so with a ``WARC-Truncated`` record header —
    pass ``truncated=True`` for those records and a SHORT body (never a
    long one) is accepted as-is; the caller surfaces the flag so
    downstream decoders know the bytes are a prefix.

    ``Transfer-Encoding: chunked`` bodies are strictly DE-CHUNKED
    (r12, VERDICT r11 #2 — :func:`_dechunk`): Common Crawl stores
    decoded payloads, but users ingesting their own or older WARC
    captures hit chunked bodies, and chunk framing is self-validating
    so strict parsing keeps the anti-silent-corruption stance. Refused
    by name: any OTHER transfer coding (gzip/deflate/compress — a
    stacked coding is not self-validating here), chunked COMBINED with
    Content-Length (ambiguous framing, RFC 7230 §3.3.3 — the request-
    smuggling shape), chunk extensions, and trailers."""
    hdr_end = payload.find(b"\r\n\r\n", 0, _MAX_HEADER)
    if hdr_end < 0:
        raise ValueError("HTTP message: no header terminator")
    head = payload[:hdr_end].decode("iso-8859-1")
    lines = head.split("\r\n")
    first = lines[0].split(" ", 2)
    if len(first) < 2 or not first[0].startswith("HTTP/"):
        raise ValueError(f"HTTP message: bad status line {lines[0]!r}")
    try:
        status = int(first[1])
    except ValueError:
        raise ValueError(
            f"HTTP message: non-numeric status {first[1]!r}"
        ) from None
    headers: dict[str, str] = {}
    for line in lines[1:]:
        k, sep, v = line.partition(":")
        if not sep:
            raise ValueError(f"HTTP message: malformed header line {line!r}")
        headers[k.strip().lower()] = v.strip()
    body = payload[hdr_end + 4 :]
    declared = headers.get("content-length")
    te = headers.get("transfer-encoding")
    if te is not None:
        codings = [c.strip().lower() for c in te.split(",") if c.strip()]
        if codings != ["chunked"]:
            raise ValueError(
                f"HTTP message: Transfer-Encoding {te!r} refused (only "
                "a lone 'chunked' coding is self-validating; see "
                "split_http_response)"
            )
        if declared is not None:
            raise ValueError(
                "HTTP message: both Transfer-Encoding: chunked and "
                "Content-Length present — ambiguous framing refused "
                "(RFC 7230 §3.3.3)"
            )
        body = _dechunk(body, truncated=truncated)
    elif declared is not None:
        try:
            n = int(declared)
        except ValueError:
            raise ValueError(
                f"HTTP message: invalid Content-Length {declared!r}"
            ) from None
        if n != len(body) and not (truncated and len(body) < n):
            raise ValueError(
                f"HTTP message: Content-Length {n} != body bytes "
                f"{len(body)} (forged header, or a cut the record does "
                "not declare via WARC-Truncated)"
            )
    return {
        "status": status,
        "reason": first[2] if len(first) > 2 else "",
        "headers": headers,
        "body": body,
    }


WARC_RECORD_SCHEMA = (
    "doc_id long, rec_idx int, warc_type string, url string, date string, "
    "content_length long, text string"
)

WARC_RESPONSE_SCHEMA = (
    "doc_id long, rec_idx int, url string, date string, status int, "
    "content_type string, payload binary, n_bytes long, truncated boolean"
)


def read_warc_responses(media: DataFrame) -> DataFrame:
    """Explode raw-crawl WARC payloads into one row per HTTP
    ``response`` record: (doc_id, rec_idx, url, date, status,
    content_type, payload, n_bytes) — the input path that feeds
    ``probe_media`` and the codecs at 100 TB (one WARC file per
    ``binaryFile`` row, record explode + HTTP split inside the Arrow
    stage, no shuffle).

    Only ``WARC-Type: response`` records whose record Content-Type is
    ``application/http`` are emitted — warcinfo/request/metadata
    records that interleave with responses in real crawls are skipped,
    as is WET ``conversion`` content (that path is
    :func:`read_warc_media`). ``rec_idx`` is the record's position in
    the FILE's chain (skips leave gaps), so a row is traceable back to
    its offset ordinal. ``content_type`` is the HTTP body's, with any
    ``; charset=...`` parameters stripped; a chunked body is strictly
    DE-CHUNKED (r12 — sizes must chain exactly to the terminator), and
    a malformed HTTP message or broken chunk framing fails the file
    loudly (:func:`split_http_response`).
    ``truncated`` mirrors the record's ``WARC-Truncated`` header
    (Common Crawl's routine long-body cut): the payload is a declared
    PREFIX — downstream decoders filter or triage on the flag instead
    of discovering corrupt tails the hard way; an UNDECLARED short body
    still fails loud.

    Scale note: each consumer of the returned frame re-walks the
    archives (Spark recomputes lazy lineage). A pipeline that routes
    the records to SEVERAL downstream stages (probe + decode + text,
    as the gate does) should materialize the explode once — write the
    records to parquet (the natural shape: payload-bearing rows,
    partitioned by crawl segment) or ``persist()`` them — so the
    gunzip + record walk is paid once per crawl file, not once per
    consumer."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                k: []
                for k in (
                    "doc_id", "rec_idx", "url", "date", "status",
                    "content_type", "payload", "n_bytes", "truncated",
                )
            }
            for doc_id, blob in zip(pdf["doc_id"], pdf["media"]):
                for i, (fields, payload) in enumerate(
                    _walk_records(bytes(blob or b""))
                ):
                    if fields.get("warc-type") != "response":
                        continue
                    if not fields.get("content-type", "").startswith(
                        "application/http"
                    ):
                        continue
                    cut = "warc-truncated" in fields
                    http = split_http_response(payload, truncated=cut)
                    ctype = http["headers"].get("content-type", "")
                    out["doc_id"].append(int(doc_id))
                    out["rec_idx"].append(i)
                    out["url"].append(fields.get("warc-target-uri", ""))
                    out["date"].append(fields.get("warc-date", ""))
                    out["status"].append(http["status"])
                    out["content_type"].append(
                        ctype.split(";")[0].strip().lower()
                    )
                    out["payload"].append(http["body"])
                    out["n_bytes"].append(len(http["body"]))
                    out["truncated"].append(cut)
            yield pd.DataFrame(out)

    return media.mapInPandas(op, schema=WARC_RESPONSE_SCHEMA)


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
