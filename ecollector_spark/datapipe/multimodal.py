"""Multimodal column handling: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
metadata struct; decode / feature-extraction / resize / frame-sampling
run as Arrow-batched ``mapInPandas`` stages so the heavy per-item work
stays columnar and parallel (never a row-at-a-time Python UDF).

The actual codec calls are STUBBED (image/audio libraries are not in
this environment): `decode_stub=True` produces a deterministic fake
feature vector from the bytes; `decode_stub=False` raises
NotImplementedError where Pillow/ffmpeg would be invoked. Everything
around the stub — schema, batch iteration, partitioning, output shape —
is real and tested.

Scale notes: binary payloads dominate row size, so the partition-size
knob is `spark.sql.files.maxPartitionBytes`, not row count; feature
extraction is embarrassingly parallel (no shuffle); downstream joins on
the metadata struct should project the binary column away FIRST (column
pruning keeps the blobs out of the shuffle).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id long, media binary, media_type string, width int, height int, n_bytes long"
)

# float64 features: the stub histogram is count/total — exact small-int
# quotients that any engine reproduces bit-for-bit in double, which keeps
# the Arrow path value-hash checkable (float32 would round differently)
FEATURE_SCHEMA = "doc_id long, media_type string, n_bytes long, feature array<double>"


def attach_fake_media(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Wrap a text corpus as a media table (deterministic fake payloads):
    the binary column is the utf-8 text, the metadata is derived from it.
    Stands in for `spark.read.format("binaryFile")` in production."""
    blob = F.encode(F.col(text_col), "UTF-8")
    return docs.select(
        "doc_id",
        blob.alias("media"),
        F.when(F.col("doc_id") % 3 == 0, "image/png")
        .when(F.col("doc_id") % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
        .alias("media_type"),
        (F.col("doc_id") % 640 + 1).cast("int").alias("width"),
        (F.col("doc_id") % 480 + 1).cast("int").alias("height"),
        F.octet_length(blob).cast("long").alias("n_bytes"),
    )


def extract_features(media: DataFrame, decode_stub: bool = True, dim: int = 8) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    With the stub, the "feature" is a deterministic byte-histogram
    projection (so tests can golden-check); the real path would decode
    and run a model here.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real media decode requires Pillow/ffmpeg (not available); "
                    "use decode_stub=True"
                )
            feats = []
            for blob in pdf["media"]:
                buf = bytes(blob or b"")
                hist = [0.0] * dim
                for i, byte in enumerate(buf):
                    hist[byte % dim] += 1.0
                total = sum(hist) or 1.0
                feats.append([h / total for h in hist])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["n_bytes"],
                    "feature": feats,
                }
            )

    return media.mapInPandas(op, schema=FEATURE_SCHEMA)


def resize_media(
    media: DataFrame, max_w: int = 224, max_h: int = 224, decode_stub: bool = True
) -> DataFrame:
    """Arrow-batched resize stage: scales (width, height) to fit within
    (max_w, max_h) preserving aspect ratio, never upscaling. With the
    stub the pixel work is a byte passthrough (real path would call
    Pillow's ``Image.resize`` and raises NotImplementedError here); the
    metadata math is the real contract and is exact double arithmetic,
    so a SQL oracle can verify the mapInPandas stage end to end."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math

        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real media resize requires Pillow (not available); "
                    "use decode_stub=True"
                )
            scales = [
                min(max_w / w, max_h / h, 1.0)
                for w, h in zip(pdf["width"], pdf["height"])
            ]
            pdf = pdf.assign(
                width=[max(1, math.floor(w * s)) for w, s in zip(pdf["width"], scales)],
                height=[max(1, math.floor(h * s)) for h, s in zip(pdf["height"], scales)],
            )
            yield pdf

    return media.mapInPandas(op, schema=MEDIA_SCHEMA)


def sample_frames(media: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """'Frame sampling' on the stub payload: one row per every_n_bytes
    offset (stands in for video frame extraction; shows the 1->N
    explode shape without decoding)."""
    n = (F.col("n_bytes") / every_n_bytes).cast("int") + 1
    return media.select(
        "doc_id",
        "media_type",
        F.explode(F.sequence(F.lit(0), n - 1)).alias("frame_idx"),
    ).withColumn("byte_offset", F.col("frame_idx") * every_n_bytes)
