"""Sharded training-data export with a verifiable manifest.

The hand-off point of the pipeline: curated/packed documents leave the
warehouse as N deterministic shards (the layout trainers stream), plus a
``_MANIFEST.json`` a downstream loader can trust — per-shard row counts
and an order-insensitive content checksum, both recomputed from the
WRITTEN files (not the input frame), so the manifest certifies what
actually landed on disk.

Determinism/portability: shard assignment and the row hash are md5-based
(same construction as functions/sketches.py), so a plain-SQL twin
recomputes the manifest from the source table and any mismatch —
dropped rows, duplicated partitions, column corruption — is a value
diff.

Scale shape: one shuffle (repartition on the uniform md5 shard key — no
skew by construction), expression-only row hashes, a groupBy over
n_shards keys, and one O(n_shards) driver collect for the JSON sidecar
(the same sanctioned boundary as the IVF probe sidecar).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ecollector_spark.datapipe.packing import _md5_key60


def _row_hash(cols: list[str]):
    """60-bit md5 of the chr(31)-joined row values — engine-portable
    (DuckDB twin: ('0x' || substr(md5(...), 1, 15))::BIGINT, with the
    same coalesce). NULLs coalesce to a chr(0) sentinel BEFORE joining:
    concat_ws would silently skip them, making (x, NULL, y) collide with
    (x, y, NULL) and hiding column-shift corruption from the checksum;
    plain concat would null the whole hash and bit_xor would then skip
    the row entirely. Twin: coalesce(CAST(c AS VARCHAR), chr(0))."""
    joined = F.concat_ws(
        "\x1f", *[F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in cols]
    )
    return F.conv(F.substring(F.md5(joined), 1, 15), 16, 10).cast("long")


def shard_manifest(df: DataFrame, cols: list[str], shard_col: str = "shard") -> DataFrame:
    """(shard, n_rows, checksum) — checksum is the bit-XOR of per-row
    hashes: order-insensitive, so it's stable across file order, task
    order and engine."""
    h = _row_hash(cols).alias("_h")
    return (
        df.select(F.col(shard_col), h)
        .groupBy(shard_col)
        .agg(
            F.count("*").alias("n_rows"),
            F.expr("bit_xor(_h)").alias("checksum"),
        )
        .orderBy(shard_col)
    )


def export_shards(
    docs: DataFrame,
    path: str,
    n_shards: int,
    id_col: str = "doc_id",
    checksum_cols: list[str] | None = None,
) -> DataFrame:
    """Write ``docs`` as ``path/shard=K/`` parquet, K = md5(id) mod
    ``n_shards`` (uniform, deterministic — re-exports and the SQL twin
    agree), then read the shards back, recompute the manifest from the
    written bytes, save it as ``path/_MANIFEST.json`` and return it as a
    DataFrame ``(shard, n_rows, checksum)``.

    ``checksum_cols`` fixes the hashed column set (default: every input
    column in frame order) — pass it explicitly when readers must
    validate a projection.
    """
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive: {n_shards}")
    cols = checksum_cols or list(docs.columns)
    shard = F.pmod(_md5_key60(F.col(id_col), "shard|"), n_shards).cast("int")
    staged = docs.withColumn("shard", shard).repartition(n_shards, "shard")
    staged.write.mode("overwrite").partitionBy("shard").parquet(path)

    written = docs.sparkSession.read.parquet(path)
    manifest = shard_manifest(written, cols)
    rows = manifest.collect()  # O(n_shards) — sidecar boundary
    with open(os.path.join(path, "_MANIFEST.json"), "w") as f:
        json.dump(
            {
                "n_shards": n_shards,
                "checksum_cols": cols,
                "shards": [
                    {"shard": r["shard"], "n_rows": r["n_rows"], "checksum": r["checksum"]}
                    for r in rows
                ],
            },
            f,
            indent=1,
        )
    return manifest


def validate_shards(spark, path: str) -> bool:
    """Re-read an exported directory and check it against its own
    ``_MANIFEST.json``: shard set, per-shard counts and checksums all
    match. The loader-side trust check."""
    with open(os.path.join(path, "_MANIFEST.json")) as f:
        m = json.load(f)
    written = spark.read.parquet(path)
    got = {
        r["shard"]: (r["n_rows"], r["checksum"])
        for r in shard_manifest(written, m["checksum_cols"]).collect()
    }
    want = {s["shard"]: (s["n_rows"], s["checksum"]) for s in m["shards"]}
    return got == want
