"""Similarity search over embedding columns (array<float>).

- brute-force cosine: exact baseline — one scan, dot product as a
  sequential fold (bit-identical to the DuckDB oracle's list_reduce),
  no shuffle until the final top-k (which AQE keeps tiny).
- LSH-bucketed: sign-bit bucketing (axis hyperplanes) — the scale path:
  the query probes one bucket, cutting the scan by ~2^bits; recall is
  traded explicitly. At 100 TB the bucket id becomes a partition column
  so probing is partition pruning.

Everything is expression-only; a Pandas-UDF variant would move Arrow
batches for no gain since the fold is already JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product (deterministic order)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def _as_double(c: Column) -> Column:
    return c.cast("array<double>")


def cosine_scores(emb: DataFrame, query_vec: Column, vec_col: str = "embedding") -> DataFrame:
    v = _as_double(F.col(vec_col))
    q = _as_double(query_vec)
    cos = _dot(v, q) / (F.sqrt(_dot(v, v)) * F.sqrt(_dot(q, q)))
    return emb.withColumn("cosine", cos)


def brute_force_topk(
    emb: DataFrame, query_id: int, k: int = 10, vec_col: str = "embedding"
) -> DataFrame:
    """Exact top-k by cosine against the embedding of ``query_id``.
    Output (vec_id, cosine) ordered desc, ties by vec_id."""
    q = emb.where(F.col("vec_id") == query_id).select(F.col(vec_col).alias("_q"))
    scored = cosine_scores(emb.crossJoin(F.broadcast(q)), F.col("_q"), vec_col)
    return (
        scored.where(F.col("vec_id") != query_id)
        .select("vec_id", F.round("cosine", 6).alias("cosine"))
        .orderBy(F.desc("cosine"), "vec_id")
        .limit(k)
    )


def cosine_threshold(
    emb: DataFrame, query_id: int, threshold: float, vec_col: str = "embedding"
) -> DataFrame:
    """All vectors with round(cosine,6) >= threshold vs the query vector —
    the deterministic (orderless) form of similarity search."""
    q = emb.where(F.col("vec_id") == query_id).select(F.col(vec_col).alias("_q"))
    scored = cosine_scores(emb.crossJoin(F.broadcast(q)), F.col("_q"), vec_col)
    return (
        scored.where(F.col("vec_id") != query_id)
        .select("vec_id", F.round("cosine", 6).alias("cosine"))
        .where(F.col("cosine") >= threshold)
    )


def sign_bucket(vec: Column, bits: int = 4) -> Column:
    """LSH bucket id from the sign of the first ``bits`` dimensions
    (axis-aligned random-hyperplane LSH for cosine)."""
    b = F.lit(0)
    for i in range(bits):
        b = b + F.when(F.element_at(vec, i + 1) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
    return b.cast("int")


def lsh_bucketed_search(
    emb: DataFrame,
    query_id: int,
    threshold: float,
    vec_col: str = "embedding",
    bits: int = 4,
) -> DataFrame:
    """Approximate search: score only vectors in the query's sign bucket.
    Same output shape as cosine_threshold; recall < 1 by design."""
    with_bucket = emb.withColumn("_bucket", sign_bucket(F.col(vec_col), bits))
    q = with_bucket.where(F.col("vec_id") == query_id).select(
        F.col(vec_col).alias("_q"), F.col("_bucket").alias("_qb")
    )
    scored = cosine_scores(
        with_bucket.join(F.broadcast(q), F.col("_bucket") == F.col("_qb")), F.col("_q"), vec_col
    )
    return (
        scored.where(F.col("vec_id") != query_id)
        .select("vec_id", F.round("cosine", 6).alias("cosine"))
        .where(F.col("cosine") >= threshold)
    )
