"""Distributed cardinality sketches.

KMV (k-minimum-values) distinct-count estimation: hash every value to
(0,1), keep the k smallest distinct hashes per group; with u_k the k-th
smallest, the estimator is (k-1)/u_k (Bar-Yossef et al. 2002). KMV is
the sketch shape that matters at 100 TB: per-partition partial state is
just k doubles, partials merge by min-k union (associative), and the
final estimate is O(1) per group.

Unlike HLL (whose register layout is implementation-specific, so
Spark's `approx_count_distinct` can never hash-match another engine),
KMV built on md5 is *deterministic and engine-independent*: the DuckDB
oracle computes the identical estimate, so the sketch sits in the
value-hash correctness gate like any exact operator.

Numerics: the normalized hash is (first 15 hex chars of md5 as int) /
2^60. 15 hex chars = 60 bits fit in int64 exactly; the int -> double
conversion rounds to nearest in both engines; dividing by a power of
two is exact. So u_k — and the estimate — are bit-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SCALE = float(1 << 60)


def hash_unit(col) -> "F.Column":
    """Deterministic uniform hash of a value into [0, 1): first 60 bits
    of md5 scaled by 2^-60. Engine-portable (see module docstring), so
    it doubles as a *reproducible sampling* predicate: `hash_unit(key) <
    p` picks the same p-fraction of keys on any engine, any cluster, any
    partitioning — the sound way to sample at 100 TB (rand() is neither
    repeatable nor consistent across retries)."""
    return (
        F.conv(F.substring(F.md5(F.col(col).cast("string") if isinstance(col, str) else col.cast("string")), 1, 15), 16, 10)
        .cast("double")
        / F.lit(_SCALE)
    )


def kmv_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """Per-group distinct-count estimate via a k-minimum-values sketch.

    Returns (group_cols..., n_kept, est_distinct): when a group has
    fewer than k distinct values the sketch is exact (est = n_kept);
    otherwise est = (k-1)/u_k rounded to 6 decimals.

    Plan shape: one shuffle on (group, hash) to dedup hashes, one
    shuffle on group for the windowed min-k — at scale the second is a
    partial top-k (only k rows per group survive each partition).
    """
    hashed = df.select(*group_cols, hash_unit(value_col).alias("_u")).distinct()
    w = Window.partitionBy(*group_cols).orderBy("_u")
    mink = hashed.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") <= k)
    return (
        mink.groupBy(*group_cols)
        .agg(F.max("_rn").alias("n_kept"), F.max("_u").alias("_uk"))
        .select(
            *group_cols,
            "n_kept",
            # floor-truncate instead of round: floor is a deterministic
            # function of the double, round's half-tie rule is not
            # engine-portable
            (
                F.floor(
                    F.when(F.col("n_kept") < k, F.col("n_kept").cast("double")).otherwise(
                        F.lit(float(k - 1)) / F.col("_uk")
                    )
                    * 1000000.0
                )
                / 1000000.0
            ).alias("est_distinct"),
        )
    )


def stratified_sample(
    df: DataFrame,
    strata_cols: list[str],
    n_per_stratum: int,
    key_col: str,
    seed: str = "",
) -> DataFrame:
    """Deterministic stratified sample: the ``n_per_stratum`` rows with
    the smallest ``hash_unit(seed || key)`` per stratum — the balanced
    training-mix builder (equal docs per language, per source, per
    bucket) that stays reproducible across engines, retries and
    repartitions, unlike rand()-based sampleBy.

    Ties (duplicate keys inside a stratum) break by the key itself, so
    the output is a pure function of the data.

    Plan shape: one shuffle on the strata columns for the rank window;
    at scale the window is a partial top-k (each map task only needs the
    n smallest hashes of its partition), so the exchange carries
    ~n_per_stratum rows per (stratum, partition), not the corpus. A
    different ``seed`` draws an independent sample."""
    key = F.concat(F.lit(seed), F.col(key_col).cast("string"))
    u = hash_unit(key).alias("_u")
    w = Window.partitionBy(*strata_cols).orderBy("_u", key_col)
    return (
        df.select(*df.columns, u)
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= n_per_stratum)
        .drop("_u", "_rn")
    )
