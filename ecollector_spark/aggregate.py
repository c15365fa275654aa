"""Aggregation operators (reference A1-A11,
src/integration/tsdb/processing/agreggator.go).

The reference pre-aggregates high-frequency series in in-memory buffers
flushed every 30 s, applying a *per-series* aggregation directive (mean /
min / max / sum / last / counter-difference). Batch equivalents here are
pure DataFrame expressions; the streaming twins live in
``ecollector_spark.streaming`` (applyInPandasWithState).

Scale notes: every groupBy keys on (series_id, bucket) so partial
aggregation happens map-side; the counter difference is a window over
(series_id) ordered by ts — one shuffle by series_id, which is also the
natural partitioning of the stored table, so at 100 TB the sort is local
per partition after a single exchange (or free if the table is bucketed
by series_id).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ecollector_spark.functions.timeutil import time_bucket


def calculate_difference(values: list[float]) -> float:
    """Pure twin of the reference's calculateDifference
    (agreggator.go:285-305), pinned by its golden tests
    (agreggator_test.go:65-97): sum of consecutive positive deltas; a
    negative delta is a meter reset and contributes nothing; fewer than
    two samples -> 0. Reused by the streaming state function."""
    if len(values) <= 1:
        return 0.0
    result = 0.0
    for prev, nxt in zip(values, values[1:]):
        if nxt >= prev:
            result += nxt - prev
    return result


def filter_series_noise(values: list[float], fence: float = 3.0) -> list[float]:
    """Pure twin of filterSeries (agreggator.go:317-340): drop zeros and
    Tukey *extreme* outliers (quartile fence). Quartiles via exact linear
    interpolation; with fewer than 4 samples no outlier test is applied
    (matching stats.QuartileOutliers, which errors on short input —
    the reference then treats outliers as empty)."""
    if len(values) >= 4:
        s = sorted(values)

        def q(p: float) -> float:
            idx = (len(s) - 1) * p
            lo, hi = int(idx), min(int(idx) + 1, len(s) - 1)
            return s[lo] + (s[hi] - s[lo]) * (idx - lo)

        q1, q3 = q(0.25), q(0.75)
        iqr = q3 - q1
        lo_f, hi_f = q1 - fence * iqr, q3 + fence * iqr
    else:
        lo_f, hi_f = float("-inf"), float("inf")
    return [v for v in values if v != 0 and lo_f <= v <= hi_f]


def ensure_shuffle_width(
    df: DataFrame,
    advisory_bytes: int = 64 << 20,
    ceiling: int = 1 << 17,
) -> int | None:
    """Partitions-from-input-size (r12, VERDICT r11 #4): make sure the
    session's AQE wide start covers this operator's input.

    The engine default (session.py, r7) starts every batch shuffle at
    ``initialPartitionNum = max(8 x cores, 512)`` and lets AQE coalesce
    DOWN to the measured bytes — the same-session A/B showed that
    beats any hand-set count at the 1000x rung. But AQE can only merge
    partitions, never split them (outside skew-join), so the FIXED 512
    becomes its own wall once one shuffle's input exceeds
    512 x 64 MB ~ 32 GB: partitions grow past the advisory target with
    no runtime remedy. This helper closes that: estimate the input
    from Catalyst's optimized-plan stats (parquet file bytes — free,
    no job) and RAISE the session's ``initialPartitionNum`` to
    bytes / ``advisory_bytes`` (clamped to ``ceiling``) when the
    estimate needs more than the current setting. Raising (never
    lowering) preserves the groupBy's map-side combine and the
    one-exchange plan — AQE still coalesces small shuffles back down,
    so the raise is safe for every other query on the session; the
    conf change is session-visible, which is exactly the point (the
    next equally-large shuffle needs it too).

    Returns the new width when raised, else None (the common case —
    estimate unknown, AQE disabled, or the wide start already covers
    it)."""
    spark = df.sparkSession
    try:
        size = int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
    except Exception:  # pragma: no cover - py4j estimation failure
        return None
    if size <= 0 or size >= 1 << 60:  # unknown/absurd: trust AQE
        return None
    if spark.conf.get("spark.sql.adaptive.enabled", "true") != "true":
        return None
    key = "spark.sql.adaptive.coalescePartitions.initialPartitionNum"
    try:
        current = int(
            spark.conf.get(key, None)
            or spark.conf.get("spark.sql.shuffle.partitions")
        )
    except (TypeError, ValueError):  # pragma: no cover
        return None
    needed = min(-(-size // advisory_bytes), ceiling)
    if needed <= current:
        return None
    spark.conf.set(key, str(needed))
    return needed


def windowed_preaggregate(
    dp: DataFrame,
    interval_seconds: int = 30,
    value_col: str = "value_f",
    keep_cols: Sequence[str] = (),
    advisory_bytes: int = 64 << 20,
) -> DataFrame:
    """A1-A4 + A11 routing: per (series_id, tumbling bucket), apply the
    series' aggregation directive from the ``agg_func`` column
    (agreggator.go:158-214; directive enum agreggator.go:13-19).

    ``difference`` series are excluded — they follow the sampled path
    (:func:`counter_difference`), as in the reference where the diff
    calculation runs on its own cadence (agreggator.go:82-91).

    Shuffle sizing (r12): the per-(series, bucket) groupBy is this
    operator's only exchange, and its input is the raw sample stream —
    the table that actually hits 100 TB. :func:`ensure_shuffle_width`
    raises the session's AQE wide start when the input estimate
    outgrows it (bytes / 64 MB), so the exchange width follows the
    data instead of hitting the fixed 512-partition ceiling; at the
    measured rungs (<= ~2 GB input) it is a no-op and the r7-settled
    engine default carries the plan.

    Output: series_id, keep_cols..., time (bucket start, epoch s), value.
    """
    ensure_shuffle_width(dp, advisory_bytes=advisory_bytes)
    bucket = time_bucket("ts", interval_seconds).alias("time")
    g = (
        dp.where(F.col("agg_func") != "difference")
        .groupBy("series_id", F.col("agg_func"), bucket, *keep_cols)
        .agg(
            F.avg(value_col).alias("_mean"),
            F.min(value_col).alias("_min"),
            F.max(value_col).alias("_max"),
            F.sum(value_col).alias("_sum"),
            F.max_by(value_col, "ts").alias("_last"),
        )
    )
    value = (
        F.when(F.col("agg_func") == "mean", F.col("_mean"))
        .when(F.col("agg_func") == "min", F.col("_min"))
        .when(F.col("agg_func") == "max", F.col("_max"))
        .when(F.col("agg_func") == "sum", F.col("_sum"))
        .when(F.col("agg_func") == "last", F.col("_last"))
    )
    return g.select("series_id", *keep_cols, "time", value.alias("value"))


def counter_difference(
    dp: DataFrame,
    sample_interval_seconds: int = 600,
    value_col: str = "value_f",
    max_diff: float = 100.0,
) -> DataFrame:
    """A6 batch form: positive-delta sum of a monotonically-growing counter
    per (series_id, sampling bucket) (agreggator.go:285-305).

    Semantics ported from calculateDifference: consecutive deltas, only
    ``next >= prev`` contributes (a negative delta is a meter reset and is
    skipped); the last sample of a bucket seeds the next bucket (the lag
    window spans the whole series, and each delta lands in the bucket of
    its *later* sample — equivalent to the reference's seed carry-over at
    agreggator.go:258). Results above ``max_diff`` (100 kWh) are dropped
    (agreggator.go:261-264), as are 0 results (agreggator.go:266-275).
    """
    w = Window.partitionBy("series_id").orderBy("ts")
    delta = F.col(value_col) - F.lag(value_col).over(w)
    per_point = dp.select(
        "series_id",
        time_bucket("ts", sample_interval_seconds).alias("time"),
        delta.alias("_delta"),
    ).where(F.col("_delta").isNotNull())
    out = (
        per_point.groupBy("series_id", "time")
        .agg(F.sum(F.when(F.col("_delta") >= 0, F.col("_delta")).otherwise(0.0)).alias("value"))
        .where((F.col("value") > 0) & (F.col("value") <= max_diff))
    )
    return out


def tukey_outliers(
    dp: DataFrame,
    group_cols: Sequence[str] = ("series_id",),
    value_col: str = "value_f",
    fence: float = 3.0,
) -> DataFrame:
    """A7: flag extreme outliers per group with a Tukey quartile fence
    (agreggator.go:311-340, stats.QuartileOutliers; fence=3.0 is the
    'extreme' multiplier). Zeros are noise too (agreggator.go:327-334).

    Returns the input rows annotated with ``is_outlier`` (zero or outside
    [Q1 - fence*IQR, Q3 + fence*IQR]). Quartiles use exact linear
    interpolation (SQL ``percentile``), computed per group and broadcast
    back — the quartile table is tiny (one row per series).
    """
    q = dp.groupBy(*group_cols).agg(
        F.expr(f"percentile({value_col}, 0.25)").alias("_q1"),
        F.expr(f"percentile({value_col}, 0.75)").alias("_q3"),
    )
    iqr = F.col("_q3") - F.col("_q1")
    joined = dp.join(F.broadcast(q), on=list(group_cols), how="left")
    is_out = (
        (F.col(value_col) == 0)
        | (F.col(value_col) < F.col("_q1") - fence * iqr)
        | (F.col(value_col) > F.col("_q3") + fence * iqr)
    )
    return joined.withColumn("is_outlier", is_out).drop("_q1", "_q3")


def hour_reattribution(ts_col: F.Column) -> F.Column:
    """A9: HAN main meters report at the top of the hour; the sample
    belongs to the *previous* hour, stamped :59:00 (agreggator.go:307-310:
    subtract 1h, set minute=59, second=0)."""
    shifted = ts_col - F.expr("INTERVAL 1 HOUR")
    return F.date_trunc("hour", shifted) + F.expr("INTERVAL 59 MINUTES")
