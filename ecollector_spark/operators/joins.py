"""Time-series join operators (beyond the reference, SURVEY §2.5 notes
their absence; a time-series engine at scale needs both).

- **as-of join**: for each left row, the latest right row with
  ``right.ts <= left.ts`` per key. Implemented as union + running
  last-non-null window: ONE shuffle on (key), no pairwise comparison,
  state bounded by a single row per key — the scalable formulation
  (a naive ts-inequality join is a broadcast-nested-loop at best).
- **interval join**: left rows matched to every right interval
  containing them. Implemented by exploding intervals into fixed-width
  time buckets and equi-joining on (key, bucket) before the exact
  containment filter — turns an inequality join into a hash join whose
  fan-out is interval_length/bucket_width per row.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_values: Sequence[str] = (),
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """Left as-of join: every left row, plus the right payload of the most
    recent right row at-or-before it (per ``by`` key); nulls when no such
    row (or it's older than ``tolerance_seconds``).

    Equal timestamps match (right row sorts before the left probe at the
    same instant), mirroring DuckDB/pandas ``merge_asof`` semantics.
    """
    lt = left.select(
        *by,
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_src"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
        F.lit(None).cast(
            "struct<" + ",".join(f"{c}:{right.schema[c].dataType.simpleString()}" for c in right_values) + ">"
        ).alias("_r"),
    )
    rt = right.select(
        *by,
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_src"),
        F.lit(None).cast(lt.schema["_l"].dataType.simpleString()).alias("_l"),
        F.struct(*[F.col(c) for c in right_values]).alias("_r"),
    )
    u = lt.unionByName(rt)
    w = (
        Window.partitionBy(*by)
        .orderBy("_t", "_src")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = F.last("_r", ignorenulls=True).over(w)
    rts = F.last(F.when(F.col("_r").isNotNull(), F.col("_t")), ignorenulls=True).over(w)
    out = u.select("_l", matched.alias("_m"), rts.alias("_mt"), F.col("_t")).where(
        F.col("_l").isNotNull()
    )
    if tolerance_seconds is not None:
        out = out.withColumn(
            "_m",
            F.when(
                F.col("_t").cast("double") - F.col("_mt").cast("double")
                <= F.lit(float(tolerance_seconds)),
                F.col("_m"),
            ),
        )
    return out.select(
        *[F.col(f"_l.{c}").alias(c) for c in left.columns],
        *[F.col(f"_m.{c}").alias(f"{c}_asof") for c in right_values],
    )


def interval_join(
    left: DataFrame,
    intervals: DataFrame,
    by: Sequence[str],
    ts_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    bucket_seconds: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """All (left row, interval) pairs with ``start <= ts < end`` per key.

    Both sides gain a time-bucket column; intervals explode into every
    bucket they touch, the join is a plain equi hash join on
    (by..., bucket), and the exact half-open containment filters after.
    """
    lb = left.withColumn(
        "_b", F.floor(F.unix_timestamp(F.col(ts_col)) / bucket_seconds).cast("long")
    )
    iv = intervals.withColumn(
        "_b",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(start_col)) / bucket_seconds).cast("long"),
                F.floor(
                    (F.unix_timestamp(F.col(end_col)) - F.lit(1)) / bucket_seconds
                ).cast("long"),
            )
        ),
    )
    joined = lb.join(iv, on=[*by, "_b"], how=how)
    cond = (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col))
    return joined.where(cond).drop("_b")
