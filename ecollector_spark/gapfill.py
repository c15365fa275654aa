"""FILL(...) semantics for time-bucketed results (reference A16).

InfluxDB materializes empty time buckets according to FILL(null|previous|
0|none|linear) (query built at influxdb_v1.go:161-183; default null at
influxdb_v1.go:112-114, README.md:43 documents `previous`). Spark's groupBy
only yields buckets that exist, so we synthesize the bucket spine:

    sequence(from, to, step)  ->  explode  ->  cross join distinct groups
    ->  left join aggregated result  ->  fill policy

Scale notes: the spine is |buckets| x |groups| rows generated *without*
reading the fact table; the join key (bucket, group) matches the
aggregation's own grouping so AQE plans a cheap join (the aggregated side
is already small — it's post-aggregation). `previous` fill uses
last(ignorenulls) over a per-group window: one extra shuffle by group,
bounded by the result size, never the raw data size.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

FILL_NULL = "null"
FILL_PREVIOUS = "previous"
FILL_ZERO = "0"
FILL_NONE = "none"
FILL_LINEAR = "linear"


def bucket_spine(
    df_any: DataFrame,
    from_epoch: int,
    to_epoch: int,
    step_seconds: int,
    group_cols: Sequence[str] = (),
    groups_df: DataFrame | None = None,
    time_col: str = "time",
) -> DataFrame:
    """All (bucket, group...) combinations in [from_epoch, to_epoch).

    ``groups_df`` defaults to the distinct group values present in
    ``df_any`` (InfluxDB's behavior: series that exist in the range).
    """
    spark = df_any.sparkSession
    n_from = int(from_epoch // step_seconds * step_seconds)
    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit(n_from).cast("long"),
                F.lit(int(to_epoch)).cast("long"),
                F.lit(int(step_seconds)).cast("long"),
            )
        ).alias(time_col)
    )
    if group_cols:
        if groups_df is None:
            groups_df = df_any.select(*group_cols).distinct()
        spine = spine.crossJoin(F.broadcast(groups_df))
    return spine


def gap_fill(
    agg_df: DataFrame,
    fill_type: str,
    from_epoch: int,
    to_epoch: int,
    step_seconds: int,
    group_cols: Sequence[str] = (),
    time_col: str = "time",
    value_col: str = "value",
) -> DataFrame:
    """Left-join ``agg_df`` onto the full spine and apply the fill policy."""
    if fill_type in (FILL_NONE, "", None) or step_seconds <= 0:
        return agg_df
    spine = bucket_spine(agg_df, from_epoch, to_epoch, step_seconds, group_cols, time_col=time_col)
    joined = spine.join(agg_df, on=[time_col, *group_cols], how="left")

    if fill_type == FILL_NULL:
        return joined
    if fill_type == FILL_ZERO:
        return joined.withColumn(value_col, F.coalesce(F.col(value_col), F.lit(0.0)))
    if fill_type == FILL_PREVIOUS:
        w = (
            Window.partitionBy(*group_cols)
            .orderBy(time_col)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        return joined.withColumn(value_col, F.last(value_col, ignorenulls=True).over(w))
    if fill_type == FILL_LINEAR:
        wp = Window.partitionBy(*group_cols).orderBy(time_col)
        wprev = wp.rowsBetween(Window.unboundedPreceding, 0)
        wnext = wp.rowsBetween(0, Window.unboundedFollowing)
        prev_v = F.last(value_col, ignorenulls=True).over(wprev)
        next_v = F.first(value_col, ignorenulls=True).over(wnext)
        prev_t = F.last(
            F.when(F.col(value_col).isNotNull(), F.col(time_col)), ignorenulls=True
        ).over(wprev)
        next_t = F.first(
            F.when(F.col(value_col).isNotNull(), F.col(time_col)), ignorenulls=True
        ).over(wnext)
        interp = prev_v + (next_v - prev_v) * (F.col(time_col) - prev_t) / (next_t - prev_t)
        return joined.withColumn(
            value_col,
            F.when(F.col(value_col).isNotNull(), F.col(value_col)).otherwise(
                F.when(prev_t == next_t, prev_v).otherwise(interp)
            ),
        )
    raise ValueError(f"unknown fill type: {fill_type!r}")
