"""Time helpers shared by the query planner, downsampler and gap-fill.

Duration strings follow the reference's relative-time format ``Xm/Xh/Xd/Xw``
(reference src/integration/tsdb/storage/mapping.go:106-122: substring
dispatch, h before d before m before w — "1m" is minutes, but "1mo" would
hit the 'h'-less 'm' branch too; we keep the same precedence).

Time buckets are computed arithmetically — ``floor(epoch/step)*step`` —
instead of ``F.window``: identical semantics for tumbling windows, a plain
deterministic expression any SQL engine reproduces bit-for-bit (the DuckDB
oracle uses the same formula), and Catalyst folds it into whole-stage
codegen with no window-struct allocation.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_UNIT_SECONDS = {"m": 60, "h": 3600, "d": 86400, "w": 7 * 86400}


def parse_relative_duration(rtime: str) -> int:
    """``"10m" -> 600`` seconds. Mirrors mapping.go:106-122 precedence:
    h, then d, then m, then w; unknown/empty -> 0."""
    if not rtime:
        return 0
    for unit in ("h", "d", "m", "w"):  # reference checks h,d,m,w in order
        if unit in rtime:
            num = rtime.replace(unit, "")
            try:
                return int(num) * _UNIT_SECONDS[unit]
            except ValueError:
                return 0
    return 0


def duration_seconds(rtime: str) -> int:
    return parse_relative_duration(rtime)


def epoch_seconds(col) -> Column:
    """Timestamp -> epoch seconds (bigint). The reference's query API emits
    epoch seconds (influxdb_v1.go:191 precision "s")."""
    return F.unix_timestamp(F.col(col) if isinstance(col, str) else col)


def time_bucket(col, step_seconds: int, offset_seconds: int = 0) -> Column:
    """Tumbling-bucket start in epoch seconds (bigint).

    floor(epoch/step)*step — epoch-aligned like InfluxDB's GROUP BY time()
    for the m/h units the reference allows. A non-zero ``offset_seconds``
    shifts every boundary (InfluxQL ``GROUP BY time(interval, offset)``,
    the day-boundary alignment knob): floor((epoch-off)/step)*step + off.
    """
    c = F.col(col) if isinstance(col, str) else col
    e = F.unix_timestamp(c)
    if offset_seconds:
        return (
            F.floor((e - F.lit(offset_seconds)) / F.lit(step_seconds)) * step_seconds
            + offset_seconds
        ).cast("long")
    return (F.floor(e / F.lit(step_seconds)) * step_seconds).cast("long")


def time_bucket_sql(col_sql: str, step_seconds: int, offset_seconds: int = 0) -> str:
    """The DuckDB-side twin of :func:`time_bucket` (same arithmetic)."""
    if offset_seconds:
        # parenthesized: a negative offset must not render `--N`, which
        # SQL parses as a line comment
        return (
            f"CAST(floor((epoch({col_sql})-({offset_seconds}))/{step_seconds}) AS BIGINT)"
            f"*{step_seconds}+({offset_seconds})"
        )
    return f"CAST(floor(epoch({col_sql})/{step_seconds}) AS BIGINT)*{step_seconds}"


# ---------------------------------------------------------------------------
# tz('<zone>') sub-day bucketing (DST-exact; closes the ADVICE-r6/VERDICT-r7
# fall-back deviation). For step < 1d the bucket KEY is the UTC instant at
# which the bucket's wall-clock label begins — so the repeated wall hour of
# a DST fall-back yields TWO distinct buckets (InfluxDB parity: 01:00 PDT
# and 01:00 PST are separate hourly rows), and the skipped spring-forward
# hour yields ZERO. Daily+ buckets keep the uniform wall-label space (a
# wall day legitimately spans the shift: 23/25 real hours, one row).
#
# Key formula (pure JVM-side expressions, codegen-friendly):
#     wall(t)  = t + off(t)                       via from_utc_timestamp
#     wall_b   = floor((wall(t)-boff)/step)*step + boff
#     key(t)   = wall_b - off(wall_b - off(t))
# The inner wall_b - off(t) is the bucket start *assuming* the row's own
# offset; re-reading the offset AT that instant normalizes two edge cases:
# a bucket that begins before the transition (rows after it re-attach to
# the first occurrence — InfluxDB merges an interior repeated hour into
# its containing bucket) and a bucket whose wall start does not exist
# (spring-forward gap: the start normalizes forward, JDK behavior).
# ---------------------------------------------------------------------------


def _wall_epoch(col: Column, zone: str) -> Column:
    """Epoch-seconds column -> wall-clock seconds in ``zone`` (the epoch
    of the local naive datetime read as if it were UTC)."""
    return F.unix_timestamp(F.from_utc_timestamp(F.timestamp_seconds(col), zone))


def tz_bucket_expr(ts_col, zone: str, step_seconds: int, offset_seconds: int = 0) -> Column:
    """UTC-instant bucket key for sub-day tz() buckets (see module note)."""
    c = F.col(ts_col) if isinstance(ts_col, str) else ts_col
    utc_e = F.unix_timestamp(c)
    wall_e = F.unix_timestamp(F.from_utc_timestamp(c, zone))
    wall_b = (
        F.floor((wall_e - F.lit(offset_seconds)) / F.lit(step_seconds)) * step_seconds
        + offset_seconds
    ).cast("long")
    s1 = wall_b - (wall_e - utc_e)
    off_s1 = _wall_epoch(s1, zone) - s1
    return (wall_b - off_s1).cast("long")


def zone_offsets(zone: str, from_epoch: int, to_epoch: int) -> list[int]:
    """Distinct UTC offsets (seconds) of ``zone`` over the padded range —
    driver-side metadata via stdlib zoneinfo (hourly scan is exact: DST
    regimes last months, never less than an hour)."""
    from datetime import datetime, timezone as _tz
    from zoneinfo import ZoneInfo

    z = ZoneInfo(zone)
    offs: list[int] = []
    for e in range(from_epoch - 86400, to_epoch + 86400 + 1, 3600):
        o = int(datetime.fromtimestamp(e, tz=z).utcoffset().total_seconds())
        if o not in offs:
            offs.append(o)
    return offs


def tz_spine_times(spark, zone: str, from_epoch: int, to_epoch: int,
                   step_seconds: int, offset_seconds: int = 0):
    """Non-uniform FILL spine for sub-day tz() buckets: one row per VALID
    bucket-start UTC instant (column ``time``) — two instants for a wall
    label inside a fall-back's repeated span, zero inside a spring-forward
    gap. Built fully in Spark: uniform wall-label sequence x the (tiny,
    driver-computed) distinct-offset set, explode, validity-filter.

    A candidate (w, o) is valid iff some instant with offset ``o`` falls
    in wall bucket ``w`` — since offset regimes are month-long intervals
    and step < 1d, that is iff the offset at the bucket's first or last
    covered instant equals ``o``. Its key is w - off(w - o): identical to
    ``tz_bucket_expr``'s normalization, so every data key joins."""
    offs = zone_offsets(zone, from_epoch, to_epoch)
    from datetime import datetime, timezone as _tz
    from zoneinfo import ZoneInfo

    z = ZoneInfo(zone)

    def _wall(e: int) -> int:
        return e + int(datetime.fromtimestamp(e, tz=z).utcoffset().total_seconds())

    wall_from, wall_to = _wall(from_epoch), _wall(to_epoch)
    n_from = (wall_from - offset_seconds) // step_seconds * step_seconds + offset_seconds
    labels = spark.range(1, numPartitions=1).select(
        F.explode(
            F.sequence(
                F.lit(int(n_from)).cast("long"),
                F.lit(int(wall_to)).cast("long"),
                F.lit(int(step_seconds)).cast("long"),
            )
        ).alias("_w")
    )
    cand = labels.select(
        "_w",
        F.explode(F.array(*[F.lit(int(o)).cast("long") for o in offs])).alias("_o"),
    )
    a = F.col("_w") - F.col("_o")
    b_last = F.col("_w") + F.lit(int(step_seconds)) - F.col("_o") - 1
    off_a = _wall_epoch(a, zone) - a
    off_b = _wall_epoch(b_last, zone) - b_last
    valid = (off_a == F.col("_o")) | (off_b == F.col("_o"))
    key = (F.col("_w") - off_a).cast("long")
    return cand.where(valid).select(key.alias("time")).distinct()
