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
