"""Stream-stream joins (SURVEY §2.8 extension): the streaming twin of
``operators/joins.py``'s batch interval join, on Structured Streaming's
native symmetric hash join.

The batch interval join buckets intervals to turn an inequality join
into a hash join; streaming Spark already maintains symmetric hash
state per key, so here the job is to express the time bound so the
state is EVICTABLE: both sides carry watermarks and the join condition
contains the event-time range, which is exactly what Spark's state
cleanup needs (without it, stream-stream join state grows forever —
the 100 TB failure mode). State per key is bounded by
``upper_seconds + watermark`` of right rows and ``watermark`` of left
rows; keys hash-partition the state store, so scale-out is the state
store's, not the operator's.
"""

from __future__ import annotations

import functools
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    by: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower_seconds: int = 0,
    upper_seconds: int = 600,
    watermark: str = "10 minutes",
    right_prefix: str = "r_",
) -> DataFrame:
    """Watermarked INNER stream-stream join: each left row matched to
    every right row of the same ``by`` key with
    ``right.ts in [left.ts + lower_seconds, left.ts + upper_seconds]``
    (the batch ``interval_join`` contract on two live streams).

    Right-side non-key columns are renamed with ``right_prefix`` so the
    output schema is unambiguous; right key columns are dropped (equal
    by construction). Both inputs gain an event-time watermark — the
    join CONDITION carries the time range, which is what lets Spark
    evict state: a right row older than every possible future left
    match is dropped from the store, so state stays
    O(keys x window / throughput), never O(stream).

    Works identically on batch DataFrames (Spark's unified semantics),
    which is how the parity test pins the row set."""
    if not by:
        raise ValueError("stream_interval_join needs at least one key column")
    if lower_seconds > upper_seconds:
        raise ValueError(f"empty interval [{lower_seconds}, {upper_seconds}]")
    # the prefix must not collide with an existing left column: a left
    # stream already carrying e.g. ``r_ts`` would make the renamed right
    # column ambiguous in the output (and, pre-r10, the unqualified
    # F.col time condition failed analysis) — refuse loudly instead
    clash = sorted(
        (right_prefix + c)
        for c in right.columns
        if c not in by and (right_prefix + c) in left.columns
    )
    if clash:
        raise ValueError(
            f"right_prefix {right_prefix!r} collides with left columns {clash}; "
            "pick a different right_prefix"
        )
    l = left.withWatermark(left_ts, watermark)  # noqa: E741
    r = right.withWatermark(right_ts, watermark)
    for c in right.columns:
        if c not in by:
            r = r.withColumnRenamed(c, right_prefix + c)
    rts = right_prefix + right_ts
    key_cond = functools.reduce(
        lambda a, b: a & b, [l[k] == r[k] for k in by]
    )
    # DataFrame-qualified refs (l[...]/r[...]), never bare F.col: with
    # both sides in scope an unqualified name that exists on both would
    # be ambiguous at analysis (r10, ADVICE)
    time_cond = (
        r[rts] >= l[left_ts] + F.expr(f"INTERVAL {lower_seconds} SECONDS")
    ) & (
        r[rts] <= l[left_ts] + F.expr(f"INTERVAL {upper_seconds} SECONDS")
    )
    joined = l.join(r, key_cond & time_cond, "inner")
    for k in by:
        joined = joined.drop(r[k])
    return joined
