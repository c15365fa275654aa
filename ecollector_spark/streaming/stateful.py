"""Stateful streaming operators A5-A10 (reference
src/integration/tsdb/processing/agreggator.go).

Two semantics the built-in windowed aggregates cannot express need keyed
state per series:

- **change-suppressed pre-aggregation** (A1-A5): per 30 s tick, apply the
  series' aggregation directive, but emit only when the aggregate differs
  from the previously-emitted value (agreggator.go:203-207).
- **counter difference** (A6-A10): per 10/20-min sampling tick, sum of
  positive consecutive deltas of a growing counter, with zero/outlier
  pre-filter (agreggator.go:311-340), meter-reset skip (285-305),
  seed carry-over (258), staleness eviction at 120 min (236-241),
  100 kWh plausibility cap (261-264), and hour re-attribution for
  hourly-accumulating main meters (243-246, 307-310).

Both are ``applyInPandasWithState`` functions keyed by ``series_id``.
The reference ticks on *processing* time; we key buckets on *event* time
so batch replay is deterministic and late data lands in its own bucket
(SURVEY §2.8 calls this out as an intentional improvement). Like the
reference — which computes over whatever the buffer holds at each tick —
every invocation processes all buckets it has seen, carrying only the
seed / last-emitted scalar across invocations, so state stays O(1) per
series no matter the corpus size (the 100 TB property: state size is
bounded by series cardinality, not event volume).

Scale: the only shuffle is the groupBy(series_id) that feeds the state
operator — the same key the warehouse is laid out on. Arrow moves each
series' micro-batch slice to Python once per trigger; per-series row
counts are tiny (the reference buffers ~20 points), so the pandas math is
negligible next to the exchange.
"""

from __future__ import annotations

import math
from collections.abc import Iterable, Iterator

import pandas as pd

from ecollector_spark.aggregate import calculate_difference, filter_series_noise

PREAGG_OUTPUT_SCHEMA = (
    "series_id string, time timestamp, value double, agg_func string"
)
PREAGG_STATE_SCHEMA = "last_emitted double"

DIFF_OUTPUT_SCHEMA = "series_id string, time timestamp, value double"
DIFF_STATE_SCHEMA = (
    "seed double, has_seed boolean, last_emitted double, last_ts double"
)

_AGGS = {
    "mean": lambda v: sum(v) / len(v),
    "min": min,
    "max": max,
    "sum": sum,
    "last": lambda v: v[-1],
}


def _bucket(epoch: float, step: int) -> int:
    return int(math.floor(epoch / step) * step)


def _collect(pdfs: Iterable[pd.DataFrame]) -> pd.DataFrame:
    parts = [p for p in pdfs if len(p)]
    if not parts:
        return pd.DataFrame()
    df = pd.concat(parts, ignore_index=True)
    return df.sort_values("ts", kind="mergesort", ignore_index=True)


def make_preaggregate_fn(interval_seconds: int = 30):
    """A1-A5: per-series directive aggregation with change suppression.

    Input rows need columns (series_id, ts, value_f, agg_func); the
    directive is per-series (last one wins, as in the reference where the
    series meta is overwritten on every add — agreggator.go:128-131).
    Emission time is the bucket *end* (the reference stamps time.Now() at
    the tick that closes the buffer — agreggator.go:196).

    A new series starts with last_emitted = 0 (the reference zeroes
    ``m.Value`` on series creation, agreggator.go:134), so a first
    aggregate of exactly 0.0 is suppressed — pinned by its golden tests.
    """

    def fn(key, pdfs: Iterable[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        (series_id,) = key
        df = _collect(pdfs)
        if df.empty:
            if state.hasTimedOut:
                state.remove()
            return
        last_emitted = state.get[0] if state.exists else 0.0

        df["epoch"] = df["ts"].map(lambda t: t.timestamp())
        df["bucket"] = df["epoch"].map(lambda e: _bucket(e, interval_seconds))
        out_t, out_v, out_f = [], [], []
        for bucket, grp in df.groupby("bucket", sort=True):
            vals = [v for v in grp["value_f"].tolist() if v is not None and not pd.isna(v)]
            if not vals:
                continue
            func = grp["agg_func"].iloc[-1]
            agg = _AGGS.get(func)
            if agg is None:  # difference series take the sampled path
                continue
            result = float(agg(vals))
            if result == last_emitted:
                continue  # A5: publish only values that changed
            last_emitted = result
            out_t.append(pd.Timestamp(bucket + interval_seconds, unit="s"))
            out_v.append(result)
            out_f.append(func)
        state.update((last_emitted,))
        if out_t:
            yield pd.DataFrame(
                {
                    "series_id": series_id,
                    "time": out_t,
                    "value": out_v,
                    "agg_func": out_f,
                }
            )

    return fn


def make_counter_difference_fn(
    sample_interval_seconds: int = 600,
    max_diff: float = 100.0,
    staleness_seconds: int = 120 * 60,
):
    """A6-A10: counter difference over sampling buckets.

    Input rows need (series_id, ts, value_f, hourly) where ``hourly`` is
    the HourlyAccumulatedValue profile flag (true for dev_type
    'meter.main_elec' — reference process.go:160-162).

    Per event-time bucket, in order:
    1. staleness (A8): a gap > 120 min since the previous report discards
       the buffer *and* the carried seed (agreggator.go:236-241 empties
       the slice, which held the seed element);
    2. hourly series skip noise filtering and re-attribute the emission
       time to the previous hour :59 (A9); others drop zeros and Tukey
       extreme outliers (A7) — seed element included, as in the reference
       where the seed lives inside the filtered slice;
    3. positive-delta sum with meter-reset skip (A6);
    4. the last (filtered) value seeds the next bucket;
    5. results > 100 kWh are dropped (A10), zero/unchanged results are
       suppressed (hourly: only zero — agreggator.go:266-275).
    """

    def fn(key, pdfs: Iterable[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        (series_id,) = key
        df = _collect(pdfs)
        if df.empty:
            if state.hasTimedOut:
                state.remove()
            return
        if state.exists:
            seed, has_seed, last_emitted, last_ts = state.get
        else:
            seed, has_seed, last_emitted, last_ts = 0.0, False, 0.0, float("-inf")

        df["epoch"] = df["ts"].map(lambda t: t.timestamp())
        df = df[df["value_f"].notna()]
        df["bucket"] = df["epoch"].map(lambda e: _bucket(e, sample_interval_seconds))
        out_t, out_v = [], []
        for bucket, grp in df.groupby("bucket", sort=True):
            vals = grp["value_f"].astype(float).tolist()
            epochs = grp["epoch"].tolist()
            hourly = bool(grp["hourly"].iloc[-1])
            # A8 staleness: gaps between consecutive reports evict the
            # buffer accumulated so far (incl. the seed)
            buf: list[float] = [seed] if has_seed else []
            prev_ts = last_ts
            for v, e in zip(vals, epochs):
                if e - prev_ts > staleness_seconds:
                    buf = []
                buf.append(v)
                prev_ts = e
            last_ts = prev_ts
            if not buf:
                has_seed = False
                continue
            if hourly:
                filtered = buf
                emit_epoch = bucket + sample_interval_seconds
                emit_time = _adjust_to_previous_hour(emit_epoch)
            else:
                filtered = filter_series_noise(buf)
                emit_time = pd.Timestamp(bucket + sample_interval_seconds, unit="s")
                if not filtered:
                    # nothing left: reference leaves the (empty) slice;
                    # next bucket starts seedless
                    has_seed = False
                    continue
            result = calculate_difference(filtered)
            seed, has_seed = filtered[-1], True
            if result > max_diff:
                continue
            if hourly:
                if result == 0:
                    continue
            elif result == last_emitted or result == 0:
                continue
            last_emitted = result
            out_t.append(emit_time)
            out_v.append(result)
        state.update((seed, has_seed, last_emitted, last_ts))
        if out_t:
            yield pd.DataFrame({"series_id": series_id, "time": out_t, "value": out_v})

    return fn


def _adjust_to_previous_hour(epoch: float) -> pd.Timestamp:
    """adjustTimeByOneHour (agreggator.go:307-310): minus 1 h, minute=59,
    second=0."""
    t = pd.Timestamp(epoch, unit="s") - pd.Timedelta(hours=1)
    return t.replace(minute=59, second=0, microsecond=0, nanosecond=0)
