"""Property pin: the recursive-CTE counter-difference oracle is
step-for-step equivalent to the pandas state machine's semantics on
ARBITRARY inputs, not just the driver corpus.

The simulator below replays ``make_counter_difference_fn``'s bucket loop
verbatim (same helpers, same IEEE operation order: seed carry, staleness
eviction, zero/Tukey filter, positive-delta sum, cap, suppression,
hourly re-attribution); hypothesis drives both it and the DuckDB
recursion with random event sequences and the outputs must match
float-exactly (no rounding applied — stronger than the gate's round-6).

Pure pytest + duckdb; no Spark session needed.
"""

import math
from collections import defaultdict
from itertools import groupby

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from ecollector_spark.aggregate import calculate_difference, filter_series_noise
from ecollector_spark.driver_queries.streaming_q import counter_diff_oracle_sql

INTERVAL, STALENESS, MAX_DIFF = 600, 7200, 100.0


def _adjust_prev_hour(epoch: int) -> int:
    # _adjust_to_previous_hour in epoch-seconds form (minus 1h, :59:00)
    return (epoch - 3600) // 3600 * 3600 + 3540


def simulate(rows):
    """rows: [(series_id, epoch_s(float), value(float>=0), hourly(bool))]
    -> [(series_id, emit_time_epoch, value)] — the state machine of
    streaming/stateful.py:make_counter_difference_fn, single batch."""
    per = defaultdict(list)
    for s, e, v, h in rows:
        per[s].append((e, v, h))
    out = []
    for s, evs in sorted(per.items()):
        evs.sort(key=lambda t: t[0])
        seed, has_seed, last_emitted, last_ts = 0.0, False, 0.0, float("-inf")
        for bucket, grp in groupby(
            evs, key=lambda t: int(math.floor(t[0] / INTERVAL) * INTERVAL)
        ):
            grp = list(grp)
            vals = [v for _, v, _ in grp]
            epochs = [e for e, _, _ in grp]
            hourly = bool(grp[-1][2])
            buf = [seed] if has_seed else []
            prev_ts = last_ts
            for v, e in zip(vals, epochs):
                if e - prev_ts > STALENESS:
                    buf = []
                buf.append(v)
                prev_ts = e
            last_ts = prev_ts
            if not buf:
                has_seed = False
                continue
            if hourly:
                filtered = buf
                emit_time = _adjust_prev_hour(bucket + INTERVAL)
            else:
                filtered = filter_series_noise(buf)
                emit_time = bucket + INTERVAL
                if not filtered:
                    has_seed = False
                    continue
            result = calculate_difference(filtered)
            seed, has_seed = filtered[-1], True
            if result > MAX_DIFF:
                continue
            if hourly:
                if result == 0:
                    continue
            elif result == last_emitted or result == 0:
                continue
            last_emitted = result
            out.append((s, emit_time, result))
    return sorted(out)


def oracle(rows):
    con = duckdb.connect()
    df = pd.DataFrame(rows, columns=["series_id", "e", "v", "hourly"])
    con.register("input_rows", df)
    sql = counter_diff_oracle_sql(
        "  SELECT series_id, CAST(e AS DOUBLE) AS e, CAST(v AS DOUBLE) AS v, hourly FROM input_rows",
        round6=False,
    )
    return sorted(tuple(r) for r in con.execute(sql).fetchall())


# event sequences: strictly increasing epochs (gaps span sub-bucket,
# cross-bucket, and staleness-triggering ranges), values include zeros,
# plateaus, resets (drops), spikes (Tukey bait), and >100 jumps (cap bait)
_gaps = st.sampled_from([7, 45, 200, 599, 601, 1800, 7199, 7201, 9000])
_vals = st.sampled_from([0.0, 0.25, 1.5, 2.0, 2.25, 7.0, 55.5, 120.0, 1000.0])


@st.composite
def _series_events(draw):
    n = draw(st.integers(min_value=1, max_value=25))
    start = draw(st.integers(min_value=1_700_000_000, max_value=1_700_050_000))
    gaps = draw(st.lists(_gaps, min_size=n, max_size=n))
    vals = draw(st.lists(_vals, min_size=n, max_size=n))
    hourly = draw(st.booleans())
    e = float(start)
    out = []
    for g, v in zip(gaps, vals):
        e += g
        out.append((e, v, hourly))
    return out


@given(st.lists(_series_events(), min_size=1, max_size=3))
@settings(max_examples=60, deadline=None)
def test_oracle_equals_state_machine(series_list):
    rows = [
        (f"s{i}", e, v, h)
        for i, evs in enumerate(series_list)
        for (e, v, h) in evs
    ]
    assert oracle(rows) == simulate(rows)


def test_known_sequences():
    """Hand-pinned cases covering each rule explicitly."""
    # simple growth in one bucket: diff = 3.0 at bucket end
    rows = [("a", 1000.0, 1.0, False), ("a", 1100.0, 4.0, False)]
    assert oracle(rows) == [("a", 1200, 3.0)] == simulate(rows)
    # meter reset contributes nothing; growth after reset counts
    rows = [("a", 1000.0, 10.0, False), ("a", 1100.0, 2.0, False), ("a", 1200.0, 5.0, False)]
    assert oracle(rows) == [("a", 1800, 3.0)] == simulate(rows)
    # seed carries across buckets: second bucket diff vs last of first
    rows = [("a", 500.0, 1.0, False), ("a", 700.0, 2.0, False), ("a", 1300.0, 6.0, False)]
    assert oracle(rows) == [("a", 1200, 1.0), ("a", 1800, 4.0)] == simulate(rows)
    # staleness gap (> 2h) evicts seed: lone sample after gap -> no diff
    rows = [("a", 500.0, 1.0, False), ("a", 900.0, 2.0, False), ("a", 10000.0, 50.0, False)]
    assert oracle(rows) == [("a", 1200, 1.0)] == simulate(rows)
    # > 100 kWh result capped (dropped), seed still advances
    rows = [("a", 1000.0, 1.0, False), ("a", 1100.0, 500.0, False), ("a", 1300.0, 501.0, False)]
    assert oracle(rows) == [("a", 1800, 1.0)] == simulate(rows)
    # hourly: time re-attributed to previous hour :59, zeros kept in buf
    rows = [("a", 7300.0, 2.0, True), ("a", 7400.0, 5.0, True)]
    assert oracle(rows) == [("a", _adjust_prev_hour(7800), 3.0)] == simulate(rows)
    assert _adjust_prev_hour(7800) == 7140  # hour(4200) -> 3600 + :59:00
