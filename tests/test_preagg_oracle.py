"""Property pin: the pre-aggregation oracle's suppression equivalence.

The streaming_preagg_replay oracle suppresses a bucket when its
aggregate equals the PREVIOUS BUCKET'S AGGREGATE (a lag window), while
the state machine suppresses against the LAST EMITTED value
(agreggator.go:203-207). The gate docstring argues these are equal by
induction (equal runs collapse); this test verifies that equivalence on
random inputs — including exact-zero aggregates (a new series starts
suppressed at 0.0) and equal-run plateaus.

Values are dyadic rationals (k/4) so sums are exact and mean = one
correctly-rounded division on both engines — order-independent, like
the driver corpus.
"""

import math
from collections import defaultdict
from itertools import groupby

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

INTERVAL = 30

_AGGS = {
    "mean": lambda v: sum(v) / len(v),
    "min": min,
    "max": max,
    "sum": sum,
    "last": lambda v: v[-1],
}


def simulate(rows):
    """rows: [(series_id, epoch, value, func)] -> emitted
    (series_id, time, value, func) — make_preaggregate_fn semantics."""
    per = defaultdict(list)
    for s, e, v, f in rows:
        per[s].append((e, v, f))
    out = []
    for s, evs in sorted(per.items()):
        evs.sort(key=lambda t: t[0])
        last_emitted = 0.0
        for bucket, grp in groupby(
            evs, key=lambda t: int(math.floor(t[0] / INTERVAL) * INTERVAL)
        ):
            grp = list(grp)
            vals = [v for _, v, _ in grp]
            func = grp[-1][2]
            result = float(_AGGS[func](vals))
            if result == last_emitted:
                continue
            last_emitted = result
            out.append((s, bucket + INTERVAL, result, func))
    return sorted(out)


def oracle(rows):
    """The driver gate's lag-window SQL shape over the same rows."""
    con = duckdb.connect()
    df = pd.DataFrame(rows, columns=["series_id", "e", "v", "func"])
    con.register("input_rows", df)
    sql = f"""
WITH agg AS (
  SELECT series_id, CAST(floor(e/{INTERVAL}) AS BIGINT)*{INTERVAL} + {INTERVAL} AS time_s,
         min(func) AS func,
         CASE min(func)
           WHEN 'mean' THEN avg(v) WHEN 'last' THEN arg_max(v, e)
           WHEN 'max' THEN max(v) WHEN 'min' THEN min(v)
           ELSE sum(v) END AS value
  FROM input_rows GROUP BY 1, CAST(floor(e/{INTERVAL}) AS BIGINT)*{INTERVAL} + {INTERVAL}),
sup AS (
  SELECT series_id, time_s, value, func,
         coalesce(lag(value) OVER (PARTITION BY series_id ORDER BY time_s), 0.0) AS prev
  FROM agg)
SELECT series_id, time_s, value, func FROM sup WHERE value <> prev
ORDER BY series_id, time_s
"""
    return sorted(tuple(r) for r in con.execute(sql).fetchall())


_gaps = st.sampled_from([1, 5, 29, 30, 31, 90, 300])
_vals = st.sampled_from([0.0, 0.25, 0.5, 1.0, 1.0, 2.75, -3.5, 10.0])  # dups on purpose
_funcs = st.sampled_from(sorted(_AGGS))


@st.composite
def _series_events(draw):
    n = draw(st.integers(min_value=1, max_value=20))
    start = draw(st.integers(min_value=1_700_000_000, max_value=1_700_000_600))
    gaps = draw(st.lists(_gaps, min_size=n, max_size=n))
    vals = draw(st.lists(_vals, min_size=n, max_size=n))
    func = draw(_funcs)
    e, out = float(start), []
    for g, v in zip(gaps, vals):
        e += g
        out.append((e, v, func))
    return out


@given(st.lists(_series_events(), min_size=1, max_size=3))
@settings(max_examples=80, deadline=None)
def test_lag_suppression_equals_last_emitted(series_list):
    rows = [
        (f"s{i}", e, v, f)
        for i, evs in enumerate(series_list)
        for (e, v, f) in evs
    ]
    assert oracle(rows) == simulate(rows)


def test_equal_run_collapse_and_zero_start():
    # a plateau collapses to one emission on both sides
    rows = [("a", 10.0, 5.0, "last"), ("a", 40.0, 5.0, "last"),
            ("a", 70.0, 5.0, "last"), ("a", 100.0, 7.0, "last")]
    assert oracle(rows) == simulate(rows) == [
        ("a", 30, 5.0, "last"), ("a", 120, 7.0, "last")
    ]
    # a first aggregate of exactly 0.0 is suppressed (series starts at 0)
    rows = [("a", 10.0, 0.0, "mean"), ("a", 40.0, 1.0, "mean")]
    assert oracle(rows) == simulate(rows) == [("a", 60, 1.0, "mean")]
