"""Measured 10x scale point for the core time-series family (r3 verdict
item #6): the dedup/ANN family has measured candidate-growth exponents
(bench.py scale probe); this gives the ts operators their missing
wall-time ladder.

No sf1 directory ships with the testdata, so one is synthesized at
exactly 10x the sf0.1 fact table: events replicated 10 times under
offset (user_id, event_id) ranges — 10x the device/series population
over the same time range, which is how this corpus grows in production
— while the dimension tables are shared unchanged (symlinks). Series
cardinality, not per-series density, is the axis that stresses the
groupBy/state/gap-fill paths.

Usage: python tools/ts_scale_probe.py [--runs N] [--out TS_SCALE.json]
Writes per-query wall times at sf0.1 (1x), 10x, and 100x plus the
time-growth exponent (1.0 = linear in rows) fitted over the TOP decade
(10x -> 100x): the first run of this probe showed every ts query is
fixed-overhead-dominated below ~1M rows (10x of 100k rows was
measurably no slower than 1x - plan/launch cost swamps data cost), so
an exponent that includes the 1x point reads artificially flat. The
1x and 10x medians are still reported for the floor they document.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: the ts-family headliners (transform, preagg, counter-diff, gap-fill,
#: rollup, two-level group, outlier fence, planner group-by)
TS_QUERIES = [
    "ts_group_by_time_mean",
    "ts_group_by_time_tag_fill_previous",
    "fimp_transform_pipeline",
    "preagg_30s_directives",
    "counter_difference_10m",
    "energy_rollup",
    "two_level_group_energy",
    "outlier_fence",
]

USER_OFFSET = 1_000_000
EVENT_OFFSET = 1_000_000_000


def build_scaled(spark, base_dir: str, out_dir: str, replicas: int) -> None:
    """events x replicas under offset (user_id, event_id); dims symlinked."""
    from pyspark.sql import functions as F

    from ecollector_spark.sources.events_adapter import read_events

    os.makedirs(out_dir, exist_ok=True)
    for name in os.listdir(base_dir):
        src, dst = os.path.join(base_dir, name), os.path.join(out_dir, name)
        if name != "events.parquet" and not os.path.exists(dst):
            os.symlink(src, dst)
    ev = read_events(spark, base_dir)
    rep = spark.range(replicas).select(F.col("id").alias("_k"))
    scaled = ev.crossJoin(rep).select(
        (F.col("event_id") + EVENT_OFFSET * F.col("_k")).alias("event_id"),
        "ts",
        (F.col("user_id") + USER_OFFSET * F.col("_k")).alias("user_id"),
        "event_type",
        "value",
        "props",
    )
    scaled.write.mode("overwrite").parquet(os.path.join(out_dir, "events.parquet"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--out", default=os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "TS_SCALE.json"))
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from ecollector_spark import driver_queries
    from ecollector_spark.session import get_spark

    driver_queries.load_all()
    spark = get_spark("ts_scale")
    registry = {**driver_queries.QUERIES, **driver_queries.SHELVED_QUERIES}

    ladder = [("1x", args.base)]
    for mult in (10, 100):
        d = os.path.join(tempfile.gettempdir(), f"ec_ts_scale_x{mult}")
        build_scaled(spark, args.base, d, mult)
        ladder.append((f"{mult}x", d))

    def rows(d):
        return spark.read.parquet(os.path.join(d, "events.parquet")).count()

    counts = {label: rows(d) for label, d in ladder}
    out = {
        "note": (
            "wall-time growth of the ts family across a 1x/10x/100x events "
            "ladder (replicas of sf0.1 under offset series ids, shared "
            "dims); exponent = log-slope over the TOP decade (10x -> 100x), "
            "1.0 = linear — the 1x->10x step sits on the fixed plan/launch "
            "overhead floor (~0.4-3 s regardless of data) and would read "
            "artificially flat; medians of --runs runs, noop sink, local[32]"
        ),
        "rows": counts,
        "queries": {},
    }
    hi_ratio = counts["100x"] / counts["10x"]
    for name in TS_QUERIES:
        fn = registry[name]
        rec = {}
        for label, d in ladder:
            ts = []
            for _ in range(args.runs):
                t0 = time.perf_counter()
                fn(spark, d).write.format("noop").mode("overwrite").save()
                ts.append(time.perf_counter() - t0)
            rec[label] = round(statistics.median(ts), 3)
        rec["exponent_top_decade"] = round(
            math.log(max(rec["100x"], 1e-9) / max(rec["10x"], 1e-9))
            / math.log(hi_ratio),
            3,
        )
        out["queries"][name] = rec
        print(name, rec, flush=True)

    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
