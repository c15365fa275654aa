"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is materialized with the noop sink (full execution, no
driver-side collect cost), timed end-to-end including planning, and run
$SPARK_GRAFT_BENCH_RUNS times (default 3): "queries" holds the per-query
MEDIAN, "value" the sum of medians, and "spread" the per-query
[min, max] so round-over-round regressions are distinguishable from
run-to-run noise.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "ts_group_by_time_mean",
    "ts_group_by_time_tag_fill_previous",
    "energy_rollup",
    "preagg_30s_directives",
    "counter_difference_10m",
    "two_level_group_energy",
    "outlier_fence",
    "raw_sql_query",
    "fimp_transform_pipeline",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ann_cosine_topk",
    "ann_ivf_topk",
    "sketch_kmv_distinct_users",
    "text_quality",
    "tpch_q1_pricing_summary",
    "tpch_q5_local_supplier_volume",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    from ecollector_spark import driver_queries
    from ecollector_spark.session import get_spark

    driver_queries.load_all()
    spark = get_spark("bench")

    registry = {**driver_queries.QUERIES, **driver_queries.SHELVED_QUERIES}
    names = [n for n in HEADLINE if n in registry]
    extra = os.environ.get("SPARK_GRAFT_BENCH_QUERIES")
    if extra:
        names = [n.strip() for n in extra.split(",") if n.strip() in registry]
    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))

    # Warm the JVM once with a representative plan (scan + shuffle agg +
    # broadcast join) so per-query timings measure the engine, not
    # first-run JIT/codegen infrastructure. Standard steady-state
    # benchmarking; each query still pays its OWN plan's codegen.
    from pyspark.sql import functions as F

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    dim = spark.range(5).select(F.col("id").alias("k"))
    (
        ev.limit(10000)
        .join(F.broadcast(dim), ev.user_id % 5 == dim.k)
        .groupBy("event_type")
        .agg(F.avg("value"), F.count("*"))
        .write.format("noop")
        .mode("overwrite")
        .save()
    )

    timings: dict[str, float] = {}
    spread: dict[str, list[float]] = {}
    for name in names:
        fn = registry[name]
        runs = []
        for _ in range(n_runs):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        timings[name] = round(statistics.median(runs), 3)
        spread[name] = [round(min(runs), 3), round(max(runs), 3)]

    out = {
        "metric": f"headline query wall time (noop sink), sum of per-query medians of {n_runs} runs",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "spread": spread,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
