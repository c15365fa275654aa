"""Streaming SERIES-cardinality ladder (r8, VERDICT r7 #6).

The r5 ladder (streaming_scale_probe.py) grew events and series together;
this one grows ONLY the series population — total events fixed — because
that is the axis that stresses the state store width: 32 fixed state
partitions pack 10x the keys per partition at each rung, and the
applyInPandasWithState stage processes 10x the groups per Python batch.

Rungs: 4M events over 10k / 100k / 1M series (100x). The 1M rung runs
twice — once at the engine's streaming default (32 state partitions,
checkpoint-stable) and once sized by
``pipeline.size_streaming_state_partitions`` with a tighter
series-per-partition target — so the output shows whether the fixed 32
is a measured wall on this box and what the sizing lever buys. (On one
32-core box both runs get 32 cores; the sizing lever's real payoff is
cluster width, where 32 partitions = 32 busy cores forever.)

Writes STREAMING_SERIES_SCALE.json and prints the SCALE.md table.
Usage: python tools/streaming_series_probe.py [--events 4000000]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _make_input(spark, n_events: int, n_series: int, out_dir: str, n_files: int = 8):
    """Deterministic synthetic (series_id, ts, value_f, agg_func):
    events round-robin over the series population, timestamps spread
    over a few 30 s buckets, values varying so change suppression
    doesn't flatten the output."""
    from pyspark.sql import functions as F

    df = (
        spark.range(n_events)
        .select(
            F.concat(F.lit("s"), (F.col("id") % n_series).cast("string")).alias(
                "series_id"
            ),
            F.timestamp_seconds(
                F.lit(1704067200) + (F.col("id") % 7) * 30 + (F.col("id") % 13)
            ).alias("ts"),
            (F.col("id") % 997).cast("double").alias("value_f"),
            F.lit("mean").alias("agg_func"),
        )
    )
    df.repartition(n_files).write.mode("overwrite").parquet(out_dir)


def run_rung(spark, n_events: int, n_series: int, label: str,
             sized_target: int | None = None, n_files: int = 8) -> dict:
    from ecollector_spark.streaming.pipeline import (
        preaggregate_stateful,
        size_streaming_state_partitions,
    )

    tmp = tempfile.mkdtemp(prefix=f"ec_series_scale_{label}_")
    src = os.path.join(tmp, "src")
    _make_input(spark, n_events, n_series, src, n_files)
    schema = spark.read.parquet(src).schema

    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    if sized_target is not None:
        parts = size_streaming_state_partitions(
            spark, n_series, target_series_per_partition=sized_target
        )
    else:
        parts = int(old_parts)
    try:
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", max(1, n_files // 4))
            .parquet(src)
        )
        t0 = time.perf_counter()
        q = (
            preaggregate_stateful(stream)
            .writeStream.format("noop")
            .outputMode("append")
            .option("checkpointLocation", os.path.join(tmp, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(3600)
        wall = time.perf_counter() - t0
        progresses = [json.loads(p.json) for p in q.recentProgress]
        q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
    data_batches = [p for p in progresses if p.get("numInputRows", 0) > 0]
    trig_ms = [p["durationMs"]["triggerExecution"] for p in data_batches]
    ops = [so for p in progresses for so in p.get("stateOperators", [])]
    state_rows = max((so["numRowsTotal"] for so in ops), default=0)
    state_bytes = max((so.get("memoryUsedBytes", 0) for so in ops), default=0)
    n_parts = max(
        (so.get("numShufflePartitions", 0) for so in ops), default=parts
    )
    shutil.rmtree(tmp, ignore_errors=True)
    return {
        "events": n_events,
        "series": n_series,
        "state_partitions": int(n_parts or parts),
        "wall_s": round(wall, 2),
        "n_data_triggers": len(data_batches),
        "trigger_ms": trig_ms,
        "max_trigger_ms": max(trig_ms, default=0),
        "state_rows": state_rows,
        "state_bytes": state_bytes,
        "series_per_partition": round(n_series / max(int(n_parts or parts), 1)),
    }


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=4_000_000)
    ap.add_argument("--out", default=os.path.join(repo, "STREAMING_SERIES_SCALE.json"))
    ap.add_argument(
        "--rungs",
        default="10k,100k,1M,1M_sized",
        help="comma-separated rung labels from RUNG_SPECS (r9 adds "
        "100k_sized128 for the local-cluster state-distribution point)",
    )
    ap.add_argument(
        "--merge",
        action="store_true",
        help="update rung records inside an existing --out file (keyed "
        "by label + master) instead of overwriting it",
    )
    args = ap.parse_args()

    from ecollector_spark.session import get_spark

    spark = get_spark("streaming_series_scale")
    master = spark.conf.get("spark.master")
    from tools.weather import wait_for_quiet

    # VERDICT r10 #3: wall-clock rungs from a loaded box are
    # weather-fragile — wait for quiet, annotate if the box never is
    guard = wait_for_quiet()
    out = {
        "note": (
            "SERIES-cardinality ladder: total events fixed, series 10k->1M "
            "(100x), real file-source -> applyInPandasWithState 30s preagg "
            "-> noop sink, 4 micro-batches; the 1M rung repeats with "
            "size_streaming_state_partitions (target 10k series/partition) "
            "to measure the fixed-32 state width against the sizing lever "
            "on one box; local[32]"
        ),
        "weather_guard": guard,
        "rungs": {},
    }
    RUNG_SPECS = {
        "10k": (10_000, None),
        "100k": (100_000, None),
        "1M": (1_000_000, None),
        "1M_sized": (1_000_000, 10_000),
        # r9 (VERDICT r8 #7): the 128-wide state point the sizing lever
        # exists for — run it under SPARK_GRAFT_MASTER=local-cluster[2,16]
        # so the state store actually distributes across executor JVMs
        "100k_sized128": (100_000, 782),
    }
    if args.merge and os.path.exists(args.out):
        with open(args.out) as f:
            out = json.load(f)
        out.setdefault("rungs", {})
        out["weather_guard"] = guard  # the CURRENT session's capture state
    for label in [r.strip() for r in args.rungs.split(",") if r.strip()]:
        n_series, target = RUNG_SPECS[label]
        rec = run_rung(spark, args.events, n_series, label, sized_target=target)
        rec["master"] = master
        key = label if master.startswith("local[") or master == "local" else f"{label}@{master}"
        out["rungs"][key] = rec
        print(key, rec, flush=True)

    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", args.out)
    print("\n| rung | series | state parts | series/part | wall s | max trigger ms | state rows |")
    print("|---|---|---|---|---|---|---|")
    for label, rec in out["rungs"].items():
        print(
            f"| {label} | {rec['series']:,} | {rec['state_partitions']} | "
            f"{rec['series_per_partition']:,} | {rec['wall_s']} | "
            f"{rec['max_trigger_ms']} | {rec['state_rows']:,} |"
        )


if __name__ == "__main__":
    main()
