"""Streaming scale ladder (r4 verdict item #4): replay the 1x/10x/100x
events corpora through the REAL streaming path — file source ->
``applyInPandasWithState`` pre-aggregation -> sink — and measure what
the "state is O(series), not O(events)" claim (streaming/stateful.py)
actually costs: per-trigger wall time and the state store's row count /
memory from the query's own progress events.

Series identity here is the full (event_type, user_id) product — the
axis the ladder grows (10x replicas = 10x the device population under
offset user ids) — so state rows must scale with SERIES while events
per series stay constant: a flat state/series ratio plus near-linear
trigger time across the decade is the measured form of the claim.

The input is materialized once per rung as multi-file parquet and
streamed with ``maxFilesPerTrigger`` so the replay runs as several real
micro-batches (not one availableNow gulp); the sink is the noop format
(full execution, no sink IO in the measurement).

Usage: python tools/streaming_scale_probe.py [--base /root/testdata/sf0.1]
Writes STREAMING_SCALE.json (folded into BENCH_DETAIL.json by the next
bench.py run) and prints the SCALE.md ladder table.
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

from tools.ts_scale_probe import build_scaled  # noqa: E402


def _stateful_input(spark, sf_dir):
    """events -> (series_id, ts, value_f, agg_func) at FULL series
    cardinality (event_type x user_id)."""
    from pyspark.sql import functions as F

    from ecollector_spark.sources.events_adapter import read_events

    ev = read_events(spark, sf_dir)
    return ev.select(
        F.concat(F.col("event_type"), F.lit(";"), F.col("user_id").cast("string")).alias(
            "series_id"
        ),
        F.col("ts").cast("timestamp").alias("ts"),
        F.col("value").alias("value_f"),
        F.lit("mean").alias("agg_func"),
    )


def run_rung(spark, sf_dir: str, label: str, n_files: int = 8) -> dict:
    from ecollector_spark.streaming.pipeline import preaggregate_stateful

    inp = _stateful_input(spark, sf_dir)
    n_series = inp.select("series_id").distinct().count()
    n_rows = inp.count()
    tmp = tempfile.mkdtemp(prefix=f"ec_stream_scale_{label}_")
    src = os.path.join(tmp, "src")
    inp.repartition(n_files).write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema

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
    data_batches = [p for p in progresses if p.get("numInputRows", 0) > 0]
    trig_ms = [p["durationMs"]["triggerExecution"] for p in data_batches]
    state_rows = max(
        (so["numRowsTotal"] for p in progresses for so in p.get("stateOperators", [])),
        default=0,
    )
    state_bytes = max(
        (so.get("memoryUsedBytes", 0) for p in progresses for so in p.get("stateOperators", [])),
        default=0,
    )
    shutil.rmtree(tmp, ignore_errors=True)
    return {
        "events": n_rows,
        "series": n_series,
        "wall_s": round(wall, 2),
        "n_data_triggers": len(data_batches),
        "trigger_ms": trig_ms,
        "max_trigger_ms": max(trig_ms, default=0),
        "state_rows": state_rows,
        "state_bytes": state_bytes,
        "state_rows_per_series": round(state_rows / max(n_series, 1), 3),
        "state_bytes_per_series": round(state_bytes / max(n_series, 1), 1),
    }


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=os.path.join(repo, "STREAMING_SCALE.json"))
    ap.add_argument("--mults", type=int, nargs="*", default=[10, 100])
    args = ap.parse_args()

    from ecollector_spark.session import get_spark

    spark = get_spark("streaming_scale")
    ladder = [("1x", args.base)]
    for mult in args.mults:
        d = os.path.join(tempfile.gettempdir(), f"ec_ts_scale_x{mult}")
        build_scaled(spark, args.base, d, mult)  # reuses the ts ladder dirs
        ladder.append((f"{mult}x", d))

    out = {
        "note": (
            "events replayed through the real file-source -> "
            "applyInPandasWithState (30 s preagg + change suppression) -> "
            "noop-sink path in multiple micro-batches (maxFilesPerTrigger); "
            "state_rows from the query's own stateOperators progress = one "
            "row per live series, so flat state/series across the ladder is "
            "the measured O(series)-not-O(events) claim; local[32]"
        ),
        "rungs": {},
    }
    for label, d in ladder:
        rec = run_rung(spark, d, label)
        out["rungs"][label] = rec
        print(label, rec, flush=True)

    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", args.out)

    # SCALE.md-ready table
    print("\n| rung | events | series | state rows | state B/series | wall s | max trigger ms |")
    print("|---|---|---|---|---|---|---|")
    for label, rec in out["rungs"].items():
        print(
            f"| {label} | {rec['events']:,} | {rec['series']:,} | "
            f"{rec['state_rows']:,} | {rec['state_bytes_per_series']} | "
            f"{rec['wall_s']} | {rec['max_trigger_ms']} |"
        )


if __name__ == "__main__":
    main()
