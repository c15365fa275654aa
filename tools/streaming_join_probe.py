"""Stream-stream join scale ladder (r9 second session): replay the
1x/10x/100x events corpora through the REAL streaming path — two file
sources -> ``stream_interval_join`` -> noop sink, several micro-batches
— and measure what the "state is O(keys x window), never O(stream)"
claim (streaming/joins.py) actually costs: per-trigger wall, the
symmetric-hash state rows/bytes from the query's own progress events,
and the output row count (which the batch twin must reproduce — parity
asserted per rung).

Left = purchase events, right = click events, keyed by user_id, right
rows matched within [0, 600 s] after the left row, 10 min watermark.
The ladder multiplies the device population under offset user ids, so
keys grow with the rung while the per-key window density stays
constant: near-flat state/keys across the decade is the measured form
of the eviction claim.

Usage: python tools/streaming_join_probe.py [--base /root/testdata/sf0.1]
Writes STREAMING_JOIN_SCALE.json.
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


def _sides(spark, sf_dir):
    from pyspark.sql import functions as F

    from ecollector_spark.sources.events_adapter import read_events

    ev = read_events(spark, sf_dir).select(
        F.col("user_id").cast("string").alias("dev"),
        # NTZ -> TIMESTAMP: watermarks require the zoned type
        F.col("ts").cast("timestamp").alias("ts"),
        F.col("value").alias("v"),
        F.col("event_type"),
    )
    return (
        ev.where(F.col("event_type") == "purchase").drop("event_type"),
        ev.where(F.col("event_type") == "click").drop("event_type"),
    )


def _write_ordered(spark, df, src: str, n_files: int) -> None:
    """Materialize the stream input as TIME-ORDERED files (uniform
    event-time slabs, one file each, written — and therefore
    mtime-ordered — in time order). The file source replays them in
    that order, so the watermark advances monotonically and no row is
    artificially late: a random file split would mark most of the
    corpus late and the watermark would (correctly, but uselessly for a
    parity measurement) drop it."""
    import glob as _glob

    from pyspark.sql import functions as F

    os.makedirs(src, exist_ok=True)
    row = df.agg(
        F.unix_timestamp(F.min("ts")).alias("mn"),
        F.unix_timestamp(F.max("ts")).alias("mx"),
    ).first()
    mn, mx = row["mn"], row["mx"]
    width = max((mx - mn + 1) / n_files, 1e-9)
    e = F.unix_timestamp("ts")
    for i in range(n_files):
        lo = mn + i * width
        cond = (e >= lo) & (e < mn + (i + 1) * width) if i < n_files - 1 else (e >= lo)
        tmpd = src + f"_tmp{i}"
        df.where(cond).coalesce(1).write.mode("overwrite").parquet(tmpd)
        parts = _glob.glob(os.path.join(tmpd, "part-*.parquet"))
        if parts:
            shutil.move(parts[0], os.path.join(src, f"{i:04d}.parquet"))
        shutil.rmtree(tmpd, ignore_errors=True)


def run_rung(spark, sf_dir: str, label: str, n_files: int = 8) -> dict:
    from ecollector_spark.streaming.joins import stream_interval_join

    left, right = _sides(spark, sf_dir)
    tmp = tempfile.mkdtemp(prefix=f"ec_sjoin_scale_{label}_")
    lsrc, rsrc = os.path.join(tmp, "l"), os.path.join(tmp, "r")
    _write_ordered(spark, left, lsrc, n_files)
    _write_ordered(spark, right, rsrc, n_files)
    schema = spark.read.parquet(lsrc).schema
    n_keys = left.select("dev").distinct().count()
    n_left, n_right = left.count(), right.count()

    def stream(src):
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)  # one time slab per trigger
            .option("latestFirst", "false")
            .parquet(src)
        )

    joined = stream_interval_join(
        stream(lsrc), stream(rsrc), by=["dev"], upper_seconds=600,
        watermark="10 minutes",
    )
    t0 = time.perf_counter()
    q = (
        joined.writeStream.format("noop")
        .outputMode("append")
        .option("checkpointLocation", os.path.join(tmp, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(3600)
    wall = time.perf_counter() - t0
    progresses = [json.loads(p.json) for p in q.recentProgress]
    q.stop()
    trig_ms = [
        p["durationMs"]["triggerExecution"]
        for p in progresses
        if p.get("numInputRows", 0) > 0
    ]
    state_rows = max(
        (so["numRowsTotal"] for p in progresses for so in p.get("stateOperators", [])),
        default=0,
    )
    state_bytes = max(
        (
            so.get("memoryUsedBytes", 0)
            for p in progresses
            for so in p.get("stateOperators", [])
        ),
        default=0,
    )
    # batch twin parity: the identical operator call on the static
    # frames must produce the identical row count
    batch_rows = stream_interval_join(
        spark.read.parquet(lsrc), spark.read.parquet(rsrc),
        by=["dev"], upper_seconds=600, watermark="10 minutes",
    ).count()
    stream_rows = sum(p.get("sink", {}).get("numOutputRows", 0) for p in progresses)
    shutil.rmtree(tmp, ignore_errors=True)
    return {
        "left_rows": n_left,
        "right_rows": n_right,
        "keys": n_keys,
        "wall_s": round(wall, 2),
        "max_trigger_ms": max(trig_ms, default=0),
        "state_rows_max": state_rows,
        "state_bytes_max": state_bytes,
        "state_rows_per_key": round(state_rows / max(n_keys, 1), 3),
        "out_rows_stream": stream_rows,
        "out_rows_batch": batch_rows,
        "parity": stream_rows == batch_rows,
    }


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=os.path.join(repo, "STREAMING_JOIN_SCALE.json"))
    ap.add_argument("--mults", type=int, nargs="*", default=[10, 100])
    args = ap.parse_args()

    from ecollector_spark.session import get_spark

    spark = get_spark("streaming_join_scale")
    ladder = [("1x", args.base)]
    for mult in args.mults:
        d = os.path.join(tempfile.gettempdir(), f"ec_ts_scale_x{mult}")
        build_scaled(spark, args.base, d, mult)  # reuses the ts ladder dirs
        ladder.append((f"{mult}x", d))

    out = {"note": __doc__.split("Usage:")[0].strip(), "rungs": {}}
    for label, d in ladder:
        rec = run_rung(spark, d, label)
        out["rungs"][label] = rec
        print(label, rec, flush=True)

    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
