"""Measure TOTAL shuffle write bytes (and wall time) of one registered
query via the Spark event log — the before/after instrument for
shuffle-payload changes (r7: int64 minhash signatures vs the string
form; VERDICT r6 #2 asks for measured bytes, not an argument).

    python tools/shuffle_bytes_probe.py <query> <sf_dir> [runs]

Prints one JSON line: {"query", "sf_dir", "shuffle_write_bytes",
"wall_sec_median", ...}. Bytes come from summing the
``internal.metrics.shuffle.write.bytesWritten`` accumulable over every
completed stage of the LAST run (byte counts are deterministic across
runs; wall time is the median)."""

from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    query = sys.argv[1]
    sf_dir = sys.argv[2]
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 1

    log_dir = tempfile.mkdtemp(prefix="ec_eventlog_")
    from ecollector_spark import driver_queries
    from ecollector_spark.session import get_spark

    driver_queries.load_all()
    spark = get_spark(
        "shuffle_probe",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{log_dir}",
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    fn = {**driver_queries.QUERIES, **driver_queries.SHELVED_QUERIES}[query]
    ts = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        ts.append(time.perf_counter() - t0)
    app_id = spark.sparkContext.applicationId
    spark.stop()  # flush the event log

    total = 0
    rows = 0
    path = os.path.join(log_dir, app_id)
    if not os.path.isfile(path):
        # .inprogress suffix, or the rolling-v2 directory layout
        # (eventlog_v2_<appid>/events_N_<appid>); compression is off so
        # every candidate is plain JSON-lines
        cands = []
        for root, _dirs, files in os.walk(log_dir):
            cands += [
                os.path.join(root, f)
                for f in files
                if app_id in f and not f.startswith("appstatus")
            ]
        if not cands:
            raise SystemExit(f"no event log for {app_id} under {log_dir}")
        path = cands[0]
    with open(path) as f:
        for line in f:
            if '"SparkListenerStageCompleted"' not in line:
                continue
            ev = json.loads(line)
            for acc in ev.get("Stage Info", {}).get("Accumulables", []):
                if acc.get("Name") == "internal.metrics.shuffle.write.bytesWritten":
                    total += int(acc.get("Value", 0))
                elif acc.get("Name") == "internal.metrics.shuffle.write.recordsWritten":
                    rows += int(acc.get("Value", 0))
    print(
        json.dumps(
            {
                "query": query,
                "sf_dir": sf_dir,
                "shuffle_write_bytes": total,
                "shuffle_write_records": rows,
                "wall_sec_median": round(statistics.median(ts), 3),
                "runs": runs,
            }
        )
    )


if __name__ == "__main__":
    main()
