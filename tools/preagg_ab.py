"""Same-session-family A/B for the preagg 1000x wall (r7 VERDICT #1
follow-through): cross-round absolute comparisons on this container are
unusable (measured repeatedly), so the engine-default AQE wide-start is
judged against the hand-tuned shuffle knob and AQE variants in
back-to-back processes on the same machine within minutes.

    python tools/preagg_ab.py <arm> [runs]

Arms:
  default   — get_spark() as shipped (AQE wide-start, initialPartitionNum=512)
  tuned256  — the r6 hand knob: fixed spark.sql.shuffle.partitions=256
  advisory  — wide-start + coalescePartitions.parallelismFirst=false
              (coalesce to the 64 MB advisory target -> partition count
              proportional to shuffle bytes, not pinned to core count)

Prints one JSON line with the median."""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RUNG = "/tmp/ec_headline_scale_x1000"


def main() -> None:
    arm = sys.argv[1]
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    query = sys.argv[3] if len(sys.argv) > 3 else "preagg_30s_directives"

    from ecollector_spark import driver_queries
    from ecollector_spark.session import get_spark

    driver_queries.load_all()
    if arm == "default":
        spark = get_spark("ab_default")
    elif arm == "tuned256":
        spark = get_spark("ab_tuned256", shuffle_partitions=256)
    elif arm == "advisory":
        spark = get_spark(
            "ab_advisory",
            extra_conf={
                "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false"
            },
        )
    else:
        raise SystemExit(f"unknown arm {arm!r}")

    fn = {**driver_queries.QUERIES, **driver_queries.SHELVED_QUERIES}[query]
    fn(spark, RUNG).write.format("noop").mode("overwrite").save()  # warm
    ts = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn(spark, RUNG).write.format("noop").mode("overwrite").save()
        ts.append(round(time.perf_counter() - t0, 3))
    print(
        json.dumps(
            {
                "arm": arm,
                "query": query,
                "runs": ts,
                "median": round(statistics.median(ts), 3),
                "load1": round(os.getloadavg()[0], 2),
            }
        )
    )


if __name__ == "__main__":
    main()
