"""Minhash verify under real executors: the direct experiment SCALE §r8c
needs (VERDICT r8 #3).

r8 attributed the minhash 1000x wall exponent (>1.2 in every arm) to
one-box I/O volume, with only the 2-executor BENCH tax as indirect
evidence. This harness runs the salted 100x -> 1000x rung in ONE session
per master config — ``local[32]`` vs ``local-cluster[2,16,24576]`` (and
optionally ``local-cluster[4,8,12288]``) — with a FIXED arm order
(hybrid, exact) at each rung so page-cache position bias is identical
across configs, and the parquet inputs pre-warmed into the page cache
before any timing. Writes one JSON per config; tools/run summarizes the
top-decade exponent log10(w_1000x / w_100x) per arm per config.

Interpretation contract (stated before running): if the local-cluster
exponent drops materially below the single-JVM exponent, the per-node-
volume explanation gains direct evidence; if it does not, the residual
superlinearity is NOT divided by adding executor processes on one box
(both configs share the same NVMe + page cache) and the hypothesis needs
the distinct-device evidence a real cluster would give.

Usage:
    SPARK_GRAFT_MASTER='local-cluster[2,16,24576]' \
        python tools/minhash_cluster_ab.py --out /tmp/MINHASH_CLUSTER_x.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _prewarm(d: str) -> int:
    total = 0
    for root, _, files in os.walk(d):
        for fn in files:
            with open(os.path.join(root, fn), "rb") as f:
                while True:
                    b = f.read(1 << 22)
                    if not b:
                        break
                    total += len(b)
    return total


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--rungs",
        default="/tmp/ec_headline_salted_scale_x100,/tmp/ec_headline_salted_scale_x1000",
    )
    ap.add_argument("--arms", default="hybrid,exact")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    from ecollector_spark.datapipe.dedup import minhash_lsh_pairs
    from ecollector_spark.driver_queries.datapipe import dedup_corpus
    from ecollector_spark.session import get_spark

    spark = get_spark("minhash_cluster_ab")
    master = spark.conf.get("spark.master")
    from tools.weather import wait_for_quiet

    # VERDICT r10 #3: A/B rungs from a loaded box are weather-fragile
    out = {"master": master, "weather_guard": wait_for_quiet(), "rungs": {}}
    for d in args.rungs.split(","):
        warmed = _prewarm(d)
        rung = {"prewarmed_bytes": warmed, "arms": {}}
        docs_n = None
        for mode in args.arms.split(","):
            docs = dedup_corpus(spark, d)
            if docs_n is None:
                docs_n = docs.count()
            t0 = time.perf_counter()
            n = minhash_lsh_pairs(docs, verify=mode).count()
            wall = time.perf_counter() - t0
            rung["arms"][mode] = {"wall_s": round(wall, 1), "pairs": n}
            print(master, os.path.basename(d), mode, round(wall, 1), "s,",
                  n, "pairs", flush=True)
        rung["docs"] = docs_n
        out["rungs"][os.path.basename(d)] = rung
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
