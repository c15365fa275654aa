"""Materialize the persistent sf1 bench rung (VERDICT r12 #2).

The sf0.1 bench is fixed-cost saturated after the r12 cuts (8-core ≈
32-core), so data-path claims need a rung where per-row work dominates.
This builds a 10x-of-sf0.1 directory with the SAME table names bench.py
reads, via the ladder machinery `tools/ts_scale_probe.build_scaled`
(fact tables replicated under offset key ranges, dimensions symlinked):

    /root/sfdata/sf1       plain x10 replication of the 5 fact tables
                           (events, documents, embeddings, lineitem,
                           orders). NOTE the documented ladder artifact:
                           plain doc replication makes every base doc a
                           10-member exact-dup group, so pair-emitting
                           dedup output grows ~C(10,2)x, not 10x — read
                           dedup numbers at this rung as an upper bound.
    /root/sfdata/sf1salt   documents replicated with per-replica token
                           salting (true pairs grow linearly — what a
                           real 10x corpus does); everything else
                           symlinks the plain rung's tables. Use for
                           dedup-family A/Bs.

Usage: python tools/make_sf1.py [--root /root/sfdata]
Then:  SPARK_GRAFT_SF_DIR=/root/sfdata/sf1 SPARK_GRAFT_SCALE_PROBE=0 \
       SPARK_GRAFT_BENCH_DETAIL=/tmp/bench_detail_sf1.json python bench.py
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.ts_scale_probe import HEADLINE_TABLES, build_scaled  # noqa: E402

BASE = "/root/testdata/sf0.1"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/root/sfdata")
    ap.add_argument("--base", default=BASE)
    ap.add_argument("--replicas", type=int, default=10)
    args = ap.parse_args()

    from ecollector_spark.session import get_spark

    spark = get_spark("make-sf1")
    plain = os.path.join(args.root, "sf1")
    salted = os.path.join(args.root, "sf1salt")
    build_scaled(spark, args.base, plain, args.replicas, set(HEADLINE_TABLES))
    # the salted rung replicates ONLY documents (salted, from the base
    # corpus); every other table symlinks the PLAIN rung so fact sizes
    # match across the two
    os.makedirs(salted, exist_ok=True)
    for name in os.listdir(plain):
        src, dst = os.path.join(plain, name), os.path.join(salted, name)
        if name != "documents.parquet" and not os.path.exists(dst):
            os.symlink(src, dst)
    build_scaled(spark, args.base, salted, args.replicas, {"documents"}, salt_docs=True)
    for d in (plain, salted):
        n = spark.read.parquet(os.path.join(d, "events.parquet")).count()
        nd = spark.read.parquet(os.path.join(d, "documents.parquet")).count()
        print(f"{d}: events={n} documents={nd}")


if __name__ == "__main__":
    main()
