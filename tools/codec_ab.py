"""Shuffle-codec A/B on the spill-bound minhash rung (r7 follow-up to
the 1.253 exponent): the minhash 1000x residual is single-box spill
BANDWIDTH on the shingle-verify shuffle — an IO-bound regime where a
denser codec (zstd) trades cheap CPU for the scarce resource. lz4 is
Spark's default; this measures whether zstd moves the wall.

Interleaved same-session-protocol A/B: each arm runs in its OWN process
(the codec is session-fixed), alternating lz4/zstd so ambient drift
lands on both arms equally. One timed run per process, 48g heap, engine
defaults otherwise.

Usage: python tools/codec_ab.py [--dir /tmp/ec_headline_salted_scale_x1000]
           [--rounds 2] [--query dedup_minhash_lsh]
With --worker <codec> it runs one arm and prints the wall (internal).
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def worker(codec: str, query: str, data_dir: str) -> None:
    from ecollector_spark import driver_queries
    from ecollector_spark.session import get_spark

    driver_queries.load_all()
    fn = {**driver_queries.QUERIES, **driver_queries.SHELVED_QUERIES}[query]
    spark = get_spark(
        f"codec_ab_{codec}", extra_conf={"spark.io.compression.codec": codec}
    )
    t0 = time.perf_counter()
    fn(spark, data_dir).write.format("noop").mode("overwrite").save()
    print(f"WALL {codec} {time.perf_counter() - t0:.2f}", flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/ec_headline_salted_scale_x1000")
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--query", default="dedup_minhash_lsh")
    ap.add_argument("--worker", default=None)
    ap.add_argument("--out", default="CODEC_AB.json")
    args = ap.parse_args()
    if args.worker:
        worker(args.worker, args.query, args.dir)
        return

    walls: dict[str, list[float]] = {"lz4": [], "zstd": []}
    env = {**os.environ, "SPARK_GRAFT_DRIVER_MEM": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g")}
    for r in range(args.rounds):
        for codec in ("lz4", "zstd"):
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--worker", codec,
                 "--query", args.query, "--dir", args.dir],
                capture_output=True, text=True, env=env,
            )
            for line in p.stdout.splitlines():
                if line.startswith("WALL "):
                    walls[codec].append(float(line.split()[2]))
                    print(f"round {r} {codec}: {line.split()[2]} s", flush=True)
            if p.returncode != 0:
                print(p.stderr[-2000:], file=sys.stderr)
                sys.exit(1)
    out = {
        "note": (
            f"interleaved shuffle-codec A/B of {args.query} on {args.dir} "
            "(one process per arm, alternating, engine defaults + 48g heap); "
            "medians decide"
        ),
        "walls": walls,
        "median": {c: round(statistics.median(w), 2) for c, w in walls.items() if w},
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["median"]))


if __name__ == "__main__":
    main()
