"""Flat vs hierarchical quantizer crossover (r11 — VERDICT r10 #6).

SEMDEDUP_SCALE.json showed the two-level quantizer beating the flat one
3.9x already at k=512, with the cost being the flat path's in-row
argmin over a broadcast k-array (every corpus row folds a k-element
struct array), not the broadcast itself. This probe measures WHERE the
crossover actually sits so `flat_cap` can be a measured default rather
than the broadcast-safety ceiling (4096):

- one corpus (100x-salted sf0.1 embeddings, ~200k vectors, dim 64)
- a k sweep; per k, a POSITION-MATCHED interleaved A/B — arms alternate
  F,H,F,H so ambient drift hits both arms equally
- each arm = full train + assign (ivf_assignments vs
  hierarchical_assignments), materialized to the noop sink

Writes QUANTIZER_CROSSOVER.json: per-k medians/runs for both arms, the
ratio, and the smallest k where hier wins (the measured crossover).
The weather guard annotates a loaded capture instead of hiding it.

Usage: python tools/quantizer_crossover_ab.py [--mult 100] [--runs 2]
           [--ks 16,64,128,256,512] [--out QUANTIZER_CROSSOVER.json]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--mult", type=int, default=100)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--ks", default="16,64,128,256,512")
    ap.add_argument("--out", default="QUANTIZER_CROSSOVER.json")
    args = ap.parse_args()

    from ecollector_spark.datapipe import similarity
    from ecollector_spark.session import get_spark
    from tools.ts_scale_probe import build_scaled
    from tools.weather import wait_for_quiet

    spark = get_spark("quantizer_crossover_ab")
    d = os.path.join(tempfile.gettempdir(), f"ec_newdedup_scale_x{args.mult}")
    build_scaled(
        spark, args.base, d, args.mult,
        tables={"documents", "embeddings"}, salt_docs=True, salt_vecs=True,
    )
    emb = spark.read.parquet(os.path.join(d, "embeddings.parquet"))
    n = emb.count()

    out = {
        "note": __doc__.split("Usage:")[0].strip(),
        "rows": n,
        "weather_guard": wait_for_quiet(),
        "ks": {},
    }

    def run(path: str, k: int) -> float:
        t0 = time.perf_counter()
        if path == "flat":
            df = similarity.ivf_assignments(emb, n_centroids=k, n_iter=2)
        else:
            df = similarity.hierarchical_assignments(emb, k, n_iter=2)
        df.write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    crossover = None
    for k in [int(x) for x in args.ks.split(",") if x.strip()]:
        arms: dict[str, list[float]] = {"flat": [], "hier": []}
        for _ in range(args.runs):  # position-matched: F,H per iteration
            arms["flat"].append(run("flat", k))
            arms["hier"].append(run("hier", k))
        rec = {
            "flat_s": round(statistics.median(arms["flat"]), 3),
            "hier_s": round(statistics.median(arms["hier"]), 3),
            "flat_runs": arms["flat"],
            "hier_runs": arms["hier"],
        }
        rec["hier_over_flat"] = round(rec["hier_s"] / rec["flat_s"], 3)
        out["ks"][str(k)] = rec
        if crossover is None and rec["hier_s"] < rec["flat_s"]:
            crossover = k
        print(k, json.dumps(rec), flush=True)

    out["crossover_k"] = crossover
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", args.out)
    print(json.dumps({"crossover_k": crossover}))


if __name__ == "__main__":
    main()
