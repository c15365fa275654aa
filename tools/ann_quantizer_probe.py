"""Scaled-quantizer IVF probe (r7, the ANN half of VERDICT r6 "What's
missing" #4): the gate's IVF config (8 centroids, nprobe=2) is a
correctness configuration — at a fixed centroid count the probe scans
nprobe/n_centroids = 1/4 of the corpus and therefore grows LINEARLY
with it. The 100 TB design claim is different: centroid count scales
with the corpus (k ~ sqrt(N) in the IVF literature), so the probed
fraction shrinks and per-query cost stays ~flat. This probe measures
that claim directly on the top ladder rung: build the index at several
centroid counts, then time the same nprobe=2 top-10 probe against
each. Expected: probe wall ~ nprobe/k, build wall ~ k (one
broadcast-argmin scan per Lloyd step with a k-wide centroid array).

Usage: python tools/ann_quantizer_probe.py [--dir /tmp/ec_ts_scale_x10000]
           [--centroids 8,64] [--runs 3] [--out ANN_QUANTIZER.json]

Writes per-config {build_s, probe_s_median, probed_rows, total_rows}.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/ec_ts_scale_x10000")
    ap.add_argument("--centroids", default="8,64")
    ap.add_argument(
        "--auto",
        action="store_true",
        help=(
            "r8 zero-knob mode (VERDICT r7 #7): build with "
            "n_centroids=None (k ~= sqrt(N) sized at build time, recorded "
            "in the sidecar) and probe with nprobe=None (the sidecar's "
            "recorded default) — measures the flat-per-query-cost claim "
            "with no hand-set constants at all"
        ),
    )
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--out", default="ANN_QUANTIZER.json")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from ecollector_spark.datapipe import similarity
    from ecollector_spark.session import get_spark

    spark = get_spark("ann_quantizer")
    emb = spark.read.parquet(os.path.join(args.dir, "embeddings.parquet"))
    total = emb.count()
    row = (
        emb.where(F.col("vec_id") == 0)
        .select(F.col("embedding").cast("array<double>").alias("v"))
        .first()
    )
    qv = list(row["v"])

    out = {
        "note": (
            "IVF probe cost vs quantizer size on one ladder rung "
            f"({total} vectors): same nprobe=2 top-10 query against "
            "indexes built with increasing centroid counts — the probed "
            "fraction (nprobe/k) is the knob that keeps per-query cost "
            "flat as the corpus grows, while build cost grows with k "
            "(one broadcast-argmin scan per Lloyd step). probed_rows is "
            "the actual row count of the pruned partitions."
        ),
        "total_rows": total,
        "configs": {},
    }
    if args.auto:
        configs = [("auto", None)]
    else:
        configs = [(str(c), int(c)) for c in args.centroids.split(",")]
    for label, k in configs:
        idx = os.path.join(
            os.path.dirname(args.dir.rstrip("/")), f"ec_ann_quant_{label}_{total}"
        )
        if os.path.isdir(idx):
            shutil.rmtree(idx)
        t0 = time.perf_counter()
        similarity.ivf_build(emb, idx, n_centroids=k, n_iter=2)
        build_s = time.perf_counter() - t0
        with open(os.path.join(idx, "stats.json")) as f:
            sidecar = json.load(f)
        nprobe_arg = None if args.auto else 2
        eff_nprobe = sidecar.get("default_nprobe", 2) if args.auto else 2
        ts, probed = [], None
        for _ in range(args.runs):
            t0 = time.perf_counter()
            res = similarity.ivf_topk_indexed(
                spark, idx, qv, k=10, nprobe=nprobe_arg, exclude_vec_id=0
            )
            res.write.format("noop").mode("overwrite").save()
            ts.append(time.perf_counter() - t0)
        cids = similarity.ivf_probe_cids(spark, idx, qv, nprobe=eff_nprobe)
        probed = (
            spark.read.parquet(os.path.join(idx, "assignments"))
            .where(F.col("cid").isin(cids))
            .count()
        )
        out["configs"][label] = {
            "n_centroids": sidecar.get("n_centroids"),
            "nprobe": eff_nprobe,
            "build_s": round(build_s, 3),
            "probe_s_median": round(statistics.median(ts), 3),
            "probe_runs": [round(t, 3) for t in ts],
            "probed_rows": probed,
            "probed_fraction": round(probed / total, 4),
        }
        print(label, out["configs"][label], flush=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
