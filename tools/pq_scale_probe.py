"""PQ compression probe (r11): what ADC buys at the 100x rung.

Over the 100x-salted embeddings corpus (~200k vectors, dim 64):

- train m=8 x 256-centroid codebooks (the classic PQ8 configuration —
  8 code BYTES per vector), encode the corpus, materialize BOTH tables
  to parquet and record their on-disk sizes (the honest compression
  number, after parquet's own encoding);
- time the exact L2 top-10 over raw vectors vs the ADC top-10 over
  codes (medians of --runs, noop-free collect of 10 rows);
- record recall@10 of raw ADC against the exact L2 ranking, AND of the
  production two-stage shape — ADC shortlist (top-100 codes) -> exact
  re-rank of just those rows -> top-10. Raw-ADC recall is honestly LOW
  on this synthetic corpus (i.i.d. random embeddings concentrate
  distances, so quantized ranks shuffle — real embedding spaces
  cluster and fare far better); the shortlist+re-rank number is the
  one a deployment ships.

Writes PQ_SCALE.json with the weather-guard record.

Usage: python tools/pq_scale_probe.py [--mult 100] [--runs 3]
           [--m 8] [--nbits 8] [--out PQ_SCALE.json]
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


def _du(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--mult", type=int, default=100)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--m", type=int, default=8)
    ap.add_argument("--nbits", type=int, default=8)
    ap.add_argument("--out", default="PQ_SCALE.json")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from ecollector_spark.datapipe import similarity
    from ecollector_spark.session import get_spark
    from tools.ts_scale_probe import build_scaled
    from tools.weather import wait_for_quiet

    spark = get_spark("pq_scale_probe")
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
        "m": args.m,
        "nbits": args.nbits,
        "weather_guard": wait_for_quiet(),
    }

    t0 = time.perf_counter()
    cb = similarity.pq_train(emb, m=args.m, nbits=args.nbits, n_iter=2)
    cb = cb.localCheckpoint()  # train once; probe reuses
    out["train_wall_s"] = round(time.perf_counter() - t0, 2)

    tmp = tempfile.mkdtemp(prefix="ec_pq_probe_")
    raw_dir = os.path.join(tmp, "raw")
    codes_dir = os.path.join(tmp, "codes")
    emb.select(
        "vec_id", F.col("embedding").cast("array<float>").alias("embedding")
    ).write.mode("overwrite").parquet(raw_dir)
    t0 = time.perf_counter()
    similarity.pq_encode(emb, cb).write.mode("overwrite").parquet(codes_dir)
    out["encode_wall_s"] = round(time.perf_counter() - t0, 2)
    out["raw_bytes"] = _du(raw_dir)
    out["codes_bytes"] = _du(codes_dir)
    out["compression"] = round(out["raw_bytes"] / max(1, out["codes_bytes"]), 2)

    qv = [
        float(x)
        for x in emb.where(F.col("vec_id") == 42)
        .select(F.col("embedding").cast("array<double>"))
        .first()[0]
    ]
    raw = spark.read.parquet(raw_dir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    codes = spark.read.parquet(codes_dir)
    qlit = F.array(*[F.lit(x) for x in qv])
    l2 = F.aggregate(
        F.zip_with(F.col("v"), qlit, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )

    def exact():
        return (
            raw.where(F.col("vec_id") != 42)
            .select("vec_id", l2.alias("d2"))
            .orderBy("d2", "vec_id")
            .limit(10)
            .collect()
        )

    def adc():
        return similarity.pq_topk(codes, cb, qv, k=10, exclude_vec_id=42).collect()

    def adc_rerank():
        # the production two-stage: ADC shortlist, exact re-rank of it
        short = similarity.pq_topk(
            codes, cb, qv, k=100, exclude_vec_id=42
        ).select("vec_id")
        return (
            raw.join(short, "vec_id")
            .select("vec_id", l2.alias("d2"))
            .orderBy("d2", "vec_id")
            .limit(10)
            .collect()
        )

    walls: dict[str, list[float]] = {"exact": [], "adc": [], "adc_rerank": []}
    last: dict[str, list] = {}
    for _ in range(args.runs):  # position-matched interleave
        for name, fn in (("exact", exact), ("adc", adc), ("adc_rerank", adc_rerank)):
            t0 = time.perf_counter()
            last[name] = fn()
            walls[name].append(round(time.perf_counter() - t0, 3))
    for name in walls:
        out[f"{name}_topk_s_median"] = round(statistics.median(walls[name]), 3)
        out[f"{name}_runs"] = walls[name]
    exact_ids = {r["vec_id"] for r in last["exact"]}
    out["recall_at_10"] = round(
        len(exact_ids & {r["vec_id"] for r in last["adc"]}) / 10, 2
    )
    out["rerank_recall_at_10"] = round(
        len(exact_ids & {r["vec_id"] for r in last["adc_rerank"]}) / 10, 2
    )

    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", args.out)
    print(json.dumps({k: out[k] for k in (
        "rows", "train_wall_s", "encode_wall_s", "compression",
        "exact_topk_s_median", "adc_topk_s_median",
        "adc_rerank_topk_s_median", "recall_at_10",
        "rerank_recall_at_10")}))


if __name__ == "__main__":
    main()
