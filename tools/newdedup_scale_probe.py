"""Scale rungs for the r9 dedup additions: exact duplicated-span
removal (``dedup.dedup_ngram_spans``) and SemDeDup
(``similarity.semantic_dedup``).

Protocol matches the other ladders (medians of --runs, noop sink,
local[32], exponent = log-slope over the TOP decade), with the planted
structure each operator needs:

- **spans**: salted documents ladder (cross-replica text cannot dup) +
  the gate's 5-token promo span injected into doc_id % 4 groups at
  probe time, so the dup-shingle set grows linearly with the corpus and
  the covered-fraction stays constant across rungs. Recorded: surviving
  docs per rung (should track the corpus linearly).
- **semdedup**: salted embeddings ladder + the EMB_DEDUP planting (1%
  of rows re-appear id-offset with one coordinate nudged 1%, cosine
  ~0.9997), threshold 0.9 (the null is ~7 sigma away), and the
  operator's documented scale knob applied per rung:
  ``n_centroids = default_n_centroids(N)`` (k ~ sqrt(N)), so per-cluster
  pairwise work is ~N/k and total comparisons ~N^1.5 worst-case.
  Recorded: n_centroids, survivors (should be ~N minus the planted
  dups), wall.

Usage: python tools/newdedup_scale_probe.py [--mults 10,100] [--runs 2]
           [--out NEWDEDUP_SCALE.json]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--mults", default="10,100")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--out", default="NEWDEDUP_SCALE.json")
    ap.add_argument("--ops", default="spans,semdedup")
    args = ap.parse_args()

    import tempfile

    from pyspark.sql import functions as F

    from ecollector_spark.datapipe import dedup, similarity
    from ecollector_spark.session import get_spark
    from tools.ts_scale_probe import build_scaled

    spark = get_spark("newdedup_scale")
    ops = {o.strip() for o in args.ops.split(",") if o.strip()}
    ladder = [("1x", args.base)]
    for mult in [int(m) for m in args.mults.split(",") if m.strip()]:
        d = os.path.join(tempfile.gettempdir(), f"ec_newdedup_scale_x{mult}")
        build_scaled(
            spark,
            args.base,
            d,
            mult,
            tables={"documents", "embeddings"},
            salt_docs=True,
            salt_vecs=True,
        )
        ladder.append((f"{mult}x", d))

    from tools.weather import wait_for_quiet

    out = {
        "note": __doc__.split("Usage:")[0].strip(),
        # VERDICT r10 #3: exponents from a loaded box are weather-fragile
        "weather_guard": wait_for_quiet(),
        "rungs": {},
    }

    def timed(df):
        ts = []
        for _ in range(args.runs):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            ts.append(time.perf_counter() - t0)
        return round(statistics.median(ts), 3), [round(t, 3) for t in ts]

    for label, d in ladder:
        rec: dict = {}
        if "spans" in ops:
            docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
            words = F.split("text", " ")
            injected = F.concat_ws(
                " ",
                F.array_join(F.slice(words, 1, 6), " "),
                F.concat(
                    F.lit("promo promo code alpha "),
                    (F.col("doc_id") % 4).cast("string"),
                ),
                F.array_join(F.slice(words, 7, 1 << 20), " "),
            )
            d2 = docs.select("doc_id", injected.alias("text"))
            n_docs = d2.count()
            res = dedup.dedup_ngram_spans(d2, k=5, min_dups=2)
            wall, runs = timed(res)
            rec["spans"] = {
                "docs": n_docs,
                "wall_s_median": wall,
                "runs": runs,
                "survivor_docs": res.count(),
            }
        if "semdedup" in ops:
            emb = spark.read.parquet(os.path.join(d, "embeddings.parquet"))
            planted = emb.where(F.pmod(F.col("vec_id"), 100) == 7).select(
                (F.col("vec_id") + 50_000_000).alias("vec_id"),
                F.transform(
                    "embedding",
                    lambda x, i: F.when(i == 0, x * 1.01).otherwise(x),
                )
                .cast("array<float>")
                .alias("embedding"),
            )
            corpus = emb.select("vec_id", "embedding").unionByName(planted)
            n = corpus.count()
            k = similarity.default_n_centroids(n)
            res = similarity.semantic_dedup(
                corpus, threshold=0.9, n_centroids=k, n_iter=2
            )
            wall, runs = timed(res)
            rec["semdedup"] = {
                "rows": n,
                "n_centroids": k,
                "wall_s_median": wall,
                "runs": runs,
                "survivors": res.count(),
            }
        out["rungs"][label] = rec
        print(label, json.dumps(rec), flush=True)

    labels = [lb for lb, _ in ladder]
    if len(labels) >= 2:
        top, prev = labels[-1], labels[-2]
        ratio = int(top[:-1]) / int(prev[:-1])
        for op in ("spans", "semdedup"):
            if op in out["rungs"].get(top, {}) and op in out["rungs"].get(prev, {}):
                w1 = out["rungs"][prev][op]["wall_s_median"]
                w2 = out["rungs"][top][op]["wall_s_median"]
                out.setdefault("exponent_top_decade", {})[op] = round(
                    math.log(w2 / w1) / math.log(ratio), 3
                )
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", args.out)
    if "exponent_top_decade" in out:
        print(json.dumps(out["exponent_top_decade"]))


if __name__ == "__main__":
    main()
