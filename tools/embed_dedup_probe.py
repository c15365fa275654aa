"""Salted-vector scale rung for the pair-emitting embedding near-dup
operator (r7, the ANN/dedup half of VERDICT r6 "What's missing" #4).

Two ladder artifacts make the naive measurement wrong, and this probe
avoids both:

- **Plain replication** makes every base vector an r-member duplicate
  group, so the CORRECT pair output grows as C(r, 2) — the probe salts
  each replica with a diagonal +/-1 sign flip instead (orthogonal:
  within-replica cosines, and so the planted near-dup structure, are
  preserved EXACTLY; cross-replica cosines scatter to ~N(0, 1/dim)).
- **A fixed bucket width** is a correctness config, not a scale config:
  at ``bits`` hyperplane bits the within-bucket candidate term is
  N^2/2^bits, so the operator's documented knob is bits ~ log2(N)
  (module docstring: "bits up for bigger corpora"). The probe scales
  ``bits = max(8, ceil(log2(N)) - 3)`` per rung — expected bucket size
  ~8 at every rung, candidates ~linear — and records the candidate
  count so the claim is measured, not asserted.

Usage: python tools/embed_dedup_probe.py [--mults 1000,10000] [--runs 2]
           [--out EMB_DEDUP_SCALE.json]
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
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--mults", default="1000,10000")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--threshold", type=float, default=0.3)
    ap.add_argument("--out", default="EMB_DEDUP_SCALE.json")
    args = ap.parse_args()

    import tempfile

    from pyspark.sql import functions as F

    from ecollector_spark.datapipe import similarity
    from ecollector_spark.session import get_spark
    from tools.ts_scale_probe import build_scaled

    spark = get_spark("embed_dedup_scale")
    ladder = [("1x", args.base)]
    for mult in [int(m) for m in args.mults.split(",") if m.strip()]:
        d = os.path.join(tempfile.gettempdir(), f"ec_emb_salted_scale_x{mult}")
        build_scaled(
            spark, args.base, d, mult, tables={"embeddings"}, salt_vecs=True
        )
        ladder.append((f"{mult}x", d))

    out = {
        "note": (
            "wall-time growth of embedding_near_dup_pairs across a salted "
            "embeddings ladder (per-replica orthogonal sign flip: "
            "within-replica near-dup structure exact, cross-replica "
            "cosines ~N(0,1/64)); bits scales as ceil(log2(N))-3 per the "
            "operator's documented knob, so expected bucket size ~8 at "
            "every rung; exponent = log-slope over the TOP decade; "
            "candidates and output pairs recorded to verify ~linear "
            "candidate growth; medians of --runs runs, noop sink, "
            "local[32]"
        ),
        "rungs": {},
    }
    records = []
    for label, d in ladder:
        emb = spark.read.parquet(os.path.join(d, "embeddings.parquet"))
        # the synthetic table has no high-cosine structure (measured: all
        # base pairs sit in cosine [0.3, 0.5), and ANY threshold in that
        # band is inside the 64-dim null tail at 2M+ rows — 0.3 is 2.4
        # sigma of N(0, 1/64), so ~2e12 cross pairs swamp the true pairs
        # 7.5x at 1000x, measured). So the probe PLANTS its near-dups:
        # 1% of rows re-appear under an offset id with one coordinate
        # nudged 1% (cosine ~0.9997). The recorded EMB_DEDUP_SCALE.json
        # runs used the default --threshold 0.3: the planted pairs
        # dominate and a <0.1% chance-pair tail leaks in (20001/20000 at
        # 2M, 200180/200000 at 20M — tolerated; the rung measures scaling
        # of candidates/wall, not recall). --threshold 0.9 makes the
        # output exactly the planted pairs (null is ~7 sigma there).
        planted = emb.where(F.pmod(F.col("vec_id"), 100) == 7).select(
            (F.col("vec_id") + 5_000_000).alias("vec_id"),
            F.transform(
                "embedding",
                lambda x, i: F.when(i == 0, x * 1.01).otherwise(x),
            )
            .cast("array<float>")
            .alias("embedding"),
        )
        corpus = emb.select("vec_id", "embedding").unionByName(planted)
        n = corpus.count()
        bits = max(8, math.ceil(math.log2(n)) - 3)
        pairs_df = similarity.embedding_near_dup_pairs(
            corpus, threshold=args.threshold, bits=bits, tables=2
        )
        ts = []
        for _ in range(args.runs):
            t0 = time.perf_counter()
            pairs_df.write.format("noop").mode("overwrite").save()
            ts.append(time.perf_counter() - t0)
        base = corpus.select(
            "vec_id", F.col("embedding").cast("array<double>").alias("_v")
        )
        cand = similarity.lsh_candidate_pairs(
            base, similarity.hyperplanes(64, bits, 2)
        ).count()
        pairs = pairs_df.count()
        rec = {
            "rows": n,
            "bits": bits,
            "wall_s_median": round(statistics.median(ts), 3),
            "runs": [round(t, 3) for t in ts],
            "candidates": cand,
            "candidates_per_row": round(cand / n, 3),
            "pairs": pairs,
        }
        out["rungs"][label] = rec
        records.append((label, n, statistics.median(ts)))
        print(label, rec, flush=True)
    if len(records) >= 2:
        (_, n_lo, t_lo), (_, n_hi, t_hi) = records[-2], records[-1]
        out["exponent_top_decade"] = round(
            math.log(max(t_hi, 1e-9) / max(t_lo, 1e-9)) / math.log(n_hi / n_lo), 3
        )
        out["top_decade"] = [records[-2][0], records[-1][0]]
    with open(os.path.join(repo, args.out), "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
