"""PQ operating point (r12, VERDICT r11 #1): recall is the product.

The r11 probe (PQ_SCALE.json v1) honestly recorded recall@10 = 0.1
(0.3 re-ranked) — but on an i.i.d. UNIFORM corpus, where distances
concentrate and no ANN method can rank (the curse-of-dimensionality
floor, not a PQ defect). Real embedding spaces cluster. This probe:

1. builds a CLUSTERED evaluation corpus — planted neighborhoods:
   n/members centers (uniform, dim 64), each with `members` points at
   Gaussian noise 0.05 around it, so every query's true neighbors are
   its cluster siblings and ground truth comes from the exact scan;
2. sweeps the composed IVF-PQ probe over (nprobe x shortlist x m)
   against per-query exact top-10, recording raw-ADC recall, re-ranked
   recall, and the IVF pruning ceiling (exact recall within the probed
   cells) so PQ loss and pruning loss are attributed separately;
3. names the cheapest config reaching re-ranked recall@10 >= 0.8 —
   the number ivf_pq_topk(rerank=...)'s docstring quotes;
4. measures the ADC-vs-exact full-scan crossover over a corpus-size
   ladder (same clustered generator, codes via the r12 numpy encode
   engine — bit-identical to the expr path, pytest-pinned), medians of
   interleaved position-matched runs under the weather guard.

Writes PQ_SCALE.json (v2 — keeps the v1 i.i.d. numbers under
`r11_iid_baseline` for the honest contrast).

Usage: python tools/pq_operating_point.py [--n 200000] [--runs 3]
           [--crossover 200000,1000000,3000000] [--out PQ_SCALE.json]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DIM = 64
MEMBERS = 100
NOISE = 0.05
SEED = 7


def clustered_embeddings(spark, n: int, dim: int = DIM):
    """(vec_id, embedding): `n` vectors in n/MEMBERS planted clusters.

    Centers are uniform(-1,1)^dim from a fixed seed; member vec_id
    belongs to cluster vec_id % C and sits at center + NOISE * N(0,1).
    Noise is seeded per Arrow batch (deterministic for a fixed
    partitioning — fine for a probe; the oracle-gated corpora stay the
    closed-form testdata tables)."""
    import numpy as np

    c = max(1, n // MEMBERS)
    centers = np.random.default_rng(SEED).uniform(-1.0, 1.0, (c, dim))

    def op(batches):
        import pandas as pd

        for pdf in batches:
            ids = pdf["id"].to_numpy()
            if len(ids) == 0:
                continue
            rng = np.random.default_rng(SEED * 1_000_003 + int(ids[0]))
            vecs = centers[ids % c] + NOISE * rng.standard_normal(
                (len(ids), dim)
            )
            yield pd.DataFrame({"vec_id": ids, "embedding": list(vecs)})

    return spark.range(n).mapInPandas(
        op, schema="vec_id long, embedding array<double>"
    )


def _exact_topk(raw, qv, k=10, exclude=None):
    from pyspark.sql import functions as F

    qlit = F.array(*[F.lit(float(x)) for x in qv])
    l2 = F.aggregate(
        F.zip_with(F.col("v"), qlit, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    out = raw
    if exclude is not None:
        out = out.where(F.col("vec_id") != exclude)
    return out.select("vec_id", l2.alias("d2")).orderBy("d2", "vec_id").limit(k)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=200_000)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--queries", type=int, default=10)
    ap.add_argument("--crossover", default="200000,1000000,3000000")
    ap.add_argument("--out", default="PQ_SCALE.json")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from ecollector_spark.datapipe import similarity
    from ecollector_spark.session import get_spark
    from tools.weather import wait_for_quiet

    spark = get_spark("pq_operating_point")
    tmp = tempfile.mkdtemp(prefix="ec_pq_op_")
    out: dict = {
        "note": __doc__.split("Usage:")[0].strip(),
        "n_sweep": args.n,
        "dim": DIM,
        "members_per_cluster": MEMBERS,
        "noise": NOISE,
        "weather_guard": wait_for_quiet(),
    }
    try:
        with open("PQ_SCALE.json") as f:
            v1 = json.load(f)
        out["r11_iid_baseline"] = {
            k: v1[k]
            for k in (
                "rows", "m", "nbits", "compression", "recall_at_10",
                "rerank_recall_at_10", "exact_topk_s_median",
                "adc_topk_s_median",
            )
            if k in v1
        }
    except (OSError, json.JSONDecodeError):
        pass

    # ---- corpus + IVF head (shared across the sweep) ----
    emb = clustered_embeddings(spark, args.n)
    raw_dir = os.path.join(tmp, "raw")
    emb.write.mode("overwrite").parquet(raw_dir)
    emb = spark.read.parquet(raw_dir)
    raw = emb.select("vec_id", F.col("embedding").alias("v"))

    n_cells = 64
    e = emb.select("vec_id", F.col("embedding").alias("v"))
    cents = similarity.ivf_centroids(e, n_cells, n_iter=2).localCheckpoint()
    assigned = similarity._assign_to_centroids(e, cents).select(
        "vec_id", "cid"
    )
    asg_dir = os.path.join(tmp, "assigned")
    assigned.write.mode("overwrite").parquet(asg_dir)
    assigned = spark.read.parquet(asg_dir)
    cent_rows = cents.collect()

    # spread queries across clusters
    qids = [i * (args.n // args.queries) + 13 for i in range(args.queries)]
    qvecs = {
        int(r["vec_id"]): [float(x) for x in r["embedding"]]
        for r in emb.where(F.col("vec_id").isin(qids)).collect()
    }
    truth = {
        q: [r["vec_id"] for r in _exact_topk(raw, qvecs[q], 10, q).collect()]
        for q in qids
    }

    # ---- sweep (nprobe x shortlist x m) ----
    sweep = []
    named = None
    for m in (4, 8):
        cb = similarity.pq_train(
            emb.where(F.col("vec_id") < 20_000), m=m, nbits=8, n_iter=2
        ).localCheckpoint()
        codes_dir = os.path.join(tmp, f"codes_m{m}")
        similarity.pq_encode(emb, cb, engine="numpy").write.mode(
            "overwrite"
        ).parquet(codes_dir)
        codes = spark.read.parquet(codes_dir).join(assigned, "vec_id")
        for nprobe in (1, 2, 4):
            # per-query probed cells (driver-side, same tie rule)
            probed = {}
            for q in qids:
                ranked = sorted(
                    (
                        similarity._driver_d2(
                            [float(x) for x in r["cvec"]], qvecs[q]
                        ),
                        r["cid"],
                    )
                    for r in cent_rows
                )
                probed[q] = [cid for _, cid in ranked[:nprobe]]
            # IVF ceiling: exact recall within the probed cells
            ceil_hits = 0
            for q in qids:
                cells = raw.join(
                    assigned.where(F.col("cid").isin(probed[q])), "vec_id"
                )
                got = {
                    r["vec_id"]
                    for r in _exact_topk(cells, qvecs[q], 10, q).collect()
                }
                ceil_hits += len(got & set(truth[q]))
            ceiling = round(ceil_hits / (10 * len(qids)), 3)
            for shortlist in (20, 50, 100):
                adc_hits = rr_hits = 0
                for q in qids:
                    sub = codes.where(F.col("cid").isin(probed[q]))
                    short = similarity.pq_topk(
                        sub, cb, qvecs[q], k=shortlist, exclude_vec_id=q
                    )
                    srows = short.collect()
                    adc_hits += len(
                        {r["vec_id"] for r in srows[:10]} & set(truth[q])
                    )
                    ids = [int(r["vec_id"]) for r in srows]
                    rr = _exact_topk(
                        raw.where(F.col("vec_id").isin(ids)), qvecs[q], 10
                    ).collect()
                    rr_hits += len({r["vec_id"] for r in rr} & set(truth[q]))
                rec = {
                    "m": m,
                    "nprobe": nprobe,
                    "shortlist": shortlist,
                    "ivf_ceiling_recall": ceiling,
                    "adc_recall_at_10": round(adc_hits / (10 * len(qids)), 3),
                    "rerank_recall_at_10": round(
                        rr_hits / (10 * len(qids)), 3
                    ),
                }
                sweep.append(rec)
                print(json.dumps(rec), flush=True)
                if (
                    named is None
                    and rec["rerank_recall_at_10"] >= 0.8
                ):
                    named = rec
    out["sweep"] = sweep
    # cheapest config clearing the bar: smallest probed fraction first,
    # then smallest shortlist, then smallest m (scan bytes)
    clearing = [r for r in sweep if r["rerank_recall_at_10"] >= 0.8]
    if clearing:
        named = sorted(
            clearing, key=lambda r: (r["nprobe"], r["shortlist"], r["m"])
        )[0]
    out["named_config"] = named

    # ---- ADC vs exact full-scan crossover ----
    rungs = [int(x) for x in args.crossover.split(",") if x.strip()]
    cb8 = similarity.pq_train(
        emb.where(F.col("vec_id") < 20_000), m=8, nbits=8, n_iter=2
    ).localCheckpoint()
    cross = []
    for n in rungs:
        rdir = os.path.join(tmp, f"xraw_{n}")
        cdir = os.path.join(tmp, f"xcodes_{n}")
        ce = clustered_embeddings(spark, n)
        ce.select(
            "vec_id", F.col("embedding").cast("array<float>").alias("embedding")
        ).write.mode("overwrite").parquet(rdir)
        t0 = time.perf_counter()
        similarity.pq_encode(ce, cb8, engine="numpy").write.mode(
            "overwrite"
        ).parquet(cdir)
        encode_s = round(time.perf_counter() - t0, 2)
        rraw = spark.read.parquet(rdir).select(
            "vec_id", F.col("embedding").cast("array<double>").alias("v")
        )
        rcodes = spark.read.parquet(cdir)
        qv = qvecs[qids[0]]
        walls = {"exact": [], "adc": []}
        for _ in range(args.runs):  # position-matched interleave
            t0 = time.perf_counter()
            _exact_topk(rraw, qv, 10).collect()
            walls["exact"].append(round(time.perf_counter() - t0, 3))
            t0 = time.perf_counter()
            similarity.pq_topk(rcodes, cb8, qv, k=10).collect()
            walls["adc"].append(round(time.perf_counter() - t0, 3))
        rec = {
            "n": n,
            "encode_numpy_s": encode_s,
            "raw_bytes": _du(rdir),
            "codes_bytes": _du(cdir),
            "exact_s_median": round(statistics.median(walls["exact"]), 3),
            "adc_s_median": round(statistics.median(walls["adc"]), 3),
            "exact_runs": walls["exact"],
            "adc_runs": walls["adc"],
        }
        cross.append(rec)
        print(json.dumps(rec), flush=True)
        shutil.rmtree(rdir, ignore_errors=True)
        shutil.rmtree(cdir, ignore_errors=True)
    out["crossover"] = cross
    wins = [r["n"] for r in cross if r["adc_s_median"] < r["exact_s_median"]]
    out["adc_wins_from_n"] = min(wins) if wins else None

    shutil.rmtree(tmp, ignore_errors=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", args.out)
    print(
        json.dumps(
            {
                "named_config": out["named_config"],
                "adc_wins_from_n": out["adc_wins_from_n"],
            }
        )
    )


def _du(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


if __name__ == "__main__":
    main()
