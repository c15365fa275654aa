"""Scale rungs for the r10 CCNet perplexity stage (``datapipe/lm``):
train a 3-gram stupid-backoff LM on the doc_id % 5 == 0 reference
slice, score the WHOLE corpus, at 1x/10x/100x of the sf0.1 documents
table (salted replicas — cross-replica text cannot collide, so the
gram tables grow with the corpus like a real crawl's would).

Protocol matches the other ladders: medians of --runs, noop sink,
exponent = log-slope over the top decade. Recorded per rung: docs,
distinct grams in the model, train wall, score wall, share of
top-level-hit tokens (the LM saturation signal — at a fixed reference
fraction it should stay roughly flat across rungs).

r11 (VERDICT r10 #7): ``--order`` runs the ladder at another n-gram
order (CCNet proper uses 5 — the generalized backoff chain is
``2*order - 1`` lookups); ``--broadcast-max-grams`` is the measured
switch point past which the score joins go broadcast -> shuffle (the
100x model, 2.5M grams, still broadcasts comfortably; the 1000x one,
~25M grams x ~24 B, would put >500 MB per lookup level on every
executor and the driver — the probe flips to shuffle joins on the
uniform hash key and RECORDS which mode ran plus the plan's join
operators, so the artifact proves the switch engaged).

Usage: python tools/lm_scale_probe.py [--mults 10,100] [--runs 2]
           [--order 3] [--broadcast-max-grams 5000000]
           [--out LM_SCALE.json]
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
    ap.add_argument("--order", type=int, default=3)
    ap.add_argument("--broadcast-max-grams", type=int, default=5_000_000)
    ap.add_argument("--out", default="LM_SCALE.json")
    args = ap.parse_args()

    import tempfile

    from pyspark.sql import functions as F

    from ecollector_spark.datapipe import lm
    from ecollector_spark.session import get_spark
    from tools.ts_scale_probe import build_scaled

    spark = get_spark("lm_scale_probe")
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

    def timed(fn):
        ts = []
        last = None
        for _ in range(args.runs):
            t0 = time.perf_counter()
            last = fn()
            ts.append(time.perf_counter() - t0)
        return round(statistics.median(ts), 3), [round(t, 3) for t in ts], last

    out["order"] = args.order
    top_hits = f"hits{args.order}"
    for label, d in ladder:
        docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
        ref = docs.where(F.col("doc_id") % 5 == 0)
        n_docs = docs.count()

        def train():
            m = lm.train_ngram_lm(ref, order=args.order)
            return m, m.count(), lm.lm_total_tokens(m)

        train_wall, train_runs, (model, n_grams, total) = timed(train)
        model = model.localCheckpoint(eager=False)
        # the measured broadcast -> shuffle switch: past the budget the
        # per-level lookup tables stop being broadcast and the joins
        # shuffle on the uniform xxhash64 key instead
        bc = n_grams <= args.broadcast_max_grams

        def score():
            df = lm.score_perplexity(
                docs, model, total, order=args.order, broadcast_lm=bc
            )
            df.write.format("noop").mode("overwrite").save()
            return df

        score_wall, score_runs, scored = timed(score)
        plan = scored._jdf.queryExecution().executedPlan().toString()
        joins = {
            op: plan.count(op)
            for op in ("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin")
            if plan.count(op)
        }
        agg = scored.agg(
            F.sum(top_hits).alias("h"), F.sum("n_scored").alias("n")
        ).first()
        rec = {
            "docs": n_docs,
            "model_grams": n_grams,
            "ref_tokens": total,
            "train_wall_s_median": train_wall,
            "train_runs": train_runs,
            "score_wall_s_median": score_wall,
            "score_runs": score_runs,
            "broadcast_lm": bc,
            "score_plan_joins": joins,
            f"{top_hits}_share": round(agg["h"] / agg["n"], 4),
        }
        out["rungs"][label] = rec
        print(label, json.dumps(rec), flush=True)

    labels = [lb for lb, _ in ladder]
    if len(labels) >= 2:
        top, prev = labels[-1], labels[-2]
        ratio = int(top[:-1]) / int(prev[:-1])
        exps = {}
        for key in ("train_wall_s_median", "score_wall_s_median"):
            a = out["rungs"][prev][key]
            b = out["rungs"][top][key]
            exps[key.split("_")[0]] = round(math.log(b / a) / math.log(ratio), 3)
        out["exponent_top_decade"] = exps
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", args.out)
    print(json.dumps(out.get("exponent_top_decade", {})))


if __name__ == "__main__":
    main()
