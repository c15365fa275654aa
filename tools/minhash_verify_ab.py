"""Minhash verify-mode A/B at the salted ladder rung (r8, VERDICT r7 #9).

Arms, same session, same ladder dir (built by ts_scale_probe
--salt-docs), interleaved-capable via --runs:

- ``exact``   — the gate semantics: exact Jaccard for every candidate
  pair (r8 shape: shingle sets collected only for candidate docs).
- ``hybrid``  — signature-agreement primary verdict; exact Jaccard only
  for the borderline band (minhash_lsh_pairs(verify='hybrid')).

Prints per-arm wall seconds and the pair-count parity check (the salted
corpus's near-dups have agreement ~1.0, so the hybrid arm should accept
almost everything signature-side and skip the set shuffle — the measured
question is how much of the r7 1.253 exponent's spill that removes).

Usage: python tools/minhash_verify_ab.py --dir /tmp/ec_headline_salted_scale_x1000
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/ec_headline_salted_scale_x1000")
    ap.add_argument("--runs", type=int, default=1)
    ap.add_argument("--out", default="/tmp/MINHASH_VERIFY_AB.json")
    args = ap.parse_args()

    from ecollector_spark.datapipe.dedup import minhash_lsh_pairs
    from ecollector_spark.driver_queries.datapipe import dedup_corpus
    from ecollector_spark.session import get_spark

    spark = get_spark("minhash_verify_ab")
    out = {"dir": args.dir, "arms": {}}
    for _ in range(args.runs):
        for mode in ("exact", "hybrid"):
            docs = dedup_corpus(spark, args.dir)
            t0 = time.perf_counter()
            df = minhash_lsh_pairs(docs, verify=mode)
            n = df.count()
            wall = time.perf_counter() - t0
            out["arms"].setdefault(mode, []).append(
                {"wall_s": round(wall, 1), "pairs": n}
            )
            print(mode, round(wall, 1), "s,", n, "pairs", flush=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
