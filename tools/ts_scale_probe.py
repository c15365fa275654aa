"""Measured 10x scale point for the core time-series family (r3 verdict
item #6): the dedup/ANN family has measured candidate-growth exponents
(bench.py scale probe); this gives the ts operators their missing
wall-time ladder.

No sf1 directory ships with the testdata, so one is synthesized at
exactly 10x the sf0.1 fact table: events replicated 10 times under
offset (user_id, event_id) ranges — 10x the device/series population
over the same time range, which is how this corpus grows in production
— while the dimension tables are shared unchanged (symlinks). Series
cardinality, not per-series density, is the axis that stresses the
groupBy/state/gap-fill paths.

Usage: python tools/ts_scale_probe.py [--runs N] [--out TS_SCALE.json]
       python tools/ts_scale_probe.py --headline   (r5 verdict item #3)
Writes per-query wall times at sf0.1 (1x), 10x, and 100x plus the
time-growth exponent (1.0 = linear in rows) fitted over the TOP decade
(10x -> 100x): the first run of this probe showed every ts query is
fixed-overhead-dominated below ~1M rows (10x of 100k rows was
measurably no slower than 1x - plan/launch cost swamps data cost), so
an exponent that includes the 1x point reads artificially flat. The
1x and 10x medians are still reported for the floor they document.

``--headline`` measures bench.py's FULL headline set instead (TPC-H,
dedup, ANN, text, curation included): the fact tables each query reads
(events, documents, embeddings, lineitem, orders) are replicated under
offset key ranges, dimensions shared. Output HEADLINE_SCALE.json is
folded into BENCH_DETAIL.json by the next bench.py run. Key-offset
bands: doc_id steps by 100M per replica so dedup_corpus's derived
+10M/+20M ids never cross replica bands.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: the ts-family headliners (transform, preagg, counter-diff, gap-fill,
#: rollup, two-level group, outlier fence, planner group-by)
TS_QUERIES = [
    "ts_group_by_time_mean",
    "ts_group_by_time_tag_fill_previous",
    "fimp_transform_pipeline",
    "preagg_30s_directives",
    "counter_difference_10m",
    "energy_rollup",
    "two_level_group_energy",
    "outlier_fence",
]

USER_OFFSET = 1_000_000
EVENT_OFFSET = 1_000_000_000
DOC_OFFSET = 100_000_000  # > dedup_corpus's +20M derived-id band
VEC_OFFSET = 10_000_000
ORDER_OFFSET = 1_000_000_000


def build_scaled(
    spark,
    base_dir: str,
    out_dir: str,
    replicas: int,
    tables: set[str] | None = None,
    salt_docs: bool = False,
    salt_vecs: bool = False,
) -> None:
    """Fact tables x replicas under offset key ranges; dims symlinked.

    ``tables`` limits which facts are replicated (default: events only —
    the original ts-family ladder); the headline set also replicates
    documents (doc_id), embeddings (vec_id) and lineitem/orders
    (orderkey, so per-order joins scale linearly while custkey/suppkey
    still hit the shared dimensions)."""
    from pyspark.sql import functions as F

    from ecollector_spark.sources.events_adapter import read_events

    tables = tables or {"events"}
    os.makedirs(out_dir, exist_ok=True)
    replicated = {f"{t}.parquet" for t in tables}
    for name in os.listdir(base_dir):
        src, dst = os.path.join(base_dir, name), os.path.join(out_dir, name)
        if name not in replicated and not os.path.exists(dst):
            os.symlink(src, dst)
    rep = spark.range(replicas).select(F.col("id").alias("_k"))

    def _nfiles(name: str) -> int:
        # realistic file layout for the rung (r6 fix): the crossJoin of a
        # small source inherits its 1-2 input partitions and writes ONE
        # file, so a <=128 MB rung scans on ONE task while a bigger rung
        # splits — the 100x->1000x "exponent" then measures the
        # parallelism transition, not the operator (measured: the
        # transform read 10M rows through 1 task at 100x). Target ~128 MB
        # files with a 32-file floor so every rung saturates local[32].
        src = os.path.join(base_dir, name)
        base_bytes = (
            os.path.getsize(src)
            if os.path.isfile(src)
            else sum(
                os.path.getsize(os.path.join(r, f))
                for r, _, fs in os.walk(src)
                for f in fs
            )
        )
        return max(32, min(512, (base_bytes * replicas) // (128 << 20) + 1))

    def write(df, name):
        dst = os.path.join(out_dir, name)
        if os.path.isdir(dst) and os.path.isfile(os.path.join(dst, "_SUCCESS")):
            return  # already replicated (ladder dirs are content-stable)
        df.write.mode("overwrite").parquet(dst)

    def _expand(fact, name):
        """replicas × fact with ZERO shuffle: the replica range is
        pre-partitioned to the rung's file count and the (small, ≤ tens
        of MB) fact BROADCASTS, so each task generates its replica slice
        and writes its output file directly. The previous shape —
        ``fact.crossJoin(rep).repartition(n)`` — shuffled the ENTIRE
        rung output through a 1-2-task map side (the small source's
        partitioning): the lineitem×1000 build wrote >50 GB of shuffle
        temp and nearly filled the disk before producing a byte of
        parquet (r7). Same rows, same files, no shuffle bytes."""
        return rep.repartition(int(_nfiles(name))).crossJoin(F.broadcast(fact))

    if "events" in tables:
        ev = read_events(spark, base_dir)
        write(
            _expand(ev, "events.parquet").select(
                (F.col("event_id") + EVENT_OFFSET * F.col("_k")).alias("event_id"),
                "ts",
                (F.col("user_id") + USER_OFFSET * F.col("_k")).alias("user_id"),
                "event_type",
                "value",
                "props",
            ),
            "events.parquet",
        )
    if "documents" in tables:
        d = spark.read.parquet(os.path.join(base_dir, "documents.parquet"))
        text_col = (
            # replica-salt EVERY token so replicas are NOT mutual
            # near-duplicates: an unsalted replication makes every base
            # doc an r-member true-duplicate group, so the CORRECT pair
            # output (and any pair-emitting dedup's cost) grows as
            # C(r,2) — an artifact of the ladder, not the operator
            # (measured: 1x->10x input x10 but emitted pairs x312).
            # A single prefix token is not enough (cross-replica Jaccard
            # stays ~0.9); prefixing every token with "<k>z" drives
            # cross-replica shingle overlap to zero while each replica
            # keeps its own planted dup structure (dedup_corpus derives
            # near/exact dups from the replica's text), so true pairs
            # grow linearly — what a real 100x corpus does.
            F.regexp_replace(
                F.col("text"),
                F.lit(r"(\S+)"),
                F.concat(F.col("_k").cast("string"), F.lit("z$1")),
            )
            if salt_docs
            else F.col("text")
        ).alias("text")
        write(
            _expand(d, "documents.parquet").select(
                (F.col("doc_id") + DOC_OFFSET * F.col("_k")).alias("doc_id"),
                text_col,
                *[c for c in d.columns if c not in ("doc_id", "text")],
            ),
            "documents.parquet",
        )
    if "embeddings" in tables:
        e = spark.read.parquet(os.path.join(base_dir, "embeddings.parquet"))
        emb_col = (
            # replica-salt for PAIR-EMITTING embedding ops: a per-replica
            # diagonal +/-1 sign flip (sign of xxhash64(_k, dim)) is an
            # ORTHOGONAL transform — every within-replica cosine (and so
            # each replica's planted near-dup structure) is preserved
            # EXACTLY, while cross-replica cosines scatter to ~N(0, 1/64)
            # and stay under any near-dup threshold. Plain replication
            # would make every base vector an r-member duplicate group
            # and grow the correct pair output as C(r,2) — the same
            # ladder artifact --salt-docs exists for.
            F.transform(
                F.col("embedding"),
                lambda x, i: x
                * (1 - 2 * F.pmod(F.xxhash64(F.col("_k"), i), F.lit(2))).cast("float"),
            )
            if salt_vecs
            else F.col("embedding")
        ).alias("embedding")
        write(
            _expand(e, "embeddings.parquet").select(
                (F.col("vec_id") + VEC_OFFSET * F.col("_k")).alias("vec_id"),
                emb_col,
                *[c for c in e.columns if c not in ("vec_id", "embedding")],
            ),
            "embeddings.parquet",
        )
    if "lineitem" in tables:
        li = spark.read.parquet(os.path.join(base_dir, "lineitem.parquet"))
        write(
            _expand(li, "lineitem.parquet").select(
                (F.col("l_orderkey") + ORDER_OFFSET * F.col("_k")).alias("l_orderkey"),
                *[c for c in li.columns if c != "l_orderkey"],
            ),
            "lineitem.parquet",
        )
    if "orders" in tables:
        o = spark.read.parquet(os.path.join(base_dir, "orders.parquet"))
        write(
            _expand(o, "orders.parquet").select(
                (F.col("o_orderkey") + ORDER_OFFSET * F.col("_k")).alias("o_orderkey"),
                *[c for c in o.columns if c != "o_orderkey"],
            ),
            "orders.parquet",
        )


#: headline queries that build an on-disk cache (ANN index) on first
#: touch: run once untimed per ladder rung so the measurement is the
#: steady-state probe, not the one-time build
WARM_ONCE = {"ann_ivf_topk", "ann_lsh_indexed"}

#: which fact tables the headline set reads (everything else symlinks)
HEADLINE_TABLES = {"events", "documents", "embeddings", "lineitem", "orders"}


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--out", default=None)
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument(
        "--headline",
        action="store_true",
        help="measure bench.py's full headline set (r5 verdict #3) "
        "instead of the ts family; writes HEADLINE_SCALE.json",
    )
    ap.add_argument("--queries", nargs="*", help="subset override")
    ap.add_argument(
        "--salt-docs",
        action="store_true",
        help="replica-salt document text (dedicated ladder dirs): measures "
        "pair-emitting dedup operators without the C(replicas,2) "
        "true-duplicate output blowup of plain replication",
    )
    ap.add_argument(
        "--mults",
        default="10,100",
        help="comma-separated replica multipliers (r6 verdict #7 pushes "
        "the expensive headliners to 1000: pass '100,1000' so the "
        "top-decade exponent is measured within ONE session); the 1x "
        "base rung is always included",
    )
    ap.add_argument(
        "--tables",
        nargs="*",
        help="limit which fact tables the ladder replicates (default: "
        "the mode's full set) — a --queries subset only needs ITS "
        "tables, and a 1000x lineitem nobody reads is 11 GB of build",
    )
    ap.add_argument(
        "--merge",
        action="store_true",
        help="merge this run's rungs/exponents into an existing --out "
        "file instead of overwriting it (per-query keys are updated, "
        "other queries' records are kept)",
    )
    args = ap.parse_args()

    from ecollector_spark import driver_queries
    from ecollector_spark.session import get_spark

    driver_queries.load_all()
    spark = get_spark("ts_scale")
    registry = {**driver_queries.QUERIES, **driver_queries.SHELVED_QUERIES}

    if args.headline:
        from bench import HEADLINE

        names = [n for n in HEADLINE if n in registry]
        tables, tag = HEADLINE_TABLES, "headline"
        out_path = args.out or os.path.join(repo, "HEADLINE_SCALE.json")
    else:
        names, tables, tag = TS_QUERIES, {"events"}, "ts"
        out_path = args.out or os.path.join(repo, "TS_SCALE.json")
    if args.queries:
        names = [n for n in args.queries if n in registry]
    if args.salt_docs:
        tag, tables = tag + "_salted", {"documents"}
    if args.tables:
        tables = set(args.tables)

    mults = [int(m) for m in args.mults.split(",") if m.strip()]
    ladder = [("1x", args.base)]
    for mult in mults:
        d = os.path.join(tempfile.gettempdir(), f"ec_{tag}_scale_x{mult}")
        build_scaled(spark, args.base, d, mult, tables, salt_docs=args.salt_docs)
        ladder.append((f"{mult}x", d))

    def rows(d, t="events"):
        return spark.read.parquet(os.path.join(d, f"{t}.parquet")).count()

    # count a table that actually scales along this ladder — in
    # --salt-docs mode events is shared unchanged across rungs, and a
    # flat count makes the exponent's log-ratio divide by zero
    fact = "events" if "events" in tables else sorted(tables)[0]
    counts = {label: rows(d, fact) for label, d in ladder}
    # weather guard (VERDICT r10 #3): ladder exponents fitted from a
    # loaded box are weather-fragile — wait for quiet, annotate if not
    from tools.weather import wait_for_quiet

    guard = wait_for_quiet()
    out = {
        "note": (
            f"wall-time growth of the {tag} query set across a 1x/10x/100x "
            "fact-table ladder (replicas of sf0.1 under offset key ranges, "
            "shared dims); exponent = log-slope over the TOP decade "
            "(10x -> 100x), 1.0 = linear — the 1x->10x step sits on the "
            "fixed plan/launch overhead floor and would read artificially "
            "flat; medians of --runs runs, noop sink, local[32]"
        ),
        "rows": counts,
        "weather_guard": guard,
        "queries": {},
    }
    # exponent over the run's TOP decade (the two largest rungs) — the
    # smaller rungs sit on the fixed plan/launch overhead floor
    lo_label, hi_label = ladder[-2][0], ladder[-1][0]
    hi_ratio = counts[hi_label] / counts[lo_label]
    for name in names:
        fn = registry[name]
        rec = {}
        for label, d in ladder:
            if name in WARM_ONCE:
                fn(spark, d).write.format("noop").mode("overwrite").save()
            ts = []
            for _ in range(args.runs):
                t0 = time.perf_counter()
                fn(spark, d).write.format("noop").mode("overwrite").save()
                ts.append(time.perf_counter() - t0)
            rec[label] = round(statistics.median(ts), 3)
        rec["exponent_top_decade"] = round(
            math.log(max(rec[hi_label], 1e-9) / max(rec[lo_label], 1e-9))
            / math.log(hi_ratio),
            3,
        )
        rec["top_decade"] = [lo_label, hi_label]
        out["queries"][name] = rec
        print(name, rec, flush=True)

    if args.merge and os.path.isfile(out_path):
        with open(out_path) as f:
            prev = json.load(f)
        prev.setdefault("rows", {}).update(counts)
        for name, rec in out["queries"].items():
            prev.setdefault("queries", {}).setdefault(name, {}).update(rec)
        prev["note"] = out["note"] + " | merged rungs from later runs carry their own top_decade"
        # the freshest capture's guard must not vanish under the merge
        # (r12): record it both at top level and per merged query
        prev["weather_guard"] = out["weather_guard"]
        for name in out["queries"]:
            prev["queries"][name]["weather_guard"] = out["weather_guard"]
        out = prev
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
