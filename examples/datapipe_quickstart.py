"""LLM-training-data pipeline quickstart — the datapipe family end to end.

A corpus goes in; a curated manifest, duplicate clusters, and a served
ANN index come out:

  documents -> exact + MinHash-LSH dedup -> quality/lang-ID gate ->
  curated manifest; embeddings -> IVF index build -> incremental append
  -> partition-pruned top-k probe.

    python examples/datapipe_quickstart.py [sf_dir]

Uses the synthetic testdata tables (documents, embeddings) by default.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from ecollector_spark.datapipe import dedup, similarity, text
from ecollector_spark.datapipe.curation import curate
from ecollector_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("datapipe_quickstart")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    # -- dedup ------------------------------------------------------------
    exact = dedup.exact_duplicates(docs)
    print(f"exact-duplicate groups: {exact.count()}")
    near = dedup.minhash_lsh_pairs(docs, threshold=0.7)
    print(f"near-duplicate pairs (MinHash-LSH, J>=0.7): {near.count()}")
    clusters = dedup.connected_components(near, "doc_a", "doc_b")
    print(f"duplicate clusters: {clusters.select('cluster_id').distinct().count()}")

    # -- text signals -----------------------------------------------------
    scored = text.quality_score(docs).join(text.lang_id(docs), "doc_id")
    print("language mix:", dict(
        (r["pred_lang"], r["n"]) for r in
        scored.groupBy("pred_lang").agg(F.count("*").alias("n")).collect()
    ))

    # -- curated manifest (composed flow) ---------------------------------
    manifest = curate(docs, min_quality=0.65)
    print(f"curated manifest rows: {manifest.count()}")

    # -- ANN index lifecycle ----------------------------------------------
    idx = os.path.join(tempfile.mkdtemp(prefix="dp_qs_"), "ivf")
    first = emb.where(F.col("vec_id") % 2 == 0)
    rest = emb.where(F.col("vec_id") % 2 == 1)
    similarity.ivf_build(first, idx, n_centroids=8, n_iter=2)
    res = similarity.ivf_append(rest, idx)
    print(f"ivf_append: +{res['appended']} vectors, rebuilt={res['rebuilt']}")
    qv = list(
        emb.where(F.col("vec_id") == 0)
        .select(F.col("embedding").cast("array<double>").alias("v"))
        .first()["v"]
    )
    topk = similarity.ivf_topk_indexed(spark, idx, qv, k=5, nprobe=2, exclude_vec_id=0)
    print("top-5 neighbours of vec 0:", [(r["vec_id"], r["cosine"]) for r in topk.collect()])

    # -- training-data assembly: mix -> pack -> sharded export ------------
    from ecollector_spark.datapipe.export import export_shards, validate_shards
    from ecollector_spark.datapipe.packing import (
        mix_by_weight,
        pack_sequences,
        sequence_manifest,
    )

    mixed = mix_by_weight(docs, {"src0": 2.0, "src1": 0.5}, domain_col="source")
    print(f"mixed copies: {mixed.count()} (src0 doubled, src1 halved)")
    placed = pack_sequences(docs, seq_len=512)
    windows = sequence_manifest(placed, 512)
    print(f"packed into {windows.count()} x 512-token context windows")
    shard_dir = os.path.join(tempfile.mkdtemp(prefix="dp_qs_"), "shards")
    export_shards(docs, shard_dir, n_shards=4)
    print(f"exported 4 shards, manifest valid: {validate_shards(spark, shard_dir)}")

    # -- epoch shuffling + leakage-safe split -----------------------------
    from ecollector_spark.datapipe.packing import epoch_order, leakage_safe_split

    e0 = epoch_order(docs, seed="0")
    e1 = epoch_order(docs, seed="1")
    moved = e0.join(e1, "doc_id").where(e0["pos"] != e1["pos"]).count()
    print(f"epoch shuffle: {moved} docs change position between epoch 0 and 1")
    split = leakage_safe_split(docs, val_fraction=0.1)
    print("train/val:", {r["split"]: r["count"] for r in split.groupBy("split").count().collect()})

    # -- incremental ingest dedup: the next batch checks compact manifests
    # of everything already ingested — history is never re-read
    seen_exact = dedup.exact_manifest(docs)
    seen_sigs = dedup.minhash_signatures(docs)
    batch = docs.limit(50).select((F.col("doc_id") + 10**7).alias("doc_id"), "text")
    decisions = dedup.dedup_incremental(batch, seen_exact, seen_sigs)
    print("incremental dedup decisions:",
          {r["status"]: r["count"] for r in decisions.groupBy("status").count().collect()})
    seen_exact, seen_sigs = dedup.fold_manifests(seen_exact, seen_sigs, batch, decisions)
    print(f"manifests after fold: {seen_exact.count()} hashes")


if __name__ == "__main__":
    main()
