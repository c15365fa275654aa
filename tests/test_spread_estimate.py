"""spread_small_scan's driver-side split estimate (r12): must take the
same branch as the exact .rdd probe on single-file inputs, and must
never fire at real scale."""

import os

from ecollector_spark.session import _estimated_splits, read_parquet, spread_small_scan


def test_estimate_matches_probe_branch(spark, sf_dir):
    w = spark.sparkContext.defaultParallelism
    for name in ("documents", "events", "lineitem"):
        p = os.path.join(sf_dir, f"{name}.parquet")
        df = read_parquet(spark, p)
        exact = df.rdd.getNumPartitions()
        est = _estimated_splits(spark, os.path.getsize(p), w)
        assert (exact >= w) == (est >= w), name


def test_estimate_never_spreads_at_scale(spark):
    # a 100 TB single file plans vastly more splits than any cluster width
    assert _estimated_splits(spark, 100 * 1024**4, 32) > 32_000


def test_spread_with_input_bytes_same_result(spark, sf_dir):
    p = os.path.join(sf_dir, "documents.parquet")
    df = read_parquet(spark, p).select("doc_id")
    a = spread_small_scan(read_parquet(spark, p).select("doc_id"))
    b = spread_small_scan(df, input_bytes=os.path.getsize(p))
    assert a.rdd.getNumPartitions() == b.rdd.getNumPartitions()
    assert sorted(r["doc_id"] for r in b.collect()) == sorted(
        r["doc_id"] for r in a.collect()
    )
