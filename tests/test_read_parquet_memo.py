"""read_parquet schema memo (r12 optimization): single-file parquet
schema inference is memoized per (SparkContext, file identity) — the
memo must be invisible (same schema, same rows), must re-infer when the
file is rewritten, and must bypass directory datasets entirely."""

import os

from ecollector_spark.session import _PARQUET_SCHEMA_MEMO, read_parquet


def test_memo_returns_identical_schema_and_rows(spark, sf_dir, tmp_path):
    p = str(tmp_path / "t.parquet")
    spark.range(5).selectExpr("id", "id * 2 AS v").coalesce(1).toPandas().to_parquet(p)
    first = read_parquet(spark, p)
    memo = _PARQUET_SCHEMA_MEMO[spark.sparkContext]
    key = [k for k in memo if k[0] == os.path.realpath(p)]
    assert key, "first read should populate the memo"
    second = read_parquet(spark, p)
    assert second.schema == first.schema
    assert sorted(r["v"] for r in second.collect()) == [0, 2, 4, 6, 8]


def test_rewrite_reinfers_schema(spark, tmp_path):
    p = str(tmp_path / "rw.parquet")
    spark.range(3).selectExpr("id AS a").coalesce(1).toPandas().to_parquet(p)
    assert read_parquet(spark, p).columns == ["a"]
    # rewrite with a DIFFERENT schema; a stale memo would misread it
    os.remove(p)
    spark.range(3).selectExpr("id AS b", "id + 1 AS c").coalesce(1).toPandas().to_parquet(p)
    df = read_parquet(spark, p)
    assert df.columns == ["b", "c"]
    assert df.count() == 3


def test_directory_dataset_bypasses_memo(spark, tmp_path):
    d = str(tmp_path / "dirds")
    spark.range(4).selectExpr("id", "id % 2 AS part").write.partitionBy("part").parquet(d)
    df = read_parquet(spark, d)
    assert df.count() == 4
    memo = _PARQUET_SCHEMA_MEMO.get(spark.sparkContext) or {}
    assert not any(k[0] == os.path.realpath(d) for k in memo)


def test_sf_inputs_schema_matches_inference(spark, sf_dir):
    # the memoized read of a driver input must equal plain inference
    p = os.path.join(sf_dir, "events.parquet")
    read_parquet(spark, p)  # populate
    assert read_parquet(spark, p).schema == spark.read.parquet(p).schema
