"""Driver queries for the sketch operators (functions/sketches.py).

KMV is deliberately built on md5 so the DuckDB oracle computes the
*identical* estimate — a cardinality sketch inside the value-hash
correctness gate, which `approx_count_distinct` (HLL, engine-specific
registers) can never be. The exact distinct count rides along in the
same result so the sketch's error is visible in the gate output.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ecollector_spark.driver_queries import register
from ecollector_spark.session import read_parquet
from ecollector_spark.functions.sketches import hash_unit, kmv_distinct
from ecollector_spark.sources.events_adapter import read_events

_K = 64
_U = "('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT / 1152921504606846976.0"


@register(
    "sketch_kmv_distinct_users",
    f"""WITH h AS (SELECT DISTINCT event_type, {_U} AS u FROM events),
mink AS (SELECT event_type, u, row_number() OVER (PARTITION BY event_type ORDER BY u) AS rn
         FROM h QUALIFY rn <= {_K}),
agg AS (SELECT event_type, CAST(max(rn) AS INT) AS n_kept, max(u) AS uk FROM mink GROUP BY 1),
ex AS (SELECT event_type, count(DISTINCT user_id) AS exact_distinct FROM events GROUP BY 1)
SELECT event_type, n_kept,
       floor((CASE WHEN n_kept < {_K} THEN CAST(n_kept AS DOUBLE) ELSE {_K - 1}.0 / uk END)
             * 1000000) / 1000000 AS est_distinct,
       exact_distinct
FROM agg JOIN ex USING (event_type) ORDER BY event_type
""",
)
def sketch_kmv_distinct_users(spark, sf_dir):
    """KMV(64) distinct-user estimate per event_type, exact count
    alongside. At sf0.01 every group has 150 distinct users so the
    (k-1)/u_k estimator path is exercised; at sf0.001 groups are under
    k and the sketch degrades to exact — both paths sit in the gate."""
    # read_events, not a direct parquet read: the driver hands us a vanilla
    # session and only read_events sets the nanos legacy conf
    ev = read_events(spark, sf_dir).select("event_type", "user_id")
    est = kmv_distinct(ev, ["event_type"], "user_id", k=_K).withColumn(
        "n_kept", F.col("n_kept").cast("int")
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_distinct")
    )
    return est.join(exact, "event_type").select(
        "event_type", "n_kept", "est_distinct", "exact_distinct"
    )


@register(
    "sketch_sampled_quantiles",
    f"""WITH s AS (
  SELECT event_type, value FROM events WHERE {_U} < 0.5),
q AS (SELECT event_type,
        round(quantile_cont(value, 0.5), 6) AS p50_sample,
        round(quantile_cont(value, 0.95), 6) AS p95_sample
      FROM s GROUP BY 1),
ex AS (SELECT event_type, round(quantile_cont(value, 0.5), 6) AS p50_exact
       FROM events GROUP BY 1)
SELECT event_type, p50_sample, p95_sample, p50_exact
FROM q JOIN ex USING (event_type) ORDER BY event_type
""",
    shelved=True,
)
def sketch_sampled_quantiles(spark, sf_dir):
    """Quantiles over a deterministic 50% hash sample of users (the
    scale path for percentile dashboards: the sample predicate is
    engine- and retry-stable, unlike rand()), exact p50 alongside.
    Exercises reproducible sampling + interpolated-percentile parity."""
    ev = read_events(spark, sf_dir).select("event_type", "user_id", "value")
    sample = ev.where(hash_unit("user_id") < 0.5)
    q = sample.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.5)), 6).alias("p50_sample"),
        F.round(F.percentile("value", F.lit(0.95)), 6).alias("p95_sample"),
    )
    ex = ev.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.5)), 6).alias("p50_exact")
    )
    return q.join(ex, "event_type")


@register(
    "sketch_stratified_sample",
    f"""WITH h AS (SELECT doc_id, doc_id % 7 AS stratum,
  ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT / 1152921504606846976.0 AS u
  FROM documents)
SELECT CAST(stratum AS BIGINT) AS stratum, doc_id FROM h
QUALIFY row_number() OVER (PARTITION BY stratum ORDER BY u, doc_id) <= 5
ORDER BY stratum, doc_id
""",
    shelved=True,  # rotated out r6 (family keeps a main-gate twin)
)
def sketch_stratified_sample(spark, sf_dir):
    """Deterministic stratified sample: 5 docs per (doc_id % 7) stratum
    by smallest md5-hash — the balanced training-mix builder, identical
    on any engine/partitioning."""
    from ecollector_spark.functions.sketches import stratified_sample

    docs = read_parquet(spark, f"{sf_dir}/documents.parquet").select(
        "doc_id", (F.col("doc_id") % 7).alias("stratum")
    )
    return stratified_sample(docs, ["stratum"], 5, "doc_id").select("stratum", "doc_id")
