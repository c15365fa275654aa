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
from ecollector_spark.functions.sketches import kmv_distinct

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
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select("event_type", "user_id")
    est = kmv_distinct(ev, ["event_type"], "user_id", k=_K).withColumn(
        "n_kept", F.col("n_kept").cast("int")
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_distinct")
    )
    return est.join(exact, "event_type").select(
        "event_type", "n_kept", "est_distinct", "exact_distinct"
    ).orderBy("event_type")
