"""Skew-mitigation helpers.

AQE's skew-join split handles most runtime skew, but two shapes still
need explicit salting at 100 TB:

- a groupBy where one key holds a large share of all rows (hot device,
  stop-shingle, null-ish default key): one reducer gets the whole key.
  :func:`salted_aggregate` runs any *algebraic* aggregation in two
  stages — partial agg on (key, salt), final merge on key — so the hot
  key fans out over ``salt_buckets`` reducers.
- a join against a handful of hot keys: replicate the small side per
  salt instead (not provided here; AQE skew-join covers the common case).

Supported merges: the decomposable aggregates (sum/count/min/max and
anything expressible from them, e.g. mean = sum/count). Non-decomposable
aggregates (median, exact distinct) need different machinery (sketches).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: (partial_expr, merge_fn) per supported aggregate
_ALGEBRAIC = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 32,
) -> DataFrame:
    """Two-stage skew-safe groupBy.

    ``aggs``: output_name -> (function, column), function in
    sum/count/min/max. Example::

        salted_aggregate(dp, ["series_id"], {
            "total": ("sum", "value_f"),
            "n": ("count", "value_f"),
        })

    Stage 1 groups on (keys..., random salt) — the hot key's rows spread
    over ``salt_buckets`` partial groups; stage 2 merges partials on the
    real keys. Result equals the unsalted groupBy for all supported
    functions (they're associative+commutative).
    """
    for name, (fn, _col) in aggs.items():
        if fn not in _ALGEBRAIC:
            raise ValueError(f"{name}: {fn!r} is not an algebraic aggregate")
    salted = df.withColumn("_salt", (F.rand(seed=0) * salt_buckets).cast("int"))
    partial = salted.groupBy(*keys, "_salt").agg(
        *[
            _ALGEBRAIC[fn][0](F.col(col)).alias(f"_p_{name}")
            for name, (fn, col) in aggs.items()
        ]
    )
    final = partial.groupBy(*keys).agg(
        *[
            _ALGEBRAIC[fn][1](F.col(f"_p_{name}")).alias(name)
            for name, (fn, _col) in aggs.items()
        ]
    )
    return final


def top_frequent_keys(df: DataFrame, key: str | Column, n: int = 20) -> DataFrame:
    """Diagnostic: the n heaviest key values with their row share — the
    query you run before deciding a key needs salting."""
    total = df.count()
    k = F.col(key) if isinstance(key, str) else key
    return (
        df.groupBy(k.alias("key"))
        .agg(F.count("*").alias("rows"))
        .withColumn("share", F.col("rows") / F.lit(float(total or 1)))
        .orderBy(F.desc("rows"))
        .limit(n)
    )
