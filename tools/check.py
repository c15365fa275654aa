"""Local stand-in for the driver's correctness gate.

Runs every registered query on Spark AND its DuckDB oracle at the given
sf dir, then compares row count, column names/shapes, and values
(column-name-sorted, row-sorted). Usage:

    python tools/check.py [--shelved] [sf_dir] [query ...]

``--shelved`` additionally runs the shelved (non-gate) variants so they
stay verified even though they don't spend driver check budget.
"""

from __future__ import annotations

import math
import sys

import duckdb

sys.path.insert(0, ".")


def compare(name, sdf, oracle, con):
    spark_rows = sdf.collect()
    scols = sdf.columns
    try:
        ddf = con.execute(oracle).fetchdf()
    except Exception as e:  # noqa: BLE001
        return f"ORACLE-ERROR {name}: {e}"
    ocols = list(ddf.columns)
    if sorted(scols) != sorted(ocols):
        return f"SCHEMA-MISMATCH {name}: spark={scols} duck={ocols}"
    if len(spark_rows) != len(ddf):
        return f"ROWCOUNT-MISMATCH {name}: spark={len(spark_rows)} duck={len(ddf)}"
    cols = sorted(scols)
    import pandas as pd

    sp = pd.DataFrame([[r[c] for c in cols] for r in spark_rows], columns=cols)
    du = ddf[cols]

    def norm(df):
        out = []
        for row in df.itertuples(index=False):
            vals = []
            for v in row:
                if v is None or (isinstance(v, float) and math.isnan(v)):
                    vals.append(None)
                elif isinstance(v, float):
                    vals.append(round(v, 9))
                else:
                    vals.append(v)
            out.append(tuple(vals))
        return sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t))

    a, b = norm(sp), norm(du)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:5]
        return f"VALUE-MISMATCH {name}: first diffs {diffs}"
    return f"OK {name}: {len(spark_rows)} rows"


def main():
    argv = [a for a in sys.argv[1:] if a != "--shelved"]
    shelved = "--shelved" in sys.argv[1:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    from ecollector_spark import driver_queries
    from ecollector_spark.session import get_spark

    driver_queries.load_all()
    spark = get_spark("check")

    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries = dict(driver_queries.QUERIES)
    oracles = dict(driver_queries.ORACLES)
    if shelved or only:
        # explicitly named gates resolve from BOTH registries — a
        # shelved name without --shelved must run, not vacuously pass
        queries.update(driver_queries.SHELVED_QUERIES)
        oracles.update(driver_queries.SHELVED_ORACLES)
    if only:
        unknown = only - set(queries)
        if unknown:
            print(f"UNKNOWN query name(s): {sorted(unknown)}")
            sys.exit(2)

    failures = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        oracle = oracles.get(name)
        try:
            sdf = fn(spark, sf_dir)
        except Exception as e:  # noqa: BLE001
            print(f"SPARK-ERROR {name}: {e}")
            failures += 1
            continue
        if oracle is None:
            n = sdf.count()
            print(f"ROWS-ONLY {name}: {n} rows")
            continue
        msg = compare(name, sdf, oracle, con)
        print(msg)
        if not msg.startswith("OK"):
            failures += 1
    print(f"\n{'FAIL' if failures else 'PASS'} ({failures} failures)")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
