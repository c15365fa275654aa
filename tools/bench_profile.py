"""Per-query bench profile: split each headline query's wall time into
build (Python DataFrame construction), plan (Catalyst analyze+optimize+
physical planning via explain), and execute (noop sink), and count the
Spark jobs/stages/tasks each execution launches.

Purpose (optimization guide §1): at bench scale (sf0.1, MBs of input)
per-query seconds are dominated by fixed engine costs — this tool says
WHICH fixed cost (plan complexity vs task count vs real compute) so the
optimization effort lands on the right one.

Usage: python tools/bench_profile.py [query ...]   (default: bench HEADLINE)
Writes JSON to /tmp/bench_profile.json and prints a table.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from bench import HEADLINE
    from ecollector_spark import driver_queries
    from ecollector_spark.session import get_spark

    driver_queries.load_all()
    spark = get_spark("bench-profile")
    sc = spark.sparkContext
    registry = {**driver_queries.QUERIES, **driver_queries.SHELVED_QUERIES}
    names = sys.argv[1:] or [n for n in HEADLINE if n in registry]
    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))

    # same warm-up as bench.py
    from pyspark.sql import functions as F

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    dim = spark.range(5).select(F.col("id").alias("k"))
    (
        ev.limit(10000)
        .join(F.broadcast(dim), ev.user_id % 5 == dim.k)
        .groupBy("event_type")
        .agg(F.avg("value"), F.count("*"))
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    for t in os.listdir(sf_dir):
        if t.endswith(".parquet"):
            spark.read.parquet(os.path.join(sf_dir, t)).write.format("noop").mode(
                "overwrite"
            ).save()

    tracker = sc.statusTracker()
    out: dict[str, dict] = {}
    for name in names:
        fn = registry[name]
        rows = []
        for i in range(n_runs):
            sc.setJobGroup(f"profile-{name}-{i}", name)
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            t2 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t3 = time.perf_counter()
            job_ids = tracker.getJobIdsForGroup(f"profile-{name}-{i}")
            n_stages = n_tasks = 0
            for jid in job_ids:
                ji = tracker.getJobInfo(jid)
                if ji is None:
                    continue
                for sid in ji.stageIds:
                    si = tracker.getStageInfo(sid)
                    if si is not None and si.numCompletedTasks > 0:
                        n_stages += 1
                        n_tasks += si.numTasks
            rows.append(
                {
                    "build_s": round(t1 - t0, 3),
                    "plan_s": round(t2 - t1, 3),
                    "exec_s": round(t3 - t2, 3),
                    "total_s": round(t3 - t0, 3),
                    "jobs": len(job_ids),
                    "stages": n_stages,
                    "tasks": n_tasks,
                }
            )
            sc.setJobGroup(None, None)
        med = sorted(rows, key=lambda r: r["total_s"])[len(rows) // 2]
        out[name] = {
            "median": med,
            "runs": rows,
            "exchanges": len(re.findall(r"\bExchange\b", plan)),
            "codegen_spans": len(set(re.findall(r"WholeStageCodegen \((\d+)\)", plan))),
            "python_nodes": len(
                re.findall(r"BatchEvalPython|ArrowEvalPython|MapInPandas|MapInArrow|FlatMapGroupsInPandas", plan)
            ),
            "plan_chars": len(plan),
        }
        m = out[name]
        print(
            f"{name:38s} total={med['total_s']:7.3f} build={med['build_s']:6.3f} "
            f"plan={med['plan_s']:6.3f} exec={med['exec_s']:7.3f} "
            f"jobs={med['jobs']:3d} stages={med['stages']:3d} tasks={med['tasks']:5d} "
            f"exch={m['exchanges']:2d} wsc={m['codegen_spans']:2d} py={m['python_nodes']}"
        )
        sys.stdout.flush()
    with open("/tmp/bench_profile.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
