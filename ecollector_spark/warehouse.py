"""Tiered parquet warehouse: layout, readers/writers, retention TTL and
the CSV sink.

Layout: ``<root>/tier=<tier>/measurement=<m>/*.parquet`` (schema.py
WAREHOUSE_PARTITION_COLUMNS). Tier routing (the reference's retention-
policy addressing, influxdb_v1.go:45-58) becomes partition pruning: a
planner-chosen tier + measurement predicate never scans another tier's
files. Retention (the RP TTL) is a batch job that drops expired rows by
rewriting only the affected partitions — the Spark equivalent of
InfluxDB's retention enforcement service.

Scale notes: writes append partitioned files (no shuffle beyond the
pipeline's own); the TTL job reads only partitions that can contain
expired data (all queries pin tier, and file/partition statistics skip
young files). At 100 TB add a date subpartition so retention is pure
partition drop — the layout constant keeps that a one-line change.
"""

from __future__ import annotations

import os
import shutil
import threading

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ecollector_spark.schema import WAREHOUSE_PARTITION_COLUMNS
from ecollector_spark.tiers import TIER_TTL_SECONDS, TIERS
from ecollector_spark.tiers import write_retention_col

#: the reference CSV sink's fixed header (storage/csv.go:22) — the
#: de-facto canonical flat schema
CSV_COLUMNS = (
    "name",
    "time",
    "dev_id",
    "dev_type",
    "dir",
    "location_id",
    "service",
    "src",
    "topic",
    "value",
    "unit",
)


#: Serializes rename-aside publishes against recovery-on-read. Reads are a
#: supported concurrent pattern (with_read_retry), and a reader that lands
#: between _swap_in's two renames would see old-present/dst-missing, rename
#: the pre-swap copy back over dst and break the writer's final
#: ``rename(tmp, dst)`` — silently abandoning the replacement data. The
#: mid-swap state is only distinguishable from a crash by knowing a swap is
#: in flight, so recovery and publish share one in-process lock (threads
#: share the Warehouse; the window is two renames, so contention is
#: microseconds). Cross-process coordination is the object-store manifest
#: flip documented in _swap_in.
_SWAP_LOCK = threading.RLock()


def _recover_measurement_swaps(tier_path: str) -> None:
    """Recover measurement-level rename-aside crashes inside a tier dir
    (``delete_points`` swaps at that granularity): any ``<m>.old`` whose
    live directory is missing is restored — otherwise readers see the
    data vanish and partition discovery surfaces a phantom ``m.old``
    measurement. A directory listing, no scan."""
    if not os.path.isdir(tier_path):
        return
    with _SWAP_LOCK:
        for d in os.listdir(tier_path):
            if d.endswith(".old"):
                _recover_crashed_swap(os.path.join(tier_path, d[: -len(".old")]))


def _recover_crashed_swap(dst: str) -> None:
    """Crash recovery for the rename-aside publish: if a previous swap
    died between ``rename(dst, old)`` and ``rename(tmp, dst)``, the
    ``.old`` directory holds the only complete copy of the data. Restore
    it as the live directory instead of letting the next swap (or a
    rewrite that reads the now-missing ``dst``) delete the last good
    copy. No-op in every healthy state. Holds _SWAP_LOCK so a concurrent
    in-flight swap is never mistaken for a crash."""
    old = dst + ".old"
    with _SWAP_LOCK:
        if os.path.isdir(old) and not os.path.isdir(dst):
            os.rename(old, dst)
        elif os.path.isdir(old) and os.path.isdir(dst):
            # crash AFTER rename(tmp, dst) but before rmtree(old): the live
            # dir is the published replacement and the leftover ``.old`` is
            # the pre-swap copy — without this, partition discovery surfaces
            # a phantom 'm.old' measurement (including just-deleted rows)
            # until the next swap of the same measurement
            shutil.rmtree(old, ignore_errors=True)


class Warehouse:
    """Filesystem-backed tiered warehouse over parquet.

    ``date_partition=True`` enables the 100 TB layout documented in
    SCALE.md: a ``dt=yyyy-MM-dd`` subpartition under
    ``tier=<t>/measurement=<m>/``, stamped from event time at write.
    Retention then drops whole expired day directories (a metadata
    operation — no rewrite of surviving rows, TTL lag bounded by one
    day), and time-ranged reads prune to the covered days
    (:meth:`read_tier` with ``from_epoch``/``to_epoch``). Off by
    default: the flat layout stays row-exact for small deployments and
    every existing test/oracle."""

    def __init__(self, spark: SparkSession, root: str, date_partition: bool = False):
        self.spark = spark
        self.root = root
        self.date_partition = date_partition
        #: partition columns under the root (tier first, then measurement
        #: and, in the dated layout, the day)
        self._pcols = (
            (*WAREHOUSE_PARTITION_COLUMNS, "dt")
            if date_partition
            else WAREHOUSE_PARTITION_COLUMNS
        )

    # -- paths -------------------------------------------------------------
    def tier_path(self, tier: str) -> str:
        return os.path.join(self.root, f"tier={tier}")

    def _has_data(self, path: str) -> bool:
        return os.path.isdir(path) and any(
            f.endswith(".parquet") for _, _, fs in os.walk(path) for f in fs
        )

    def _swap_in(self, tmp: str, dst: str) -> None:
        """Publish a rewritten directory via rename-aside: the live copy
        is renamed out of the way, the replacement renamed in, and only
        then is the old copy deleted — the not-there window is two cheap
        renames instead of a full ``rmtree`` of the live data. (Single
        local filesystem; on an object store this becomes a manifest
        pointer flip.) Holds _SWAP_LOCK across the window so a concurrent
        reader's recovery pass cannot rename ``.old`` back over ``dst``
        mid-swap (which would fail the final rename and abandon the
        replacement data)."""
        old = dst + ".old"
        with _SWAP_LOCK:
            _recover_crashed_swap(dst)
            if os.path.isdir(old):
                shutil.rmtree(old)
            if os.path.isdir(dst):
                os.rename(dst, old)
            os.rename(tmp, dst)
            shutil.rmtree(old, ignore_errors=True)

    def _stamp_dt(self, df: DataFrame) -> DataFrame:
        if self.date_partition and "dt" not in df.columns:
            df = df.withColumn("dt", F.date_format("ts", "yyyy-MM-dd"))
        return df

    def _read_hwm_sidecar(self, tier: str) -> int | None:
        try:
            with open(os.path.join(self.tier_path(tier), "_hwm")) as f:
                return int(f.read().strip())
        except (OSError, ValueError):
            return None

    # -- write -------------------------------------------------------------
    def write_points(self, points: DataFrame, mode: str = "append", sort: bool = True) -> None:
        """S4: append datapoints into their tier partitions. ``tier`` is
        stamped from the measurement when absent (mapping.go:146-154).

        Rows are sorted (series_id, ts) within each task before the
        write — no shuffle, but every parquet file comes out clustered,
        so its rowgroup min/max stats are tight and time-range /
        series predicates skip rowgroups instead of scanning them (the
        cheap half of Z-ordering, free at write time)."""
        out = points
        if "tier" not in out.columns:
            out = out.withColumn("tier", write_retention_col(F.col("measurement")))
        if self.date_partition and "dt" not in out.columns:
            out = out.withColumn("dt", F.date_format("ts", "yyyy-MM-dd"))
        if sort:
            out = out.sortWithinPartitions("series_id", "ts")
        (
            out.write.mode(mode)
            .partitionBy(*self._pcols)
            .parquet(self.root)
        )

    # -- read --------------------------------------------------------------
    def read_tier(
        self,
        tier: str,
        from_epoch: int | None = None,
        to_epoch: int | None = None,
    ) -> DataFrame | None:
        """Partition-pruned scan of one tier; None when empty (the planner
        treats a missing tier as no data, like a missing RP).

        In the dated layout, ``from_epoch``/``to_epoch`` additionally
        prune the ``dt`` day partitions covering the range (the ``ts``
        row predicate itself cannot prune directories — the day bounds
        can), then the row-exact ``ts`` filter applies as usual."""
        path = self.tier_path(tier)
        _recover_crashed_swap(path)
        _recover_measurement_swaps(path)
        if not self._has_data(path):
            return None
        # read via the root with basePath so partition columns survive,
        # and pin the tier -> Catalyst prunes to the one subdirectory
        df = self.spark.read.option("basePath", self.root).parquet(path)
        if self.date_partition and "dt" in df.columns:
            if from_epoch is not None:
                df = df.where(
                    F.col("dt") >= F.date_format(F.timestamp_seconds(F.lit(int(from_epoch))), "yyyy-MM-dd")
                )
            if to_epoch is not None:
                df = df.where(
                    F.col("dt") <= F.date_format(F.timestamp_seconds(F.lit(int(to_epoch))), "yyyy-MM-dd")
                )
            df = df.drop("dt")
        # r13 (guide §6): sargable timestamp-literal forms instead of
        # unix_timestamp(ts) — the function-wrapped predicate can never
        # reach the parquet scan, the literal form lands in PushedFilters
        # and rowgroup min/max stats prune (same convention the planner
        # adopted in r10). Exactly equivalent on integer epochs:
        # unix(ts) >= X  <=>  ts >= X;  unix(ts) <= X  <=>  ts < X+1
        # (unix_timestamp floors to whole seconds).
        if from_epoch is not None:
            df = df.where(F.col("ts") >= F.timestamp_seconds(F.lit(int(from_epoch))))
        if to_epoch is not None:
            df = df.where(F.col("ts") < F.timestamp_seconds(F.lit(int(to_epoch) + 1)))
        return df.withColumn("tier", F.lit(tier))

    def tier_reader(self):
        """Adapter for QueryPlanner(tier_reader=...)."""
        return self.read_tier

    def with_read_retry(self, build_and_run, attempts: int = 3):
        """Serve reads across concurrent rename-aside swaps, like the
        reference's always-on query path (storage/influxdb_v1.go:87-95
        serves HTTP queries while writes land). A DataFrame planned
        before :meth:`_swap_in` holds the pre-swap file listing; an
        action after the swap then throws FileNotFoundException for the
        renamed-away files. ``build_and_run`` must BUILD the query (so a
        retry re-lists the directory) and RUN the action; on a
        missing-file failure the warehouse root's cached file listings
        are invalidated (Spark's shared InMemoryFileIndex status cache —
        without the refresh a rebuilt reader can resurface the stale
        snapshot) and the closure re-runs against the newly-published
        directory. Any other failure propagates unchanged."""
        for attempt in range(attempts):
            try:
                return build_and_run()
            except Exception as e:  # noqa: BLE001
                msg = str(e)
                stale = "FileNotFoundException" in msg or "does not exist" in msg
                if not stale or attempt == attempts - 1:
                    raise
                try:
                    self.spark.catalog.refreshByPath(self.root)
                except Exception:  # noqa: BLE001 - best-effort cache purge
                    pass

    def write_bucketed(
        self,
        points: DataFrame,
        table: str,
        n_buckets: int = 32,
        bucket_col: str = "series_id",
        mode: str = "append",
    ) -> None:
        """Bucketed + sorted materialization for co-located per-series
        work: ``CLUSTERED BY (series_id) SORTED BY (ts) INTO n BUCKETS``.

        Any downstream groupBy/join/window keyed on ``series_id`` then
        reads pre-shuffled data — Catalyst sees the bucket spec and
        plans NO Exchange (asserted in tests). At 100 TB this is the
        difference between re-shuffling the fact table per reprocessing
        job and shuffling once at write time; pick n_buckets ≈ cluster
        cores × small factor so each bucket is one task.
        """
        (
            points.write.mode(mode)
            .bucketBy(n_buckets, bucket_col)
            .sortBy(bucket_col, "ts")
            .option("path", os.path.join(self.root, "_bucketed", table))
            .format("parquet")
            .saveAsTable(table)
        )

    def high_water_mark(self, tier: str) -> int | None:
        """Max materialized bucket ts (epoch s) in a tier, None if empty.

        Fast path: a tiny ``_hwm`` sidecar file written by
        :meth:`record_high_water_mark` after each incremental cascade run
        — O(1) regardless of tier size. Fallback: one max() over the
        tier's ts column. Note the fallback IS a column scan: Spark only
        answers max() from parquet footer stats when
        ``spark.sql.parquet.aggregatePushdown`` is enabled (off by
        default), so at scale the sidecar is the path that matters.
        """
        sidecar = os.path.join(self.tier_path(tier), "_hwm")
        try:
            with open(sidecar) as f:
                return int(f.read().strip())
        except (OSError, ValueError):
            pass
        df = self.read_tier(tier)
        if df is None:
            return None
        row = df.agg(F.max("ts").alias("m")).collect()[0]
        return None if row["m"] is None else int(row["m"].timestamp())

    def replace_points_from(self, points: DataFrame, tier: str, from_epoch: int) -> None:
        """Idempotently re-materialize a tier's tail: every existing row
        with ``ts >= from_epoch`` is replaced by ``points`` (the
        recomputed buckets). Used by the cascade's trailing-window re-run
        (late-data absorption). Publishes via the rename-aside swap
        (:meth:`_swap_in`) — the no-directory window is two renames, and
        the old data is deleted only after the new tier is live. Only the
        affected (tier, measurement) partitions are rewritten; at 100 TB
        a date subpartition makes the kept-prefix rewrite a file move,
        not a scan.

        The tier's ``_hwm`` sidecar is re-recorded after the swap (the
        rewrite replaces the directory that held it): the new high-water
        mark is read back from the rewritten tail only — a
        rowgroup-pruned ``ts >= from_epoch`` scan of the fresh files,
        never a full-tier scan — falling back to the old sidecar value
        when it predates the rewritten range."""
        old_hwm = self._read_hwm_sidecar(tier)
        df = self.read_tier(tier)
        new = points.drop("tier") if "tier" in points.columns else points
        if df is not None:
            # sargable form (r13): unix(ts) < X <=> ts < X on integer X
            keep = df.where(
                F.col("ts") < F.timestamp_seconds(F.lit(int(from_epoch)))
            ).drop("tier")
            merged = keep.unionByName(new, allowMissingColumns=True)
        else:
            merged = new
        tmp = self.tier_path(tier) + ".rewriting"
        (
            self._stamp_dt(merged)
            .sortWithinPartitions("series_id", "ts")
            .write.mode("overwrite")
            .partitionBy(*self._pcols[1:])
            .parquet(tmp)
        )
        tail_max = (
            self.spark.read.parquet(tmp)
            .where(F.col("ts") >= F.timestamp_seconds(F.lit(int(from_epoch))))
            .agg(F.max("ts").alias("m"))
            .collect()[0]["m"]
        )
        self._swap_in(tmp, self.tier_path(tier))
        if tail_max is not None:
            self.record_high_water_mark(tier, int(tail_max.timestamp()))
        elif old_hwm is not None and old_hwm < from_epoch:
            self.record_high_water_mark(tier, old_hwm)

    def record_high_water_mark(self, tier: str, epoch_s: int) -> None:
        """Persist the tier's max materialized bucket ts so later
        incremental runs skip the fallback scan. Written atomically
        (tmp + rename) because a concurrent reader hitting a torn file
        would silently fall back to the scan path — correct but slow."""
        tp = self.tier_path(tier)
        os.makedirs(tp, exist_ok=True)
        tmp = os.path.join(tp, "_hwm.tmp")
        with open(tmp, "w") as f:
            f.write(str(int(epoch_s)))
        os.replace(tmp, os.path.join(tp, "_hwm"))

    # -- catalog (§2.10) ---------------------------------------------------
    def measurements(self) -> list[str]:
        """SHOW MEASUREMENTS (influxdb_v1.go:376-393): distinct measurement
        partition values across tiers — a directory listing, no scan."""
        out: set[str] = set()
        for tier in TIERS:
            tp = self.tier_path(tier)
            if not os.path.isdir(tp):
                continue
            _recover_measurement_swaps(tp)
            for d in os.listdir(tp):
                if d.startswith("measurement="):
                    out.add(d.split("=", 1)[1])
        return sorted(out)

    def retention_policies(self) -> list[dict]:
        """SHOW RETENTION POLICIES (influxdb_v1.go:396-413)."""
        return [
            {"name": t, "duration_seconds": TIER_TTL_SECONDS[t], "default": t == "gen_raw"}
            for t in TIERS
        ]

    def drop_measurement(self, measurement: str) -> int:
        """DROP MEASUREMENT (delete_object, admin.go:334-369): remove the
        measurement's partition directory from every tier."""
        dropped = 0
        for tier in TIERS:
            p = os.path.join(self.tier_path(tier), f"measurement={measurement}")
            if os.path.isdir(p):
                shutil.rmtree(p)
                dropped += 1
        return dropped

    def delete_points(
        self,
        measurement: str | None = None,
        from_epoch: int | None = None,
        to_epoch: int | None = None,
        tag_predicates: "list[tuple[str, str, str]] | None" = None,
    ) -> int:
        """InfluxQL ``DELETE [FROM m] [WHERE time ...]``: remove the
        rows in the (optional) time window, returning the deleted count.
        ``to_epoch`` is exclusive, ``from_epoch`` inclusive — matching
        InfluxDB's ``time >= a AND time < b`` delete idiom.

        Scale shape: with a measurement the rewrite touches only that
        measurement's partition directory per tier (never the tier's
        other measurements); an unbounded-measurement delete rewrites
        each populated tier once. Each rewrite is filter + write + the
        rename-aside swap (:meth:`_swap_in`); a fully-emptied partition
        is removed instead of rewritten, which makes
        ``DELETE FROM m`` (no WHERE) a directory drop, and in the dated
        layout a ``time <`` cutoff aligned to day boundaries is mostly
        directory drops too (the TTL enforcement path)."""
        match = F.lit(True)
        # sargable forms (r13): exactly equivalent on integer epochs
        if from_epoch is not None:
            match = match & (F.col("ts") >= F.timestamp_seconds(F.lit(int(from_epoch))))
        if to_epoch is not None:
            match = match & (F.col("ts") < F.timestamp_seconds(F.lit(int(to_epoch))))
        # tag-equality restriction (public InfluxQL DELETE surface, r9
        # second session): ``(key, "="|"!=", value)`` triples ANDed in.
        # InfluxDB treats a missing tag as the EMPTY value, not as
        # unknown, so the column is coalesced to '' before comparing —
        # that makes the match total in BOTH directions: ``!=`` deletes
        # rows with absent tags (plain SQL ``!=`` would skip them) and
        # ``= ''`` also hits rows whose tag column is NULL (r10,
        # ADVICE: eqNullSafe(NULL, '') was false so empty-value deletes
        # missed absent tags)
        for key, op, val in tag_predicates or ():
            cond = F.coalesce(F.col(key), F.lit("")) == F.lit(val)
            match = match & (cond if op == "=" else ~cond)
        deleted = 0
        for tier in TIERS:
            tp = self.tier_path(tier)
            _recover_crashed_swap(tp)
            if measurement is not None:
                dirs = [os.path.join(tp, f"measurement={measurement}")]
            else:
                dirs = (
                    [os.path.join(tp, d) for d in os.listdir(tp) if d.startswith("measurement=")]
                    if os.path.isdir(tp)
                    else []
                )
            for mdir in dirs:
                # measurement-level twin of the tier-level recovery: a
                # crash between _swap_in's two renames leaves only
                # measurement=m.old, which _has_data would skip forever
                _recover_crashed_swap(mdir)
                if not self._has_data(mdir):
                    continue
                df = self.spark.read.option("basePath", self.root).parquet(mdir)
                # one counting pass answers both "anything to delete?"
                # and "anything left?" — no separate isEmpty scan
                row = df.agg(
                    F.count(F.when(match, True)).alias("n_del"),
                    F.count(F.lit(1)).alias("n_all"),
                ).collect()[0]
                if row["n_del"] == 0:
                    continue
                deleted += row["n_del"]
                if row["n_del"] == row["n_all"]:
                    shutil.rmtree(mdir)
                    continue
                keep = df.where(~match).drop(*self._pcols[:2])
                # tmp lives under the root (underscore prefix: invisible
                # to partition discovery), NOT inside the tier dir where
                # a reader could glimpse it as a phantom partition
                tmp = os.path.join(self.root, "_delete.rewriting")
                shutil.rmtree(tmp, ignore_errors=True)
                (
                    keep.sortWithinPartitions("series_id", "ts")
                    .write.mode("overwrite")
                    .partitionBy(*self._pcols[2:])
                    .parquet(tmp)
                )
                self._swap_in(tmp, mdir)
        return deleted

    def drop_tier(self, tier: str) -> bool:
        """DROP RETENTION POLICY."""
        p = self.tier_path(tier)
        if os.path.isdir(p):
            shutil.rmtree(p)
            return True
        return False

    def drop_db(self) -> int:
        """DROP DATABASE (delete_object object_type=database,
        admin.go:359-362 -> influxdb_v1.go:281-290): remove every tier,
        bucketed table, and sidecar under the warehouse root — the
        single-database engine's equivalent of InfluxDB v1's
        ``DROP DATABASE <name>``. Returns the number of tiers dropped."""
        dropped = sum(1 for t in TIERS if self.drop_tier(t))
        if os.path.isdir(self.root):
            for d in os.listdir(self.root):
                p = os.path.join(self.root, d)
                if os.path.isdir(p):
                    shutil.rmtree(p)
                else:
                    os.remove(p)
        return dropped

    def register_views(self, name: str = "datapoints") -> list[str]:
        """Register SQL views: one per tier (``<name>_<tier>``) plus a
        union view ``<name>`` over every populated tier — the table
        surface behind the Q1 raw-SQL endpoint. Tier + measurement
        predicates in user SQL still prune partitions (the views are thin
        wrappers over the partitioned scans)."""
        registered = []
        union = None
        for tier in TIERS:
            df = self.read_tier(tier)
            if df is None:
                continue
            vname = f"{name}_{tier}"
            df.createOrReplaceTempView(vname)
            registered.append(vname)
            union = df if union is None else union.unionByName(df, allowMissingColumns=True)
        if union is not None:
            union.createOrReplaceTempView(name)
            registered.append(name)
        return registered

    def compact(self, tier: str, target_files_per_measurement: int = 1) -> bool:
        """Small-file compaction: streaming micro-batches leave one file
        per trigger per partition; rewrite the tier with ``repartition``
        so each measurement partition holds ~target file count. Run
        alongside the TTL job. (At 100 TB: compact only partitions whose
        file count exceeds a threshold, tracked from the file index.)"""
        df = self.read_tier(tier)
        if df is None:
            return False
        hwm = self._read_hwm_sidecar(tier)
        tmp = self.tier_path(tier) + ".compacting"
        (
            self._stamp_dt(df.drop("tier"))
            .repartition(target_files_per_measurement, "measurement")
            .write.mode("overwrite")
            .partitionBy(*self._pcols[1:])
            .parquet(tmp)
        )
        self._swap_in(tmp, self.tier_path(tier))
        if hwm is not None:  # compaction moves bytes, not rows: HWM unchanged
            self.record_high_water_mark(tier, hwm)
        return True

    # -- retention TTL (the RP enforcement job) ----------------------------
    def enforce_retention(self, now_epoch: int, ttl_overrides: dict | None = None) -> dict:
        """Delete rows older than the tier's TTL (influxdb_v1.go:45-57).

        Rewrites each affected (tier, measurement) partition without the
        expired rows; partitions whose min(ts) is young are skipped via
        parquet statistics (one tiny footer read, no data scan).
        Returns {tier: rows_deleted}.
        """
        ttls = {**TIER_TTL_SECONDS, **(ttl_overrides or {})}
        if self.date_partition:
            return self._enforce_retention_by_partition_drop(now_epoch, ttls)
        deleted: dict[str, int] = {}
        for tier in TIERS:
            df = self.read_tier(tier)
            if df is None:
                continue
            cutoff = now_epoch - ttls[tier]
            # sargable forms (r13): unix(ts) <= c <=> ts < c+1, and
            # unix(ts) > c <=> ts >= c+1 — the literal predicates reach
            # PushedFilters, so a tier whose rowgroups are all young
            # answers the expired-count from min/max stats without a
            # data scan (the behavior the docstring always promised)
            cut_lit = F.timestamp_seconds(F.lit(int(cutoff) + 1))
            expired = df.where(F.col("ts") < cut_lit)
            n = expired.count()
            if n == 0:
                continue
            hwm = self._read_hwm_sidecar(tier)
            keep = df.where(F.col("ts") >= cut_lit).drop("tier")
            tmp = self.tier_path(tier) + ".compacting"
            keep.write.mode("overwrite").partitionBy("measurement").parquet(tmp)
            self._swap_in(tmp, self.tier_path(tier))
            if hwm is not None and hwm > cutoff:
                # TTL drops old rows only; the max materialized bucket
                # survives unless the whole tier expired
                self.record_high_water_mark(tier, hwm)
            deleted[tier] = n
        return deleted

    def _enforce_retention_by_partition_drop(self, now_epoch: int, ttls: dict) -> dict:
        """Dated-layout TTL: delete every ``dt=`` day directory whose
        whole day precedes the cutoff day — a directory removal, no scan
        or rewrite of surviving data (the property that makes retention
        affordable at 100 TB). Rows inside the cutoff's own partial day
        outlive their TTL by at most one day — the standard
        day-granularity retention trade, explicit here. Returns
        {tier: rows_deleted} (row counts come from parquet metadata of
        the dropped directories only).

        The cutoff day is derived through the same ``date_format`` the
        writer stamps ``dt`` with — i.e. in the Spark session timezone,
        not hardcoded UTC — so a non-UTC session never drops a day
        directory before its TTL actually expires."""
        # one 1-row job stamps every tier's cutoff day with the session tz
        cutoff_row = (
            self.spark.range(1, numPartitions=1)
            .select(
                *[
                    F.date_format(
                        F.timestamp_seconds(F.lit(int(now_epoch - ttls[t]))),
                        "yyyy-MM-dd",
                    ).alias(t)
                    for t in TIERS
                ]
            )
            .collect()[0]
        )
        deleted: dict[str, int] = {}
        for tier in TIERS:
            tp = self.tier_path(tier)
            if not os.path.isdir(tp):
                continue
            cutoff_day = cutoff_row[tier]
            doomed = []
            for mdir in os.listdir(tp):
                mp = os.path.join(tp, mdir)
                if not (mdir.startswith("measurement=") and os.path.isdir(mp)):
                    continue
                for ddir in os.listdir(mp):
                    if ddir.startswith("dt=") and ddir.split("=", 1)[1] < cutoff_day:
                        doomed.append(os.path.join(mp, ddir))
            if not doomed:
                continue
            # metadata-only count (parquet footers), then the drop
            n = self.spark.read.parquet(*doomed).count()
            for d in doomed:
                shutil.rmtree(d)
            if n:
                deleted[tier] = n
        return deleted


def write_csv(points: DataFrame, path: str, mode: str = "append") -> None:
    """S7 CSV sink (storage/csv.go:26-113): the canonical 11-column flat
    rows, epoch-second time, header matching csv.go:22."""
    flat = points.select(
        F.col("measurement").alias("name"),
        F.unix_timestamp("ts").alias("time"),
        "dev_id",
        "dev_type",
        "dir",
        "location_id",
        "service",
        "src",
        "topic",
        F.coalesce(
            F.col("value_f").cast("string"),
            F.col("value_b").cast("string"),
            F.col("value_s"),
        ).alias("value"),
        "unit",
    )
    flat.write.mode(mode).option("header", True).csv(path)
