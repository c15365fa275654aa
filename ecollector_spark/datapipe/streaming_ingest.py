"""Streaming corpus ingestion with cross-batch dedup — the continuous
form of the training-data pipeline's ingest step.

A document stream (any Structured Streaming source producing
``(doc_id, text, ...)``) runs through ``foreachBatch``; each micro-batch
is deduplicated against the compact manifests of everything already
ingested (:func:`ecollector_spark.datapipe.dedup.dedup_incremental` —
distinct-md5 set + minhash signature table, the historical text is never
re-read), the survivors append to the corpus, and the manifests fold
forward atomically. At 100 TB of accumulated corpus the per-batch cost
is the batch's own signatures plus three equi-joins on uniform hash
keys — independent of corpus text size.

Delivery semantics: Structured Streaming may REPLAY a batch after a
failure (foreachBatch is at-least-once). The design is idempotent
without a transaction log: a replayed batch's documents are, by
construction, already in the exact manifest, so every row classifies as
``dup_exact_seen`` and the corpus append + manifest fold are both
no-ops. The one non-idempotent window — crash AFTER the corpus append
but BEFORE the manifest publish — is closed by ordering: the manifests
are published FIRST (rename-aside, atomic), so a replay after any crash
point sees the folded state and appends nothing. A crash between
publish and append can lose the batch's corpus rows while the manifest
already lists them; `repair` (re-append missing kept docs by replaying
the batch with ``force=True``) is the documented recovery, preferred
over the reverse ordering because duplicating corpus rows silently
corrupts training data while missing rows are detectable
(manifest count > corpus count).

No reference counterpart (the reference ingests metering points, not
documents); this composes the gated dedup operators with the streaming
machinery of §2.8.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ecollector_spark.datapipe import dedup


class StreamingCorpusIngest:
    """State layout under ``root``::

        corpus/            appended parquet of kept documents
        manifest_exact/    distinct md5(text) of the ingested corpus
        manifest_sigs/     minhash signature table (doc_id, mh_0..mh_n)

    Manifests publish via rename-aside swap (write to ``.next``, swap),
    so readers and replays never see a half-written manifest.
    """

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        text_col: str = "text",
        k: int = 3,
        num_hashes: int = 8,
        bands: int = 4,
        min_sig_agree: float = 0.5,
    ):
        self.spark = spark
        self.root = root
        self.text_col = text_col
        self.k = k
        self.num_hashes = num_hashes
        self.bands = bands
        self.min_sig_agree = min_sig_agree
        os.makedirs(root, exist_ok=True)

    # -- state -------------------------------------------------------------
    def _path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def _read_or_none(self, name: str) -> DataFrame | None:
        p = self._path(name)
        _recover(p)
        if not os.path.isdir(p) or not any(
            f.endswith(".parquet") for _, _, fs in os.walk(p) for f in fs
        ):
            return None
        return self.spark.read.parquet(p)

    def manifests(self) -> tuple[DataFrame, DataFrame]:
        """Current ``(seen_exact, seen_sigs)`` — empty frames before the
        first batch."""
        ex = self._read_or_none("manifest_exact")
        sg = self._read_or_none("manifest_sigs")
        if ex is None:
            ex = self.spark.createDataFrame([], "text_hash string")
        if sg is None:
            sg = self.spark.createDataFrame(
                [],
                "doc_id long, " + ", ".join(f"mh_{i} string" for i in range(self.num_hashes)),
            )
        return ex, sg

    def corpus(self) -> DataFrame | None:
        return self._read_or_none("corpus")

    # -- the foreachBatch target -------------------------------------------
    def process_batch(self, batch_df: DataFrame, batch_id: int) -> dict:
        """Dedup one micro-batch against the manifests, publish the
        folded manifests (atomic, FIRST — see the module docstring's
        replay analysis), then append the kept documents to the corpus.
        Returns the per-status decision counts (also usable directly on
        a static frame for batch backfills)."""
        seen_exact, seen_sigs = self.manifests()
        batch_df = batch_df.localCheckpoint(eager=True)  # source read once
        decisions = dedup.dedup_incremental(
            batch_df,
            seen_exact,
            seen_sigs,
            text_col=self.text_col,
            k=self.k,
            num_hashes=self.num_hashes,
            bands=self.bands,
            min_sig_agree=self.min_sig_agree,
        ).localCheckpoint(eager=True)
        counts = {
            r["status"]: r["n"]
            for r in decisions.groupBy("status").agg(F.count("*").alias("n")).collect()
        }
        if counts.get("kept", 0) == 0:
            return counts
        kept = decisions.where(F.col("status") == "kept").select("doc_id")
        kept_docs = batch_df.join(kept, "doc_id").localCheckpoint(eager=True)
        new_exact, new_sigs = dedup.fold_manifests(
            seen_exact,
            seen_sigs,
            kept_docs,
            decisions,
            text_col=self.text_col,
            k=self.k,
            num_hashes=self.num_hashes,
        )
        # publish manifests first (atomic swap each), then append the
        # corpus — a replay after ANY crash point reclassifies the whole
        # batch as dup_exact_seen and appends nothing twice
        self._publish("manifest_exact", new_exact)
        self._publish("manifest_sigs", new_sigs)
        kept_docs.write.mode("append").parquet(self._path("corpus"))
        return counts

    def _publish(self, name: str, df: DataFrame) -> None:
        dst, tmp = self._path(name), self._path(name + ".next")
        shutil.rmtree(tmp, ignore_errors=True)
        df.write.mode("overwrite").parquet(tmp)
        _recover(dst)
        old = dst + ".old"
        if os.path.isdir(old):
            shutil.rmtree(old)
        if os.path.isdir(dst):
            os.rename(dst, old)
        os.rename(tmp, dst)
        shutil.rmtree(old, ignore_errors=True)

    # -- stream wiring ------------------------------------------------------
    def start(self, stream_df: DataFrame, checkpoint: str, available_now: bool = True):
        """Attach to a document stream. ``availableNow`` drains pending
        input and stops (the batch-replay / backfill trigger); pass
        False for a continuous micro-batch query."""
        writer = (
            stream_df.writeStream.outputMode("append")
            .option("checkpointLocation", checkpoint)
            .foreachBatch(lambda df, bid: self.process_batch(df, bid))
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()


def _recover(dst: str) -> None:
    old = dst + ".old"
    if os.path.isdir(old) and not os.path.isdir(dst):
        os.rename(old, dst)
