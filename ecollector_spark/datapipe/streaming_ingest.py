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
without a transaction log:

- Both manifests live under ONE ``manifests/`` directory and publish as
  ONE rename-aside swap, so the exact set and the signature table can
  never drift apart across a crash.
- The manifest publish happens BEFORE the corpus append. A replay after
  any crash point therefore sees the folded state, classifies the whole
  batch ``dup_exact_seen``, and appends nothing twice — duplicated
  corpus rows (which would silently corrupt training data) are
  impossible.
- The one remaining crash window — after the publish, before the append
  — can lose the batch's corpus rows while the manifest already lists
  them. That state is DETECTABLE (a manifest hash with no corpus row
  carrying it) and :meth:`repair` recovers it from a re-delivery of the
  batch. This direction of the trade is deliberate: missing rows are
  detectable and repairable, duplicates are neither.

No reference counterpart (the reference ingests metering points, not
documents); this composes the gated dedup operators with the streaming
machinery of §2.8. The rename-aside swap is the shared index-publish
protocol (``similarity._publish_dir``), not a third reimplementation.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ecollector_spark.datapipe import dedup
from ecollector_spark.datapipe.similarity import (
    _publish_dir,
    _recover_crashed_publish,
)


class StreamingCorpusIngest:
    """State layout under ``root``::

        corpus/            appended parquet of kept documents
        manifests/exact/   distinct md5(text) of the ingested corpus
        manifests/sigs/    minhash signature table (doc_id, mh_0..mh_n)

    ``manifests/`` publishes via a single rename-aside swap, so readers
    and replays always see the exact set and the signatures from the
    same fold.
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
        compact_at_files: int = 64,
        compact_target_files: int = 8,
    ):
        self.spark = spark
        self.root = root
        self.text_col = text_col
        self.k = k
        self.num_hashes = num_hashes
        self.bands = bands
        self.min_sig_agree = min_sig_agree
        #: corpus small-file bound (VERDICT r5 #5): every micro-batch
        #: append adds >= 1 parquet file, so thousands of batches
        #: collapse the scan into a file-listing storm at 100 TB. When
        #: the corpus exceeds ``compact_at_files`` files, the batch that
        #: crossed the line rewrites it to ``compact_target_files``
        #: (rename-aside publish, same crash protocol as the manifests).
        #: 0 disables. At scale, size target_files ~ bytes/128 MB.
        self.compact_at_files = compact_at_files
        self.compact_target_files = compact_target_files
        os.makedirs(root, exist_ok=True)

    # -- state -------------------------------------------------------------
    def _path(self, *parts: str) -> str:
        return os.path.join(self.root, *parts)

    def _read_or_none(self, *parts: str) -> DataFrame | None:
        p = self._path(*parts)
        if not os.path.isdir(p) or not any(
            f.endswith(".parquet") for _, _, fs in os.walk(p) for f in fs
        ):
            return None
        return self.spark.read.parquet(p)

    def manifests(self) -> tuple[DataFrame, DataFrame]:
        """Current ``(seen_exact, seen_sigs)`` — empty frames before the
        first batch. Signature manifests written before the int64
        migration (mh_i as 4-hex-char strings) are converted on read —
        hex->int preserves the min/collision structure exactly, so a
        legacy manifest keeps classifying identically; the next fold
        publishes longs and the conversion never runs again."""
        _recover_crashed_publish(self._path("manifests"))
        ex = self._read_or_none("manifests", "exact")
        sg = self._read_or_none("manifests", "sigs")
        if ex is None:
            ex = self.spark.createDataFrame([], "text_hash string")
        if sg is None:
            sg = self.spark.createDataFrame(
                [],
                "doc_id long, " + ", ".join(f"mh_{i} long" for i in range(self.num_hashes)),
            )
        elif any(f.name.startswith("mh_") and f.dataType.simpleString() == "string"
                 for f in sg.schema.fields):
            sg = sg.select(
                "doc_id",
                *[
                    F.conv(F.col(f"mh_{i}"), 16, 10).cast("long").alias(f"mh_{i}")
                    for i in range(self.num_hashes)
                ],
            )
        return ex, sg

    def corpus(self) -> DataFrame | None:
        # heal a compaction that died between its two renames (the .old
        # sibling holds the only complete corpus) before reading
        _recover_crashed_publish(self._path("corpus"))
        return self._read_or_none("corpus")

    # -- corpus compaction ---------------------------------------------------
    def _corpus_file_count(self) -> int:
        p = self._path("corpus")
        if not os.path.isdir(p):
            return 0
        return sum(
            1 for _, _, fs in os.walk(p) for f in fs if f.endswith(".parquet")
        )

    def _match_corpus_layout(self, docs: DataFrame) -> DataFrame:
        """Shape a to-append frame to the live corpus layout: stamp the
        ``text_hash`` column on a fresh or already-migrated corpus, omit
        it on a legacy one (pre-column stores stay schema-homogeneous
        until compaction migrates them)."""
        corpus = self.corpus()
        if corpus is not None and "text_hash" not in corpus.columns:
            return docs.drop("text_hash") if "text_hash" in docs.columns else docs
        if "text_hash" in docs.columns:
            return docs
        return docs.withColumn("text_hash", F.md5(F.col(self.text_col)))

    def compact_corpus(self, target_files: int | None = None) -> bool:
        """Rewrite the corpus into ``target_files`` parquet files and
        publish with the rename-aside swap. Moves bytes, never rows —
        manifests are untouched and replay idempotence is unaffected
        (a replayed batch still classifies against the same manifests;
        a crash mid-compaction leaves either the staged ``corpus.next``
        (ignored, overwritten next time) or the ``corpus.old`` window
        that :meth:`corpus` heals on the next read)."""
        corpus = self.corpus()
        if corpus is None:
            return False
        if "text_hash" not in corpus.columns:
            # migrate a legacy (pre-hash-column) store in the rewrite —
            # one extra md5 over text the compaction reads anyway
            corpus = corpus.withColumn("text_hash", F.md5(F.col(self.text_col)))
        target = int(target_files or self.compact_target_files) or 1
        tmp = self._path("corpus.next")
        shutil.rmtree(tmp, ignore_errors=True)
        corpus.repartition(target).write.mode("overwrite").parquet(tmp)
        _publish_dir(tmp, self._path("corpus"))
        return True

    def _maybe_compact(self) -> bool:
        if self.compact_at_files <= 0:
            return False
        if self._corpus_file_count() <= self.compact_at_files:
            return False
        return self.compact_corpus()

    # -- the foreachBatch target -------------------------------------------
    def process_batch(self, batch_df: DataFrame, batch_id: int) -> dict:
        """Dedup one micro-batch against the manifests, publish the
        folded manifests (one atomic swap, FIRST — see the module
        docstring's replay analysis), then append the kept documents to
        the corpus. Returns the per-status decision counts (also usable
        directly on a static frame for batch backfills)."""
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
            # An entirely-dup_exact_seen batch is exactly what the
            # automatic Structured Streaming replay of the
            # publish-then-crash window looks like (manifests folded,
            # corpus append lost, whole batch re-delivered). Run the
            # repair check against THIS batch so the replay itself heals
            # the window instead of silently dropping the lost rows;
            # on a healthy replay repair() appends nothing (corpus
            # already carries every manifest hash of the batch).
            if counts.get("dup_exact_seen", 0) > 0:
                healed = self.repair(batch_df)
                if healed:
                    counts["healed"] = healed
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
        # stage BOTH manifests into one .next tree, publish with ONE
        # swap (they can never drift apart), then append the corpus
        tmp = self._path("manifests.next")
        shutil.rmtree(tmp, ignore_errors=True)
        new_exact.localCheckpoint(eager=True).write.mode("overwrite").parquet(
            os.path.join(tmp, "exact")
        )
        new_sigs.localCheckpoint(eager=True).write.mode("overwrite").parquet(
            os.path.join(tmp, "sigs")
        )
        _publish_dir(tmp, self._path("manifests"))
        # the corpus stores md5(text) as a COLUMN so repair's coverage
        # check is a narrow columnar projection, never a full-text
        # re-hash of the corpus (ADVICE r6: a duplicate-heavy stream
        # triggers the repair check on every all-dup batch). Appends
        # always match the live corpus layout — a legacy store (no hash
        # column) keeps its schema so reads stay homogeneous (a mixed
        # store would surface null hashes and break repair's coverage);
        # the next compaction migrates it wholesale.
        self._match_corpus_layout(kept_docs).write.mode("append").parquet(
            self._path("corpus")
        )
        # bounded small-file growth: runs strictly AFTER the append, so
        # every crash window is one the existing protocol already covers
        self._maybe_compact()
        return counts

    def repair(self, batch_df: DataFrame) -> int:
        """Recover the publish-then-crash window: append the rows of a
        re-delivered batch whose text hash IS in the exact manifest but
        which NO corpus document carries — exactly the rows whose fold
        published but whose append was lost. Batch duplicates and
        near-dup drops are excluded by construction (their hashes are
        either carried by a corpus keeper or were never folded).
        Returns the number of rows re-appended; 0 on a healthy store."""
        seen_exact, _ = self.manifests()
        h = F.md5(F.col(self.text_col)).alias("text_hash")
        batch_h = batch_df.withColumn("text_hash", h)
        corpus = self.corpus()
        # covered = corpus hashes, pruned to THIS batch's hash set (a
        # broadcast semi-join) before the distinct. The corpus side reads
        # the stored text_hash COLUMN (a narrow columnar projection —
        # parquet never touches the text bytes); corpora written before
        # the column existed fall back to re-hashing text once, and the
        # next compaction persists the column
        if corpus is not None:
            corp_h = (
                corpus.select("text_hash")
                if "text_hash" in corpus.columns
                else corpus.select(F.md5(F.col(self.text_col)).alias("text_hash"))
            )
        batch_hashes = batch_h.select("text_hash").distinct()
        covered = (
            corp_h.join(F.broadcast(batch_hashes), "text_hash", "left_semi").distinct()
            if corpus is not None
            else self.spark.createDataFrame([], "text_hash string")
        )
        missing = (
            batch_h.join(seen_exact, "text_hash", "left_semi")
            .join(covered, "text_hash", "left_anti")
        )
        # one keeper per lost hash (min doc_id, like the batch dedup);
        # text_hash stays when the corpus carries the column
        keeper = missing.groupBy("text_hash").agg(F.min("doc_id").alias("doc_id"))
        lost = (
            missing.join(keeper, ["text_hash", "doc_id"])
            .select(*batch_df.columns, "text_hash")
            .localCheckpoint(eager=True)
        )
        n = lost.count()
        if n:
            self._match_corpus_layout(lost).write.mode("append").parquet(
                self._path("corpus")
            )
        return n

    # -- stream wiring ------------------------------------------------------
    def start(self, stream_df: DataFrame, checkpoint: str, available_now: bool = True):
        """Attach to a document stream. ``availableNow`` drains pending
        input and stops (the batch-replay / backfill trigger); pass
        False for a continuous micro-batch query."""
        writer = (
            stream_df.writeStream.outputMode("append")
            .option("checkpointLocation", checkpoint)
            .foreachBatch(self.process_batch)
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()
