"""Oracle gates for the training-data assembly operators
(datapipe/packing.py): concat-and-chunk sequence packing and
deterministic domain mixing. The SQL twins recompute the same md5-derived
order/probability, so every integer in the placement map is value-matched
— including the equivalence of the Spark side's two-level distributed
prefix sum with the oracle's single global running sum."""

from __future__ import annotations

from ecollector_spark.datapipe import packing
from ecollector_spark.driver_queries import register
from ecollector_spark.session import read_parquet
from ecollector_spark.driver_queries.datapipe import _TOKS

_SEQ = 512

_PLACED = f"""t AS (SELECT doc_id, CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
           ('0x' || substr(md5('pack|' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS k
      FROM documents),
nz AS (SELECT * FROM t WHERE n_tokens > 0),
o AS (SELECT doc_id, n_tokens,
             CAST(sum(n_tokens) OVER (ORDER BY k, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS BIGINT)
               AS start_off
      FROM nz),
p AS (SELECT doc_id, n_tokens, start_off,
             start_off // {_SEQ} AS first_seq,
             (start_off + n_tokens - 1) // {_SEQ} AS last_seq
      FROM o)"""


@register(
    "datapipe_pack_sequences",
    f"""WITH {_PLACED}
SELECT doc_id, n_tokens, start_off, first_seq, last_seq,
       last_seq - first_seq + 1 AS n_seqs
FROM p ORDER BY doc_id
""",
)
def datapipe_pack_sequences(spark, sf_dir):
    """Concat-and-chunk packing into 512-token context windows: the
    doc-level placement map (global token offset + window span per doc).
    The Spark plan is the distributed two-level prefix sum (chunked by a
    monotone md5-range, per-chunk windows only); the oracle is the naive
    single global running sum — bit-equal placement proves the
    decomposition."""
    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    return packing.pack_sequences(docs, _SEQ).orderBy("doc_id")


@register(
    "datapipe_pack_manifest",
    f"""WITH {_PLACED},
s AS (SELECT start_off, n_tokens,
             unnest(generate_series(first_seq, last_seq)) AS seq_id
      FROM p)
SELECT seq_id, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(least(start_off + n_tokens, (seq_id + 1) * {_SEQ})
                - greatest(start_off, seq_id * {_SEQ})) AS BIGINT) AS n_tokens
FROM s GROUP BY seq_id ORDER BY seq_id
""",
    shelved=True,
)
def datapipe_pack_manifest(spark, sf_dir):
    """Per-window roll-up of the packing map: every 512-token window
    carries exactly 512 tokens except the final partial one, and doc
    spans account for straddled boundaries."""
    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    placed = packing.pack_sequences(docs, _SEQ)
    return packing.sequence_manifest(placed, _SEQ)


@register(
    "datapipe_mix_weights",
    """WITH t AS (SELECT doc_id, source,
  CASE source WHEN 'src0' THEN 2.5 WHEN 'src1' THEN 0.25 WHEN 'src2' THEN 0.0
              ELSE 1.0 END AS w,
  ('0x' || substr(md5('mix|' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
    / 1152921504606846976.0 AS u
  FROM documents),
n AS (SELECT doc_id, source,
             CAST(floor(w) + CASE WHEN u < w - floor(w) THEN 1 ELSE 0 END AS INT) AS nc
      FROM t)
SELECT doc_id, source, CAST(unnest(generate_series(1, nc)) AS INT) AS copy
FROM n WHERE nc >= 1 ORDER BY doc_id, copy
""",
    # r12 optimization round: restored to main — the optimization driver
    # re-runs every query declared in r11; none may disappear.
)
def datapipe_mix_weights(spark, sf_dir):
    """Deterministic domain mixing: src0 upsampled to 2.5 epochs, src1
    downsampled to a quarter, src2 dropped, the rest kept at 1.0 — each
    doc's copy count a pure md5 function of its id, so the SQL twin
    reproduces the exact emitted multiset."""
    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    out = packing.mix_by_weight(
        docs, {"src0": 2.5, "src1": 0.25, "src2": 0.0}, domain_col="source"
    )
    return out.orderBy("doc_id", "copy")


@register(
    "datapipe_export_shards",
    """WITH h AS (SELECT
  CAST(('0x' || substr(md5('shard|' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 8 AS INT) AS shard,
  ('0x' || substr(md5(
      coalesce(CAST(doc_id AS VARCHAR), chr(0)) || chr(31)
      || coalesce(text, chr(0)) || chr(31) || coalesce(lang, chr(0)) || chr(31)
      || coalesce(source, chr(0)) || chr(31)
      || coalesce(CAST(n_chars AS VARCHAR), chr(0))), 1, 15))::BIGINT AS rh
FROM documents)
SELECT shard, count(*) AS n_rows, bit_xor(rh) AS checksum
FROM h GROUP BY shard ORDER BY shard
""",
    shelved=True,  # rotated out r10: pack_sequences + mix_weights + streaming_ingest keep the assembly family; datapipe_perplexity (new CCNet stage) takes the slot
)
def datapipe_export_shards(spark, sf_dir):
    """Sharded export boundary as a value gate: documents -> 8
    md5-sharded parquet shards -> manifest recomputed FROM THE WRITTEN
    FILES (counts + order-insensitive bit-XOR row checksums). The oracle
    derives the same manifest from the source table, so dropped rows,
    duplicate partitions or column corruption in the write path is a
    hash mismatch."""
    import tempfile

    from ecollector_spark.datapipe.export import export_shards

    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    out = tempfile.mkdtemp(prefix="ec_shards_")
    return export_shards(docs, out, 8)


@register(
    "datapipe_leakage_safe_split",
    """SELECT doc_id,
       CASE WHEN ('0x' || substr(md5('split|' || md5(text)), 1, 15))::BIGINT
                 / 1152921504606846976.0 < 0.1
            THEN 'val' ELSE 'train' END AS split
FROM documents ORDER BY doc_id
""",
    shelved=True,
)
def datapipe_leakage_safe_split(spark, sf_dir):
    """Leakage-safe train/val split: the 10% val draw is a pure md5
    function of the duplicate-group key (md5 of the text), so exact
    duplicates always land on the same side — eval can't score training
    content."""
    from ecollector_spark.datapipe.packing import leakage_safe_split

    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    return leakage_safe_split(docs, 0.1).orderBy("doc_id")

@register(
    "datapipe_epoch_order",
    """SELECT doc_id,
       CAST(row_number() OVER (
         ORDER BY ('0x' || substr(md5('ord|7|' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT,
                  doc_id) - 1 AS BIGINT) AS pos
FROM documents ORDER BY doc_id
""",
    shelved=True,
)
def datapipe_epoch_order(spark, sf_dir):
    """Deterministic epoch shuffle: every doc gets a position in a
    seed-keyed global permutation. The Spark side is the chunked
    two-level prefix decomposition (no unbounded window over data
    rows); the oracle is the naive global row_number — bit-equal
    positions prove the decomposition."""
    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    return packing.epoch_order(docs, seed="7").orderBy("doc_id")
