"""Training-data assembly operators: sequence packing and domain mixing.

The last mile of an LLM data pipeline after curation/dedup: lay the
surviving documents head-to-tail and cut them into fixed context windows
(GPT-style concat-and-chunk packing), and set per-domain sampling weights
(epochs per source, the data-recipe step). Both are deterministic and
engine-portable (md5-derived order/probability — same construction as
functions/sketches.py), so a plain-SQL twin value-matches them.

No reference counterpart: the reference (thingsplex/ecollector) is a
telemetry collector; these belong to the LLM-data-pipeline family this
engine adds on top (SURVEY "beyond the reference" scope).

Scale shape (100 TB posture):
- ``pack_sequences`` needs a GLOBAL running token offset — the classic
  distributed prefix-sum. A single unpartitioned window would serialize
  the corpus through one task, so it runs as the two-level form: docs
  hash into ``n_chunks`` ordered chunks (a monotone function of the
  order key), per-chunk sums (one tiny groupBy, <= n_chunks rows) are
  prefix-summed on a bounded window and broadcast back, and the
  per-doc offset is a chunk-partitioned window. The only unpartitioned
  window is over <= n_chunks rows — same bounded-boundary-carry pattern
  as gapfill.py's chunked fill.
- ``mix_by_weight`` is expression-only: a literal weight map, an
  md5-unit draw, and a bounded ``explode(sequence(...))`` — no shuffle
  at all (the explode factor is ceil(max weight)).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ecollector_spark.datapipe.text import tokens_expr

#: 60-bit md5 key space (15 hex chars), shared with functions/sketches.py
_KEYSPACE = float(1 << 60)


def _md5_key60(col: Column, salt: str) -> Column:
    """First 60 bits of md5(salt|value) as a bigint — deterministic,
    uniform, and computable verbatim in the SQL twin
    (('0x' || substr(md5(...), 1, 15))::BIGINT)."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), col.cast("string"))), 1, 15), 16, 10
    ).cast("long")


def _chunk_offsets(base: DataFrame, amount: Column) -> DataFrame:
    """Levels 1+2 of the two-level distributed prefix sum shared by
    :func:`pack_sequences` and :func:`epoch_order`: per-chunk totals of
    ``amount`` (<= n_chunks rows), prefix-summed on a bounded
    unpartitioned window (the same boundary-carry budget as gapfill's
    chunked fill) into exclusive chunk offsets ``(_chunk, _coff)``."""
    sums = base.groupBy("_chunk").agg(F.sum(amount).alias("_ctok"))
    w_chunks = Window.orderBy("_chunk").rowsBetween(Window.unboundedPreceding, 0)
    return sums.select(
        "_chunk", (F.sum("_ctok").over(w_chunks) - F.col("_ctok")).alias("_coff")
    )


def pack_sequences(
    docs: DataFrame,
    seq_len: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    token_count_col: str | None = None,
    n_chunks: int = 1024,
    seed: str = "",
) -> DataFrame:
    """Concat-and-chunk packing: order documents deterministically
    (md5 of the id — decorrelated from length/source), lay their tokens
    head-to-tail, and cut the stream into ``seq_len``-token windows.

    Returns the doc-level placement map, one row per non-empty document:
    ``(doc_id, n_tokens, start_off, first_seq, last_seq, n_seqs)`` where
    ``start_off`` is the document's global token offset and
    ``first_seq..last_seq`` the context windows it lands in (a document
    may straddle a boundary — real concat-and-chunk splits it).
    Zero-token documents occupy no window and are excluded.

    ``token_count_col`` substitutes a precomputed count (e.g. a real
    tokenizer's) for the whitespace-token default. ``seed`` salts the
    ordering key — pass the epoch number to re-pack each training epoch
    in a fresh (but fully reproducible) global order; the default keeps
    the historical order.
    """
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive: {seq_len}")
    ntok = (
        F.col(token_count_col).cast("long")
        if token_count_col
        else F.size(tokens_expr(text_col)).cast("long")
    )
    # compare to the empty string, not truthiness: the documented
    # "pass the epoch number" usage must seed epoch 0 too
    salt = "pack|" if seed is None or seed == "" else f"pack|{seed}|"
    key = _md5_key60(F.col(id_col), salt)
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        key.alias("_k"),
        (key / F.lit(_KEYSPACE / n_chunks)).cast("long").alias("_chunk"),
        ntok.alias("n_tokens"),
    ).where(F.col("n_tokens") > 0)

    offsets = _chunk_offsets(base, F.col("n_tokens"))
    # level 3: in-chunk running offset, chunk-partitioned
    w_in = (
        Window.partitionBy("_chunk")
        .orderBy("_k", "doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    placed = (
        base.join(F.broadcast(offsets), "_chunk")
        .withColumn(
            "start_off",
            F.col("_coff") + F.sum("n_tokens").over(w_in) - F.col("n_tokens"),
        )
        .withColumn("first_seq", F.floor(F.col("start_off") / seq_len))
        .withColumn(
            "last_seq", F.floor((F.col("start_off") + F.col("n_tokens") - 1) / seq_len)
        )
    )
    return placed.select(
        "doc_id",
        "n_tokens",
        "start_off",
        "first_seq",
        "last_seq",
        (F.col("last_seq") - F.col("first_seq") + 1).alias("n_seqs"),
    )


def sequence_manifest(placed: DataFrame, seq_len: int) -> DataFrame:
    """Per-window roll-up of a :func:`pack_sequences` placement map:
    ``(seq_id, n_docs, n_tokens)`` — every window carries exactly
    ``seq_len`` tokens except the final partial one. The explode factor
    is each doc's window span (len/seq_len + 1), so output size is
    O(total_tokens / seq_len + n_docs), never quadratic."""
    spans = placed.select(
        "doc_id",
        "start_off",
        "n_tokens",
        F.explode(F.sequence("first_seq", "last_seq")).alias("seq_id"),
    )
    contrib = F.least(
        F.col("start_off") + F.col("n_tokens"), (F.col("seq_id") + 1) * seq_len
    ) - F.greatest(F.col("start_off"), F.col("seq_id") * seq_len)
    return (
        spans.groupBy("seq_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(contrib).alias("n_tokens"),
        )
        .orderBy("seq_id")
    )


def mix_by_weight(
    docs: DataFrame,
    weights: dict[str, float],
    domain_col: str = "source",
    id_col: str = "doc_id",
    default_weight: float = 1.0,
) -> DataFrame:
    """Deterministic fractional sampling for a training mix: a domain
    with weight ``w`` emits each of its documents ``floor(w)`` times,
    plus one more iff the doc's md5-unit draw falls below ``frac(w)`` —
    so the domain's expected epoch count is exactly ``w``. ``w < 1``
    downsamples (keep a w-fraction), ``w > 1`` upsamples (repeat), and
    the choice is a pure function of the doc id: re-runs, retries and
    the SQL twin all agree row for row.

    Returns one row per emitted copy: ``(doc_id, <domain_col>, copy)``
    with ``copy`` in 1..n_copies.
    """
    for d, w in weights.items():
        if w < 0:
            raise ValueError(f"negative weight for {d!r}: {w}")
    if default_weight < 0:
        raise ValueError(f"negative default weight: {default_weight}")
    w_col = F.lit(float(default_weight))
    for d, w in sorted(weights.items()):
        w_col = F.when(F.col(domain_col) == d, F.lit(float(w))).otherwise(w_col)
    u = _md5_key60(F.col(id_col), "mix|") / F.lit(_KEYSPACE)
    n_copies = (
        F.floor(w_col) + F.when(u < w_col - F.floor(w_col), 1).otherwise(0)
    ).cast("int")
    d = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(domain_col),
        n_copies.alias("_n"),
    ).where(F.col("_n") >= 1)
    return d.select(
        "doc_id", domain_col, F.explode(F.sequence(F.lit(1), F.col("_n"))).alias("copy")
    )


def leakage_safe_split(
    docs: DataFrame,
    val_fraction: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str | None = None,
) -> DataFrame:
    """Train/validation split that cannot leak duplicates across the
    boundary: the split draw is a pure md5 function of the document's
    DUPLICATE-GROUP key — exact-duplicate texts (md5 of ``text_col``)
    or, when ``group_col`` names a precomputed near-dup cluster id
    (e.g. dedup.duplicate_clusters output joined on), every member of a
    group lands on the same side. A per-doc draw would put one copy of
    a duplicated document in train and another in val, inflating eval.

    Returns ``(doc_id, split)`` with split in {'train', 'val'};
    expression-only, no shuffle.
    """
    if not (0.0 <= val_fraction <= 1.0):
        raise ValueError(f"val_fraction must be in [0, 1]: {val_fraction}")
    key = F.col(group_col).cast("string") if group_col else F.md5(F.col(text_col))
    u = _md5_key60(key, "split|") / F.lit(_KEYSPACE)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.when(u < val_fraction, "val").otherwise("train").alias("split"),
    )


def epoch_order(
    docs: DataFrame,
    seed: str = "0",
    id_col: str = "doc_id",
    n_chunks: int = 1024,
) -> DataFrame:
    """Deterministic global shuffle for a training epoch: ``(doc_id,
    pos)`` with ``pos`` a permutation of 0..n-1 ordered by
    md5(seed|doc_id). Each epoch's seed yields a fresh order; the same
    seed always yields the same one, so data loaders, retries and the
    SQL twin agree row for row.

    No global window: positions come from the same two-level
    decomposition as :func:`pack_sequences` — the md5 key's top bits
    pick one of ``n_chunks`` chunks, a bounded unpartitioned window over
    the <= n_chunks per-chunk counts yields chunk offsets, and a
    chunk-partitioned rank adds the in-chunk position. The chunk id is
    a monotone function of the key, so (chunk, key, id) order equals
    global (key, id) order."""
    key = _md5_key60(F.col(id_col), f"ord|{seed}|")
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        key.alias("_k"),
        (key / F.lit(_KEYSPACE / n_chunks)).cast("long").alias("_chunk"),
    )
    offsets = _chunk_offsets(base, F.lit(1))
    w_in = Window.partitionBy("_chunk").orderBy("_k", "doc_id")
    return (
        base.join(F.broadcast(offsets), "_chunk")
        .select(
            "doc_id",
            (F.col("_coff") + F.row_number().over(w_in) - 1).alias("pos"),
        )
    )
