"""Composed training-data curation pipeline — the shape a pretraining
corpus actually flows through, built ENTIRELY from the individually-gated
operators (dedup.exact_duplicates' keep-list semantics, text.quality_score,
text.lang_id):

    corpus -> exact-dedup keep-list -> quality gate -> per-doc manifest
              (md5 groupBy)           (score >= min)   (lang, tokens, quality)

Scale shape: one shuffle on md5(text) (uniform 128-bit key — perfectly
balanced) for the keep-list, survivors rejoin on doc_id; quality and
lang-ID are both map-side expression passes over the surviving docs, and
their doc_id join co-partitions. Nothing here is new machinery — the
point of the operator inventory is that curation IS a composition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ecollector_spark.datapipe import dedup, text


def curate(
    docs: DataFrame, min_quality: float = 0.55, text_col: str = "text"
) -> DataFrame:
    """Curated-corpus manifest: (doc_id, pred_lang, n_tokens, quality)
    for every document that (a) is the keeper (min doc_id) of its
    byte-identical group and (b) clears the quality gate."""
    hashed = docs.select("doc_id", F.md5(text_col).alias("_h"), F.col(text_col))
    keepers = hashed.groupBy("_h").agg(F.min("doc_id").alias("doc_id"))
    kept = hashed.join(keepers, ["_h", "doc_id"]).select("doc_id", text_col)

    # Fused quality+lang manifest (optimization round r12, guide §2.4):
    # quality_score and lang_id as separate DataFrames joined on doc_id
    # duplicated the whole dedup subtree (documents scanned 8x in the
    # physical plan — each join side replans the union + keeper join)
    # and tokenized the corpus twice. Both are expression-only over the
    # same token array, so one projection chain computes both; the
    # expressions come from the SAME helpers quality_score/lang_id use
    # (text.quality_feature_cols / lang_score_cols / lang_pred_expr), so
    # the values are bit-identical — oracle-verified at both SFs.
    # Projection layering mirrors the standalone operators (tokens, then
    # features + distinct tokens, then scores, then pred): CollapseProject
    # keeps non-cheap multi-referenced exprs materialized per layer.
    #
    # The token array is produced through a one-element explode
    # (text.tokens_barrier — same Generate-barrier mechanism as the fimp
    # adapter): the final quality filter below would otherwise be pushed
    # through these projections with full alias substitution — the
    # physical plan re-derived the regexp tokenizer SIX times inside the
    # one pushed-down Filter condition, evaluated on every pre-join row,
    # then tokenized again post-join for the manifest. Predicates cannot
    # cross a Generate whose output they reference, so tokenization runs
    # exactly once, post-join, on the kept docs only. Row multiset
    # unchanged. Measured (interleaved medians, sf0.1): 1.82 -> 0.91 s.
    d = text.tokens_barrier(kept, text_col)
    feats = text.quality_feature_cols("_toks", "_text")
    d2 = d.select(
        "doc_id",
        feats["n_tokens"].alias("n_tokens"),
        feats["quality"].alias("quality"),
        F.array_distinct(F.col("_toks")).alias("_dt"),
    )
    d3 = d2.select(
        "doc_id",
        "n_tokens",
        "quality",
        *[
            c.alias(f"_s_{lang}")
            for lang, c in text.lang_score_cols("_dt").items()
        ],
    )
    scores = {lang: f"_s_{lang}" for lang in text._LANGS}
    return (
        d3.where(F.col("quality") >= min_quality)
        .select(
            "doc_id",
            text.lang_pred_expr(scores).alias("pred_lang"),
            "n_tokens",
            "quality",
        )
    )

def curate_text(
    docs: DataFrame,
    span_k: int = 5,
    span_min_dups: int = 2,
    min_words: int = 8,
    text_col: str = "text",
    ppl_reference: DataFrame | None = None,
    max_ppl_micro_bits: int | None = None,
) -> DataFrame:
    """The TEXT-rewriting curation flow (r9 second session; r10 adds
    the optional CCNet stage) — again a pure composition of
    individually-gated operators, in the order the public pipelines
    apply them:

        corpus -> duplicated-SPAN removal   (dedup.dedup_ngram_spans —
                  Lee et al. 2021 boilerplate cut)
               -> Gopher rule filter        (text.gopher_rules — keep
                  only docs passing all rules on the CLEANED text)
               -> perplexity filter         (lm.score_perplexity against
                  a stupid-backoff LM trained on ``ppl_reference``;
                  CCNet, Wenzek et al. 2020 — only when BOTH
                  ``ppl_reference`` and ``max_ppl_micro_bits`` are
                  given, scored on the CLEANED text like CCNet scores
                  its deduplicated paragraphs)
               -> exact dedup               (lowest doc_id per
                  byte-identical cleaned text)

    Returns the surviving (doc_id, text), ordered. Each stage's scale
    shape is its own gate's (shingle marking never pairwise, rules
    expression-only, LM lookups broadcast on (n, gram-hash), one
    md5-keyed groupBy); the composition adds one doc_id join per stage,
    co-partitioned."""
    if (ppl_reference is None) != (max_ppl_micro_bits is None):
        raise ValueError(
            "perplexity stage needs BOTH ppl_reference and "
            "max_ppl_micro_bits (or neither)"
        )
    cleaned = dedup.dedup_ngram_spans(
        docs, text_col=text_col, k=span_k, min_dups=span_min_dups
    )
    passing = (
        text.gopher_rules(cleaned, text_col=text_col, min_words=min_words)
        .where(F.col("pass"))
        .select("doc_id")
    )
    kept = cleaned.join(passing, "doc_id")
    if ppl_reference is not None:
        from ecollector_spark.datapipe import lm

        model = lm.train_ngram_lm(ppl_reference, text_col=text_col)
        total = lm.lm_total_tokens(model)
        fluent = lm.perplexity_filter(
            lm.score_perplexity(kept, model, total, text_col=text_col),
            max_ppl_micro_bits,
        ).select("doc_id")
        kept = kept.join(fluent, "doc_id")
    dd = kept.groupBy(text_col).agg(F.min("doc_id").alias("doc_id"))
    return dd.select("doc_id", text_col).orderBy("doc_id")


def balance_by_cluster(
    assignments: "DataFrame", per_cluster_n: int, key_col: str = "vec_id"
) -> "DataFrame":
    """Cluster-balanced sampling — the domain-balancing step of a
    training-data mix: keep at most ``per_cluster_n`` members of every
    cluster, chosen by smallest deterministic hash (``hash_unit``), so
    the sample is reproducible on any engine/partitioning and no cluster
    dominates the mix. Input: (key, cluster_id) from
    ``similarity.ivf_assignments`` (or any clustering). Output:
    (key, cluster_id), the balanced keep-list.

    The rank window partitions by ``cluster_id`` — per-cluster input is
    bounded by the cluster's size, and the hash order makes the pick a
    uniform per-cluster subsample rather than an id-ordered prefix."""
    from pyspark.sql import Window

    from ecollector_spark.functions.sketches import hash_unit

    w = Window.partitionBy("cluster_id").orderBy(
        hash_unit(key_col).asc(), F.col(key_col).asc()
    )
    return (
        assignments.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= per_cluster_n)
        .select(key_col, "cluster_id")
    )
