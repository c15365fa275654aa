"""Real byte-pair-encoding tokenizer — train + encode, from scratch
after the public algorithm (Sennrich, Haddow & Birch 2016,
arXiv:1508.07909 "Neural Machine Translation of Rare Words with
Subword Units").

Architecture is the scale-correct split every real pipeline uses:

- **word counting is distributed** (:func:`word_frequencies` — one
  tokenize-explode + one partial-aggregated groupBy over the corpus;
  at 100 TB this is the only stage that touches every byte),
- **the merge loop is local over the bounded word-frequency dict**
  (:func:`bpe_train` — classic BPE trains on DISTINCT words x counts,
  a vocabulary-bounded table orders of magnitude smaller than the
  corpus; iterating Spark jobs per merge would pay thousands of
  scheduler round-trips to aggregate the same tiny dict), and
- **encoding is distributed again** (:func:`bpe_encode` — merges
  broadcast into an Arrow-batched mapInPandas stage with a per-batch
  word cache, so each distinct word is merged once per batch, not once
  per occurrence).

The end-of-word marker is ``</w>`` appended to the final symbol
(Sennrich's formulation), so ``lower`` tokenizes independently of
``lowercase``. Tokens joined back (markers stripped) always reproduce
the word — pinned as a property test; training on the paper's own
example corpus reproduces the hand-derivable merge sequence.

No SQL oracle can express the merge recursion, so the driver gate for
this family is rows-only (the documented weaker check) — the value
pins live in pytest: a pure-Python reference encoder (same module,
same code path) plus hand-worked examples.
"""

from __future__ import annotations

from collections import Counter
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EOW = "</w>"


def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, count) over whitespace tokens — the distributed stage of
    BPE training. One explode + one partial-aggregated groupBy; the
    result is bounded by the vocabulary, not the corpus."""
    return (
        docs.select(
            F.explode(
                F.array_remove(F.split(F.col(text_col), r"\s+"), "")
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count("*").alias("count"))
    )


def _word_symbols(word: str) -> tuple[str, ...]:
    if not word:
        return ()
    chars = list(word)
    chars[-1] = chars[-1] + EOW
    return tuple(chars)


def bpe_train(
    freqs: "list[tuple[str, int]] | dict[str, int]",
    num_merges: int,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` merges from a word-frequency dict (the
    classic algorithm: repeatedly merge the most frequent adjacent
    symbol pair across all words, weighted by word count). Ties break
    lexicographically for cross-run determinism (the paper leaves tie
    order unspecified; a fixed rule makes the merge table reproducible
    from the same corpus on any engine). Stops early when no pair
    occurs twice."""
    if isinstance(freqs, dict):
        freqs = list(freqs.items())
    vocab: dict[tuple[str, ...], int] = {}
    for word, count in freqs:
        sym = _word_symbols(word)
        if sym:
            vocab[sym] = vocab.get(sym, 0) + int(count)
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: Counter = Counter()
        for sym, count in vocab.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] += count
        if not pairs:
            break
        best = max(pairs.items(), key=lambda kv: (kv[1], kv[0][0], kv[0][1]))
        if best[1] < 2:
            break
        pair = best[0]
        merges.append(pair)
        merged = pair[0] + pair[1]
        new_vocab: dict[tuple[str, ...], int] = {}
        for sym, count in vocab.items():
            out = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == pair[0] and sym[i + 1] == pair[1]:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            t = tuple(out)
            new_vocab[t] = new_vocab.get(t, 0) + count
        vocab = new_vocab
    return merges


def apply_merges(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Encode ONE word with a trained merge table: repeatedly apply the
    lowest-rank applicable merge (training order), the standard BPE
    inference rule."""
    sym = list(_word_symbols(word))
    while len(sym) > 1:
        best_rank, best_i = None, -1
        for i, pair in enumerate(zip(sym, sym[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
) -> DataFrame:
    """Tokenize each document with a trained merge table:
    (doc_id, n_words, n_tokens, tokens). The merge table rides the
    closure of the Arrow-batched mapInPandas function (broadcast with
    the task, KBs even for large vocabularies); a per-batch word cache
    merges each DISTINCT word once. Embarrassingly parallel, no
    shuffle."""
    ranks = {tuple(p): i for i, p in enumerate(merges)}

    def op(batches: Iterator) -> Iterator:
        import pandas as pd

        cache: dict[str, list[str]] = {}
        for pdf in batches:
            n_words, n_tokens, toks = [], [], []
            for text in pdf[text_col]:
                words = [w for w in (text or "").split() if w]
                out: list[str] = []
                for w in words:
                    got = cache.get(w)
                    if got is None:
                        got = cache[w] = apply_merges(w, ranks)
                    out.extend(got)
                n_words.append(len(words))
                n_tokens.append(len(out))
                toks.append(out)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_words": n_words,
                    "n_tokens": n_tokens,
                    "tokens": toks,
                }
            )

    return docs.select("doc_id", text_col).mapInPandas(
        op, schema="doc_id long, n_words int, n_tokens int, tokens array<string>"
    )


def train_on_corpus(
    docs: DataFrame,
    num_merges: int,
    text_col: str = "text",
    max_vocab_words: int = 1_000_000,
) -> list[tuple[str, str]]:
    """The composed flow: distributed word counting, then the local
    merge loop over the (bounded) frequency dict. ``max_vocab_words``
    caps the driver-side table by keeping the most frequent words — at
    100 TB the tail of hapax words adds nothing to pair statistics a
    trainer at this vocabulary size would use (stated bound, not a
    silent truncation: the cap is an explicit argument)."""
    rows = (
        word_frequencies(docs, text_col)
        .orderBy(F.col("count").desc(), "word")
        .limit(max_vocab_words)
        .collect()
    )
    return bpe_train([(r["word"], r["count"]) for r in rows], num_merges)
