"""Pins for the real BPE tokenizer (r9 second session): the trainer
against the hand-derivable merge sequence of Sennrich et al. 2016's own
example corpus, the encoder against the standard lowest-rank inference
rule, round-trip and determinism properties, and Spark/pure-Python
parity (the merge recursion has no SQL oracle, so these ARE the value
gates for this family)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ecollector_spark.datapipe.tokenizer import (
    EOW,
    apply_merges,
    bpe_train,
    train_on_corpus,
    bpe_encode,
    word_frequencies,
)

#: the paper's example corpus (arXiv:1508.07909 §3.2)
SENNRICH = {"low": 5, "lower": 2, "newest": 6, "widest": 3}


class TestTrainer:
    def test_sennrich_example_merges(self):
        """Hand-derived with this module's conventions (EOW glued to the
        last character, ties broken lexicographically-greatest):
        (s,t</w>)=9 ties (e,s)=9 -> s>e picks st</w>; then est</w>;
        then (l,o)=7; then (w,est</w>) wins the 6-way tie."""
        merges = bpe_train(SENNRICH, 4)
        assert merges == [
            ("s", "t" + EOW),
            ("e", "st" + EOW),
            ("l", "o"),
            ("w", "est" + EOW),
        ]

    def test_early_stop_when_no_pair_repeats(self):
        # every pair unique: nothing merges twice -> trainer stops
        assert bpe_train({"ab": 1, "cd": 1}, 10) == []

    def test_determinism(self):
        a = bpe_train(SENNRICH, 10)
        b = bpe_train(dict(reversed(list(SENNRICH.items()))), 10)
        assert a == b  # input order never matters

    def test_weighting_matters(self):
        # the frequent word's pair must win over the diverse rare ones
        merges = bpe_train({"aa": 100, "bc": 1, "bd": 1, "be": 1}, 1)
        assert merges == [("a", "a" + EOW)]


class TestEncoder:
    def test_lowest_rank_inference(self):
        merges = bpe_train(SENNRICH, 4)
        ranks = {p: i for i, p in enumerate(merges)}
        assert apply_merges("lowest", ranks) == ["lo", "west" + EOW]
        assert apply_merges("newest", ranks) == ["n", "e", "west" + EOW]
        assert apply_merges("low", ranks) == ["lo", "w" + EOW]
        # unseen characters stay unmerged
        assert apply_merges("xyz", ranks) == ["x", "y", "z" + EOW]

    @given(
        st.lists(
            st.text(alphabet="abcdef", min_size=1, max_size=8),
            min_size=1,
            max_size=30,
        )
    )
    @settings(max_examples=50, deadline=None)
    def test_round_trip_property(self, words):
        """Tokens of a word always concatenate back to word + EOW,
        whatever merges were learned."""
        freqs: dict = {}
        for w in words:
            freqs[w] = freqs.get(w, 0) + 1
        ranks = {p: i for i, p in enumerate(bpe_train(freqs, 20))}
        for w in set(words):
            toks = apply_merges(w, ranks)
            assert "".join(toks) == w + EOW
            assert 1 <= len(toks) <= len(w)


class TestSparkStages:
    def _docs(self, spark):
        rows = [
            (1, "low low low low low lower lower"),
            (2, "newest newest newest newest newest newest"),
            (3, "widest widest widest lowest"),
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_word_frequencies_match_python(self, spark):
        wf = {
            r["word"]: r["count"]
            for r in word_frequencies(self._docs(spark)).collect()
        }
        assert wf == {"low": 5, "lower": 2, "newest": 6, "widest": 3, "lowest": 1}

    def test_train_on_corpus_reproduces_the_example(self, spark):
        # the corpus above is the Sennrich dict plus one 'lowest'
        # occurrence, which joins existing pairs only at +1 weight —
        # the first four merges are unchanged
        merges = train_on_corpus(self._docs(spark), num_merges=4)
        assert merges == bpe_train(
            {"low": 5, "lower": 2, "newest": 6, "widest": 3, "lowest": 1}, 4
        )

    def test_encode_parity_with_reference(self, spark):
        docs = self._docs(spark)
        merges = train_on_corpus(docs, num_merges=6)
        ranks = {p: i for i, p in enumerate(merges)}
        out = {r["doc_id"]: r for r in bpe_encode(docs, merges).collect()}
        for doc_id, text in [(r["doc_id"], r["text"]) for r in docs.collect()]:
            words = text.split()
            expect = [t for w in words for t in apply_merges(w, ranks)]
            assert out[doc_id]["tokens"] == expect
            assert out[doc_id]["n_words"] == len(words)
            assert out[doc_id]["n_tokens"] == len(expect)

    def test_empty_and_whitespace_docs(self, spark):
        docs = spark.createDataFrame(
            [(1, ""), (2, "   "), (3, "word")], "doc_id long, text string"
        )
        out = {r["doc_id"]: r for r in bpe_encode(docs, []).collect()}
        assert out[1]["n_tokens"] == 0 and out[2]["n_tokens"] == 0
        assert out[3]["tokens"] == ["w", "o", "r", "d" + EOW]
