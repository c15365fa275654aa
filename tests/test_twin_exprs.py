"""Pin every SQL-fragment/Column-builder twin pair to the SAME analyzed
expression tree (VERDICT r12 #9): the SQL twins exist only as a py4j
round-trip optimization, so any drift between a fragment and its Column
form would silently corrupt whichever path a gate does not exercise.
Canonicalized analyzed-plan equality catches drift at the expression
level (no data needed); a value check on an adversarial micro-corpus
(nulls, empties, punct-only, unicode case edges) backs it up for the
pairs whose trees legitimately differ (e.g. parser vs builder literal
types) but must stay value-identical.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ecollector_spark.datapipe import text


def _canon(df):
    return df._jdf.queryExecution().analyzed().canonicalized().toString()


#: adversarial texts: None, empty, spaces, punct-only, mixed, unicode
#: case edges (Turkish dotted capital I, Kelvin sign), digits, newlines
EDGE_TEXTS = [
    (0, None),
    (1, ""),
    (2, "   "),
    (3, "!!! ... ###"),
    (4, "The quick-brown_fox 42 jumps!"),
    (5, "İstanbul Kelvin MIXED case"),
    (6, "a\nb\nc\n\n  d"),
    (7, "123 456 the the of of"),
    (8, "tab\tsep and émigré café"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(EDGE_TEXTS, "doc_id long, text string")


class TestTokensTwins:
    def test_plan_identical(self, docs):
        a = docs.select(text.tokens_expr("text").alias("t"))
        b = docs.select(text.tokens_expr(F.col("text")).alias("t"))
        assert _canon(a) == _canon(b)

    def test_values_identical(self, docs):
        a = docs.select("doc_id", text.tokens_expr("text").alias("t"))
        b = docs.select("doc_id", text.tokens_expr(F.col("text")).alias("t"))
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0

    def test_matches_historical_tokenizer(self, docs):
        """The r13 single-pass tokenizer must equal the historical
        replace->lower->split->filter chain (the DuckDB oracle's form)
        on every edge row, including the unicode case edges."""
        old = F.filter(
            F.split(F.lower(F.regexp_replace("text", "[^A-Za-z0-9 ]", " ")), " +"),
            lambda x: x != "",
        )
        a = docs.select("doc_id", text.tokens_expr("text").alias("t"))
        b = docs.select("doc_id", old.alias("t"))
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


class TestShinglesTwins:
    @pytest.mark.parametrize("k", [2, 3, 5])
    def test_plan_identical(self, docs, k):
        base = docs.select("doc_id", text.tokens_expr("text").alias("_toks"))
        a = base.select(text.shingles_expr("_toks", k).alias("s"))
        b = base.select(text.shingles_expr(F.col("_toks"), k).alias("s"))
        assert _canon(a) == _canon(b)

    def test_values_identical(self, docs):
        base = docs.select("doc_id", text.tokens_expr("text").alias("_toks"))
        a = base.select("doc_id", text.shingles_expr("_toks", 3).alias("s"))
        b = base.select("doc_id", text.shingles_expr(F.col("_toks"), 3).alias("s"))
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


class TestLangTwins:
    def test_score_plans_identical(self, docs):
        base = docs.select(
            "doc_id", F.array_distinct(text.tokens_expr("text")).alias("_dt")
        )
        sql_scores = text.lang_score_cols("_dt")
        col_scores = text.lang_score_cols(F.col("_dt"))
        for lang in sql_scores:
            a = base.select(sql_scores[lang].alias("s"))
            b = base.select(col_scores[lang].alias("s"))
            assert _canon(a) == _canon(b), lang

    def test_pred_values_identical(self, docs):
        base = docs.select(
            "doc_id", F.array_distinct(text.tokens_expr("text")).alias("_dt")
        )
        s = base.select(
            "doc_id",
            *[c.alias(f"_s_{l}") for l, c in text.lang_score_cols("_dt").items()],
        )
        names = {l: f"_s_{l}" for l in text.LANG_MARKERS}
        cols = {l: F.col(f"_s_{l}") for l in text.LANG_MARKERS}
        a = s.select("doc_id", text.lang_pred_expr(names).alias("p"))
        b = s.select("doc_id", text.lang_pred_expr(cols).alias("p"))
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


class TestQualityTwins:
    def test_feature_plans_identical(self, docs):
        base = docs.select(
            "doc_id",
            F.col("text").alias("_text"),
            text.tokens_expr("text").alias("_toks"),
        )
        sql_f = text.quality_feature_cols("_toks", "_text")
        col_f = text.quality_feature_cols(F.col("_toks"), F.col("_text"))
        for name in sql_f:
            a = base.select(sql_f[name].alias("v"))
            b = base.select(col_f[name].alias("v"))
            assert _canon(a) == _canon(b), name

    def test_feature_values_identical(self, docs):
        base = docs.select(
            "doc_id",
            F.col("text").alias("_text"),
            text.tokens_expr("text").alias("_toks"),
        )
        sql_f = text.quality_feature_cols("_toks", "_text")
        col_f = text.quality_feature_cols(F.col("_toks"), F.col("_text"))
        a = base.select("doc_id", *[c.alias(n) for n, c in sql_f.items()])
        b = base.select("doc_id", *[c.alias(n) for n, c in col_f.items()])
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0

    def test_punct_count_matches_replace_form(self, docs):
        """regexp_count of the single-char class == length diff of the
        historical regexp_replace form on every edge row."""
        new = F.regexp_count("text", F.lit(r"[^\w\s]"))
        old = F.length("text") - F.length(F.regexp_replace("text", r"[^\w\s]", ""))
        d = docs.where(F.col("text").isNotNull()).select(
            "doc_id", new.alias("a"), old.alias("b")
        )
        assert d.where(F.col("a") != F.col("b")).count() == 0


class TestDotCosineTwins:
    def test_dot_sql_matches_column(self, spark):
        from ecollector_spark.datapipe import similarity as sim

        df = spark.createDataFrame(
            [(1, [1.0, 2.0, 3.0], [0.5, -1.0, 2.0]), (2, [0.0, 0.0, 0.0], [1.0, 1.0, 1.0])],
            "id long, a array<double>, b array<double>",
        )
        a = df.select(F.expr(sim._dot_sql("a", "b")).alias("d"))
        b = df.select(sim._dot(F.col("a"), F.col("b")).alias("d"))
        assert _canon(a) == _canon(b)
