"""Gopher quality rules (text/gopher.py): each gate individually, the
conjunction, empty/edge documents, and the one-projection plan shape."""

import pytest
from pyspark.sql import functions as F

from simpl_schema_spark.text.gopher import gopher_filter, gopher_quality

GOOD = (
    "the quick brown fox jumps over the lazy dog and keeps running with "
    "steady pace because that is what foxes have to do every single day "
    "of their busy lives out there in the wild green forest"
)


def _one(spark, text, **kw):
    df = spark.createDataFrame([(1, text)], "doc_id bigint, text string")
    rows = gopher_quality(df, **kw).collect()
    return rows[0] if rows else None


class TestGopherRules:
    def test_good_doc_passes(self, spark):
        r = _one(spark, GOOD, min_words=10)
        assert r.passes
        assert r.n_stopwords >= 2
        assert r.alpha_frac == 1.0

    def test_word_count_gate(self, spark):
        assert not _one(spark, "too short", min_words=10).passes

    def test_mean_word_length_gate(self, spark):
        long_words = " ".join(["supercalifragilistic"] * 60) + " the of"
        assert not _one(spark, long_words, min_words=10).passes

    def test_symbol_ratio_gate(self, spark):
        r = _one(spark, GOOD + " " + "# # # # # # # # #", min_words=10)
        assert r.symbol_ratio > 0.1 and not r.passes

    def test_bullet_fraction_gate(self, spark):
        bullets = "\n".join(f"- item {i} the of and that" for i in range(20))
        r = _one(spark, bullets, min_words=10)
        assert r.bullet_frac == 1.0 and not r.passes

    def test_ellipsis_fraction_gate(self, spark):
        lines = "\n".join(
            f"the thing number {i} keeps going..." for i in range(10)
        )
        r = _one(spark, lines, min_words=10)
        assert r.ellipsis_frac == 1.0 and not r.passes

    def test_alpha_fraction_gate(self, spark):
        nums = GOOD + " " + " ".join(str(i) for i in range(60))
        r = _one(spark, nums, min_words=10)
        assert r.alpha_frac < 0.8 and not r.passes

    def test_stopword_gate(self, spark):
        salad = " ".join(f"word{i}x" for i in range(40))
        r = _one(spark, salad, min_words=10)
        assert r.n_stopwords == 0 and not r.passes

    def test_null_text_dropped_empty_zero(self, spark):
        df = spark.createDataFrame(
            [(1, None), (2, "")], "doc_id bigint, text string"
        )
        rows = {r.doc_id: r for r in gopher_quality(df).collect()}
        assert 1 not in rows
        r = rows[2]
        assert r.n_words == 0 and not r.passes
        assert r.mean_word_len == 0.0 and r.bullet_frac == 0.0

    def test_filter_form(self, spark):
        df = spark.createDataFrame(
            [(1, GOOD), (2, "x y")], "doc_id bigint, text string"
        )
        ids = [r.doc_id for r in gopher_filter(df, min_words=10).collect()]
        assert ids == [1]

    def test_single_scan_no_shuffle(self, spark):
        df = spark.createDataFrame([(1, GOOD)], "doc_id bigint, text string")
        plan = (
            gopher_quality(df)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan
