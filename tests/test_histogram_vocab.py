"""Equal-width histogram (checks/histogram.py) and vocab coverage
(text/vocab.vocab_coverage): bin assignment edges, auto vs explicit
range, clamping, degenerate ranges, coverage arithmetic, and plan
shapes."""

import pytest
from pyspark.sql import functions as F

from simpl_schema_spark.checks import histogram
from simpl_schema_spark.text import vocab_coverage


def _hist(spark, values, **kw):
    df = spark.createDataFrame([(float(v),) for v in values], "x double")
    return {
        r.bin: (r.bin_lo, r.bin_hi, r.n)
        for r in histogram(df, "x", **kw).collect()
    }


class TestHistogram:
    def test_auto_range_and_top_edge(self, spark):
        got = _hist(spark, [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10], bins=5)
        # range [0,10], width 2; x=10 lands in the LAST bin (right-closed)
        assert got[0] == (0.0, 2.0, 2)   # 0,1
        assert got[4] == (8.0, 10.0, 3)  # 8,9,10
        assert sum(n for _, _, n in got.values()) == 11

    def test_explicit_range_clamps(self, spark):
        got = _hist(spark, [-5, 0.5, 1.5, 99], bins=2, lo=0.0, hi=2.0)
        assert got[0][2] == 2   # -5 clamped in, 0.5
        assert got[1][2] == 2   # 1.5, 99 clamped in

    def test_degenerate_range_single_bin(self, spark):
        got = _hist(spark, [7, 7, 7], bins=4)
        assert list(got) == [0] and got[0][2] == 3

    def test_nulls_excluded(self, spark):
        df = spark.createDataFrame(
            [(1.0,), (None,), (2.0,)], "x double"
        )
        assert (
            histogram(df, "x", bins=2)
            .agg(F.sum("n")).first()[0] == 2
        )

    def test_rejects_bad_params(self, spark):
        df = spark.createDataFrame([(1.0,)], "x double")
        with pytest.raises(ValueError):
            histogram(df, "x", bins=0)
        with pytest.raises(ValueError):
            histogram(df, "x", lo=1.0)
        with pytest.raises(ValueError):
            histogram(df, "x", lo=2.0, hi=1.0)

    def test_explicit_range_single_pass(self, spark):
        # with lo/hi given there is no range aggregate: one scan, one
        # count aggregation
        df = spark.createDataFrame([(1.0,)], "x double")
        plan = (
            histogram(df, "x", bins=4, lo=0.0, hi=4.0)
            ._jdf.queryExecution().optimizedPlan().toString()
        )
        assert "Join" not in plan


class TestVocabCoverage:
    def test_arithmetic(self, spark):
        df = spark.createDataFrame(
            [(1, "a a a b b c"), (2, "a d")], "doc_id bigint, text string"
        )
        r = vocab_coverage(df, vocab_size=2).first()
        # counts: a=4 b=2 c=1 d=1 -> top2 covers 6 of 8
        assert (r.vocab_size, r.n_vocab, r.covered, r.total) == (2, 2, 6, 8)
        assert r.coverage == pytest.approx(0.75)

    def test_small_corpus_n_vocab_short(self, spark):
        df = spark.createDataFrame([(1, "x y")], "doc_id bigint, text string")
        r = vocab_coverage(df, vocab_size=10).first()
        assert r.n_vocab == 2 and r.coverage == 1.0

    def test_empty_corpus(self, spark):
        df = spark.createDataFrame(
            [(1, None)], "doc_id bigint, text string"
        )
        r = vocab_coverage(df, vocab_size=5).first()
        assert (r.covered, r.total, r.coverage) == (0, 0, 0.0)

    def test_rejects_bad_size(self, spark):
        df = spark.createDataFrame([(1, "a")], "doc_id bigint, text string")
        with pytest.raises(ValueError):
            vocab_coverage(df, vocab_size=0)
