"""Compression-ratio quality signal (text/compression.py): monotonicity
(repetitive << natural), determinism, null/empty handling, level
validation, and the no-shuffle Arrow projection shape."""

import pytest
from pyspark.sql import functions as F

from simpl_schema_spark.text import compression_ratio


class TestCompressionRatio:
    def _ratios(self, spark, rows, **kw):
        df = spark.createDataFrame(rows, "i bigint, t string")
        return {
            r.i: r.cr
            for r in df.select(
                "i", compression_ratio(F.col("t"), **kw).alias("cr")
            ).collect()
        }

    def test_repetitive_compresses_better(self, spark):
        import random

        rng = random.Random(7)
        natural = " ".join(
            "".join(rng.choice("abcdefghijklmnop") for _ in range(rng.randint(3, 9)))
            for _ in range(300)
        )
        spam = "buy cheap pills now " * 75
        got = self._ratios(spark, [(1, natural), (2, spam)])
        assert got[2] < got[1] * 0.5
        assert 0.0 < got[2] < got[1] <= 1.5  # deflate overhead can exceed 1 on tiny/dense input

    def test_null_and_empty(self, spark):
        got = self._ratios(spark, [(1, None), (2, "")])
        assert got[1] is None and got[2] is None

    def test_deterministic(self, spark):
        rows = [(1, "the same text, twice measured")]
        assert self._ratios(spark, rows) == self._ratios(spark, rows)

    def test_level_validated(self, spark):
        with pytest.raises(ValueError):
            compression_ratio(F.lit("x"), level=0)

    def test_arrow_projection_no_shuffle(self, spark):
        df = spark.createDataFrame([("x",)], "t string")
        plan = (
            df.select(compression_ratio(F.col("t")))
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan
        assert "ArrowEvalPython" in plan
