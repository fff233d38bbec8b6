"""Hashing-trick linear classifier scoring (text/classifier.py)."""

import pytest
from pyspark.sql import functions as F

from simpl_schema_spark.text import classifier_score, token_buckets


@pytest.fixture(scope="module")
def weights(spark):
    # bucket b -> weight (b % 13) - 6, in integer milli-units
    return spark.range(256).select(
        F.col("id").alias("bucket"),
        ((F.col("id") % 13) - 6).alias("weight"),
    )


class TestTokenBuckets:
    def test_range_and_determinism(self, spark):
        df = spark.createDataFrame(
            [(1, "Hello world hello WORLD")], "doc_id long, text string"
        )
        for fam in ("xxhash64", "md5"):
            arr = df.select(
                token_buckets(F.col("text"), 256, hash_family=fam).alias("b")
            ).collect()[0].b
            assert len(arr) == 4
            assert all(0 <= b < 256 for b in arr)
            # normalization lowercases: 'hello' and 'Hello' share a bucket
            assert arr[0] == arr[2] and arr[1] == arr[3]

    def test_param_validation(self, spark):
        df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        with pytest.raises(ValueError):
            token_buckets(F.col("text"), 1)
        with pytest.raises(ValueError):
            token_buckets(F.col("text"), 256, hash_family="sha9")


class TestClassifierScore:
    def test_score_is_mean_bucket_weight(self, spark, weights):
        df = spark.createDataFrame(
            [(1, "alpha beta gamma delta")], "doc_id long, text string"
        )
        buckets = df.select(
            F.explode(token_buckets(F.col("text"), 256, hash_family="md5")).alias("b")
        ).collect()
        expected = sum((r.b % 13) - 6 for r in buckets) / len(buckets)
        got = classifier_score(
            df, weights, n_buckets=256, hash_family="md5"
        ).collect()[0]
        assert got.n_tokens == 4
        assert got.score == pytest.approx(expected)

    def test_bias_and_empty_docs(self, spark, weights):
        df = spark.createDataFrame(
            [(1, ""), (2, None), (3, "   ")], "doc_id long, text string"
        )
        rows = {
            r.doc_id: r
            for r in classifier_score(
                df, weights, n_buckets=256, bias=2.5, hash_family="md5"
            ).collect()
        }
        assert set(rows) == {1, 2, 3}
        for r in rows.values():
            assert r.n_tokens == 0 and r.score == 2.5

    def test_missing_buckets_weigh_zero(self, spark):
        # weight table covering NO bucket -> every doc scores exactly bias
        df = spark.createDataFrame(
            [(1, "some words here")], "doc_id long, text string"
        )
        empty_w = spark.createDataFrame([], "bucket long, weight long")
        got = classifier_score(
            df, empty_w, n_buckets=64, bias=-1.0
        ).collect()[0]
        assert got.score == -1.0 and got.n_tokens == 3

    def test_no_forced_broadcast_no_window(self, spark, weights):
        df = spark.createDataFrame(
            [(1, "a few words")], "doc_id long, text string"
        )
        plan = (
            classifier_score(df, weights, n_buckets=256)
            ._jdf.queryExecution()
            .optimizedPlan()
            .toString()
        )
        assert "ResolvedHint" not in plan
        assert "windowspecdefinition" not in plan.lower()
