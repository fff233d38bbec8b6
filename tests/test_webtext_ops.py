"""URL normalization, deterministic sampling, corpus vocabulary."""

import pytest

from pyspark.sql import functions as F

from simpl_schema_spark.sampling import hash_key, hash_sample, stratified_sample
from simpl_schema_spark.text import (
    document_frequencies,
    top_tokens,
    url_host,
    url_normalize,
    url_registered_domain,
)


def norm_one(spark, url):
    df = spark.createDataFrame([(url,)], "u string")
    return df.select(url_normalize(F.col("u")).alias("n")).collect()[0].n


class TestUrlNormalize:
    def test_lowercases_scheme_and_host_only(self, spark):
        assert (
            norm_one(spark, "HTTPS://WWW.Example.COM/Page/One?Q=Value")
            == "https://www.example.com/Page/One?Q=Value"
        )

    def test_strips_default_ports_scheme_aware(self, spark):
        assert norm_one(spark, "http://a.com:80/x") == "http://a.com/x"
        assert norm_one(spark, "https://a.com:443/x") == "https://a.com/x"
        # NOT default for the scheme: kept
        assert norm_one(spark, "http://a.com:443/x") == "http://a.com:443/x"
        assert norm_one(spark, "https://a.com:8443/x") == "https://a.com:8443/x"

    def test_drops_fragment(self, spark):
        assert norm_one(spark, "https://a.com/x#frag") == "https://a.com/x"

    def test_tracking_params(self, spark):
        # leading tracking param promotes the next one
        assert (
            norm_one(spark, "https://a.com/x?utm_source=f&id=1")
            == "https://a.com/x?id=1"
        )
        # mid-list and trailing
        assert (
            norm_one(spark, "https://a.com/x?id=1&gclid=z&b=2")
            == "https://a.com/x?id=1&b=2"
        )
        assert (
            norm_one(spark, "https://a.com/x?id=1&fbclid=z")
            == "https://a.com/x?id=1"
        )
        # only tracking params -> no query at all
        assert (
            norm_one(spark, "https://a.com/x?utm_a=1&utm_b=2")
            == "https://a.com/x"
        )

    def test_host_and_domain(self, spark):
        df = spark.createDataFrame(
            [("https://user@Sub.Www.Example.com:8080/p?q=1",)], "u string"
        )
        r = df.select(
            url_host(F.col("u")).alias("h"),
            url_registered_domain(F.col("u")).alias("d"),
        ).collect()[0]
        assert r.h == "sub.www.example.com"
        assert r.d == "example.com"


class TestSampling:
    def test_hash_sample_deterministic_and_stable(self, spark):
        df = spark.createDataFrame([(i,) for i in range(1000)], "k bigint")
        a = sorted(r.k for r in hash_sample(df, "k", 0.3).collect())
        b = sorted(
            r.k for r in hash_sample(df.repartition(7), "k", 0.3).collect()
        )
        assert a == b and 0 < len(a) < 1000
        # nested: a lower-rate sample is a subset of a higher-rate one
        c = sorted(r.k for r in hash_sample(df, "k", 0.1).collect())
        assert set(c) <= set(a)

    def test_hash_sample_matches_python_md5(self, spark):
        import hashlib

        df = spark.createDataFrame([(i,) for i in range(200)], "k bigint")
        got = sorted(r.k for r in hash_sample(df, "k", 0.5).collect())
        expected = sorted(
            i for i in range(200)
            if int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) < 2**31
        )
        assert got == expected

    def test_hash_sample_rate_bounds(self, spark):
        df = spark.createDataFrame([(1,)], "k bigint")
        with pytest.raises(ValueError):
            hash_sample(df, "k", 1.5)

    def test_stratified_exact_n_per_group(self, spark):
        rows = [(g, ord(g) * 100 + i) for g in ("a", "b") for i in range(50)]
        rows += [("tiny", 1)]
        df = spark.createDataFrame(rows, "g string, k bigint")
        out = stratified_sample(df, "g", "k", 5).collect()
        by_g = {}
        for r in out:
            by_g.setdefault(r.g, []).append(r.k)
        assert len(by_g["a"]) == 5 and len(by_g["b"]) == 5
        assert by_g["tiny"] == [1]  # smaller stratum: all rows
        # deterministic across invocations
        out2 = stratified_sample(df.repartition(5), "g", "k", 5).collect()
        assert sorted((r.g, r.k) for r in out) == sorted(
            (r.g, r.k) for r in out2
        )


class TestVocab:
    def test_top_tokens_and_ties(self, spark):
        df = spark.createDataFrame(
            [("b a a",), ("c b  ",), (None,)], "text string"
        )
        out = [(r.token, r.n) for r in top_tokens(df, "text", k=2).collect()]
        # a:2 b:2 c:1 -> tie at 2 broken by token asc
        assert out == [("a", 2), ("b", 2)]

    def test_document_frequencies(self, spark):
        df = spark.createDataFrame([("a a b",), ("a c",)], "text string")
        got = {r.token: r.df for r in document_frequencies(df, "text").collect()}
        assert got == {"a": 2, "b": 1, "c": 1}

    def test_topk_plan_is_bounded(self, spark):
        # orderBy+limit must plan TakeOrderedAndProject, not a global Sort
        df = spark.createDataFrame([("x y",)], "text string")
        plan = top_tokens(df, "text", k=3)._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan


class TestTrainingPipeline:
    def test_composed_pipeline_single_shuffle(self, spark):
        # dedup (one shuffle) -> filters -> hash sample (projection):
        # the composed plan must contain exactly ONE shuffle exchange
        import __spark_entry__ as em

        df = em.queries()["training_pipeline"](spark, "/root/testdata/sf0.001")
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange hashpartitioning") == 1, plan
        assert df.count() > 0


class TestTfIdf:
    def test_top_terms_ranking(self, spark):
        from simpl_schema_spark.text import tf_idf_top_terms

        df = spark.createDataFrame(
            [
                (1, "apple apple banana common"),
                (2, "banana cherry common"),
                (3, "common common date"),
            ],
            "doc_id bigint, text string",
        )
        out = tf_idf_top_terms(df, k=2).collect()
        by_doc = {}
        for r in out:
            by_doc.setdefault(r.doc_id, []).append((r.rank, r.token))
        # doc 1: apple tf=2 df=1 dominates; banana (df=2) beats common (df=3)
        assert sorted(by_doc[1]) == [(1, "apple"), (2, "banana")]
        # common appears in every doc -> idf ln(1)=0 -> it can never take
        # rank 1 while the doc has any distinctive term
        assert all(
            token != "common"
            for ranks in by_doc.values()
            for rank, token in ranks
            if rank == 1
        )
        assert by_doc[3][0][1] == "date"

    def test_null_text_excluded(self, spark):
        from simpl_schema_spark.text import tf_idf_top_terms

        df = spark.createDataFrame(
            [(1, "a b"), (2, None)], "doc_id bigint, text string"
        )
        out = tf_idf_top_terms(df, k=5).collect()
        assert {r.doc_id for r in out} == {1}
