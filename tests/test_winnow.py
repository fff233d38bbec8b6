"""Winnowing fingerprints (dedup/winnow.py): guarantee, density, edges,
and the zero-shuffle plan shape."""

import pytest
from pyspark.sql import functions as F

from simpl_schema_spark.dedup import (
    fingerprint_overlap_pairs,
    winnow_fingerprints,
)
from simpl_schema_spark.dedup.winnow import positional_kgram_hashes, winnow

K, W = 5, 4


def _fps(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = winnow_fingerprints(df, k=K, w=W, **kw)
    res = {}
    for r in out.collect():
        res.setdefault(r.id, set()).add(r.fp)
    return res


class TestWinnowSelection:
    def test_guarantee_shared_run(self, spark):
        # two docs sharing a token run of length w + k - 1 = 8 must share
        # at least one fingerprint (the winnowing guarantee)
        shared = "alpha bravo charlie delta echo foxtrot golf hotel"
        rows = [
            (1, "unique one two three " + shared + " tail xyz"),
            (2, shared + " completely different continuation words here"),
        ]
        fps = _fps(spark, rows)
        assert fps[1] & fps[2]

    def test_disjoint_texts_share_nothing(self, spark):
        rows = [
            (1, "aa bb cc dd ee ff gg hh ii jj kk ll"),
            (2, "mm nn oo pp qq rr ss tt uu vv ww xx"),
        ]
        fps = _fps(spark, rows)
        assert not (fps[1] & fps[2])

    def test_density_below_full_shingle_set(self, spark):
        text = " ".join(f"tok{i % 37}x{i % 11}" for i in range(300))
        df = spark.createDataFrame([(1, text)], "doc_id bigint, text string")
        n_grams = df.select(
            F.size(positional_kgram_hashes(F.col("text"), K)).alias("n")
        ).first().n
        n_sel = winnow_fingerprints(df, k=K, w=W).count()
        assert n_grams == 300 - K + 1
        # expected density 2/(w+1) = 0.4; allow slack but require real
        # compression of the index
        assert n_sel < 0.6 * n_grams

    def test_short_doc_single_fingerprint(self, spark):
        # fewer than k tokens -> one gram -> one fingerprint
        fps = _fps(spark, [(1, "only three words")])
        assert len(fps[1]) == 1

    def test_fewer_grams_than_window(self, spark):
        # k=5,w=4 over 6 tokens -> 2 grams < w -> global min only
        fps = _fps(spark, [(1, "a b c d e f")])
        assert len(fps[1]) == 1

    def test_empty_and_null_text(self, spark):
        df = spark.createDataFrame(
            [(1, ""), (2, None), (3, "   ")], "doc_id bigint, text string"
        )
        assert winnow_fingerprints(df, k=K, w=W).count() == 0

    def test_md5_family_portable_values(self, spark):
        # md5_long60('aa bb cc dd ee') is reproducible from first principles
        import hashlib

        expect = int(hashlib.md5(b"aa bb cc dd ee").hexdigest()[:15], 16)
        fps = _fps(spark, [(1, "Aa bB? cc DD ee")], hash_family="md5")
        assert fps[1] == {expect}

    def test_bad_hash_family_raises(self, spark):
        df = spark.createDataFrame([(1, "x")], "doc_id bigint, text string")
        with pytest.raises(ValueError, match="hash_family"):
            winnow_fingerprints(df, hash_family="sha1")

    def test_normalization_invariance(self, spark):
        rows = [
            (1, "The Quick, Brown Fox Jumps Over the Lazy Dog today"),
            (2, "the quick  brown fox jumps over the lazy dog today"),
        ]
        fps = _fps(spark, rows)
        assert fps[1] == fps[2]


class TestOverlapPairs:
    def test_exact_dup_pair_found(self, spark):
        text = " ".join(f"w{i}q{i % 7}" for i in range(60))
        other = " ".join(f"z{i}p{i % 5}" for i in range(60))
        df = spark.createDataFrame(
            [(1, text), (2, text), (3, other)], "doc_id bigint, text string"
        )
        pairs = fingerprint_overlap_pairs(df, k=K, w=W, min_common=2)
        got = [(r.id_a, r.id_b) for r in pairs.collect()]
        assert got == [(1, 2)]

    def test_hot_cap_drops_boilerplate(self, spark):
        # every doc shares the same boilerplate; with max_fp_df below the
        # corpus size the shared fingerprints are dropped and no pair forms
        boiler = " ".join(f"b{i}" for i in range(40))
        df = spark.createDataFrame(
            [(i, boiler) for i in range(8)], "doc_id bigint, text string"
        )
        pairs = fingerprint_overlap_pairs(
            df, k=K, w=W, min_common=1, max_fp_df=4
        )
        assert pairs.count() == 0

    def test_min_common_threshold(self, spark):
        text = " ".join(f"w{i}q{i % 7}" for i in range(60))
        df = spark.createDataFrame(
            [(1, text), (2, text)], "doc_id bigint, text string"
        )
        n_shared = len(_fps(spark, [(1, text)])[1])
        too_high = fingerprint_overlap_pairs(
            df, k=K, w=W, min_common=n_shared + 1
        )
        assert too_high.count() == 0


class TestPlanShape:
    def test_fingerprints_zero_shuffle(self, spark):
        df = spark.createDataFrame(
            [(1, "a b c d e f g h")], "doc_id bigint, text string"
        )
        plan = winnow_fingerprints(df, k=K, w=W)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
