"""Domain-mixture resampling (sampling.mixture_rates/mixture_sample)."""

import pytest
from pyspark.sql import functions as F

from simpl_schema_spark.sampling import hash_key, mixture_rates, mixture_sample

WEIGHTS = {"en": 0.5, "de": 0.3, "fr": 0.2}


@pytest.fixture(scope="module")
def corpus(spark):
    # en:600 de:250 fr:100 xx:50 -> binding group is fr (100/0.2 = 500)
    rows = []
    nid = 0
    for lang, n in (("en", 600), ("de", 250), ("fr", 100), ("xx", 50)):
        for _ in range(n):
            rows.append((nid, lang))
            nid += 1
    return spark.createDataFrame(rows, "doc_id long, lang string")


class TestMixtureRates:
    def test_binding_group_kept_whole(self, spark, corpus):
        rates = {
            r.group: r for r in mixture_rates(corpus, "lang", WEIGHTS).collect()
        }
        # T = min(600/.5, 250/.3, 100/.2) = 500
        assert rates["fr"].rate == 1.0
        assert rates["en"].rate == pytest.approx(0.5 * 500 / 600)
        assert rates["de"].rate == pytest.approx(0.3 * 500 / 250)
        assert "xx" not in rates  # no target weight -> no rate row

    def test_weights_normalized(self, spark, corpus):
        doubled = {g: 2 * w for g, w in WEIGHTS.items()}
        a = sorted(map(tuple, mixture_rates(corpus, "lang", WEIGHTS).collect()))
        b = sorted(map(tuple, mixture_rates(corpus, "lang", doubled).collect()))
        assert a == b

    def test_scale_shrinks(self, spark, corpus):
        rates = {
            r.group: r.rate
            for r in mixture_rates(corpus, "lang", WEIGHTS, scale=0.5).collect()
        }
        assert rates["fr"] == pytest.approx(0.5)
        assert rates["en"] == pytest.approx(0.5 * 0.5 * 500 / 600)

    def test_param_validation(self, corpus):
        with pytest.raises(ValueError):
            mixture_rates(corpus, "lang", {})
        with pytest.raises(ValueError):
            mixture_rates(corpus, "lang", {"en": -1.0})
        with pytest.raises(ValueError):
            mixture_rates(corpus, "lang", {"en": 0.0})
        with pytest.raises(ValueError):
            mixture_sample(corpus, "lang", "doc_id", WEIGHTS, scale=0.0)


class TestMixtureSample:
    def test_selection_matches_rate_thresholds(self, spark, corpus):
        """The kept set is EXACTLY the hash-under-threshold set."""
        out = mixture_sample(corpus, "lang", "doc_id", WEIGHTS)
        got = {r.doc_id for r in out.collect()}
        rates = {
            r.group: r.rate for r in mixture_rates(corpus, "lang", WEIGHTS).collect()
        }
        hashes = {
            r.doc_id: (r.h, r.lang)
            for r in corpus.select(
                "doc_id", "lang", hash_key(F.col("doc_id")).alias("h")
            ).collect()
        }
        import math

        want = {
            did
            for did, (h, lang) in hashes.items()
            if lang in rates and h < math.floor(rates[lang] * (1 << 32))
        }
        assert got == want
        # binding group survives whole; unweighted group vanishes
        langs = {r.doc_id: r.lang for r in out.collect()}
        assert sum(1 for v in langs.values() if v == "fr") == 100
        assert all(v != "xx" for v in langs.values())

    def test_realized_mixture_near_target(self, spark, corpus):
        out = mixture_sample(corpus, "lang", "doc_id", WEIGHTS)
        counts = {r.lang: r.n for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
        total = sum(counts.values())
        for g, w in WEIGHTS.items():
            assert counts[g] / total == pytest.approx(w, abs=0.06)

    def test_deterministic_under_repartition(self, spark, corpus):
        a = {r.doc_id for r in mixture_sample(corpus, "lang", "doc_id", WEIGHTS).collect()}
        b = {
            r.doc_id
            for r in mixture_sample(
                corpus.repartition(7), "lang", "doc_id", WEIGHTS
            ).collect()
        }
        assert a == b

    def test_plan_has_no_window_or_collect(self, spark, corpus):
        plan = (
            mixture_sample(corpus, "lang", "doc_id", WEIGHTS)
            ._jdf.queryExecution()
            .optimizedPlan()
            .toString()
        )
        assert "windowspecdefinition" not in plan.lower()
        assert "ResolvedHint" not in plan  # AQE decides the rate join
