"""Bigram LM perplexity scoring (text/lm.py): counts, smoothing math
against a pure-Python oracle, OOV handling, short-doc exclusion, and
the broadcast-join plan shape."""

import math

import pytest
from pyspark.sql import functions as F

from simpl_schema_spark.text.lm import lm_avg_nll, train_bigram_lm


def _py_model(texts):
    c2, c1 = {}, {}
    for t in texts:
        toks = [w for w in t.lower().split() if w]
        for w in toks:
            c1[w] = c1.get(w, 0) + 1
        for a, b in zip(toks, toks[1:]):
            c2[(a, b)] = c2.get((a, b), 0) + 1
    return c2, c1, len(c1)


def _py_score(text, c2, c1, v, k=0.1):
    toks = [w for w in text.lower().split() if w]
    nlls = [
        -math.log((c2.get((a, b), 0) + k) / (c1.get(a, 0) + k * v))
        for a, b in zip(toks, toks[1:])
    ]
    return (len(nlls), sum(nlls) / len(nlls)) if nlls else None


TRAIN = [
    "the cat sat on the mat",
    "the dog sat on the log",
    "a cat and a dog",
]
SCORE = [
    (1, "the cat sat"),          # all seen bigrams
    (2, "the zebra sat"),        # OOV word mid-bigram
    (3, "zebra quagga"),         # fully OOV
    (4, "single"),               # < 2 tokens -> no row
    (5, ""),                     # empty -> no row
    (6, "THE   CAT\tsat"),       # case/whitespace normalization
]


class TestBigramLM:
    @pytest.fixture(scope="class")
    def scored(self, spark):
        train = spark.createDataFrame([(t,) for t in TRAIN], "text string")
        score = spark.createDataFrame(SCORE, "doc_id bigint, text string")
        lm = train_bigram_lm(train)
        rows = lm_avg_nll(score, lm).collect()
        return {r.doc_id: (r.n_bigrams, r.avg_nll) for r in rows}

    def test_matches_python_oracle(self, scored):
        c2, c1, v = _py_model(TRAIN)
        for did, text in SCORE:
            want = _py_score(text, c2, c1, v)
            if want is None:
                assert did not in scored
            else:
                n, nll = scored[did]
                assert n == want[0]
                assert nll == pytest.approx(want[1], rel=1e-12)

    def test_short_docs_dropped(self, scored):
        assert 4 not in scored and 5 not in scored

    def test_normalization(self, scored):
        # "THE   CAT\tsat" scores identically to "the cat sat"
        assert scored[6][1] == pytest.approx(scored[1][1], rel=1e-12)

    def test_oov_scores_worse(self, scored):
        # in-domain text beats both OOV variants; note add-k gives an
        # unseen bigram after a FREQUENT word lower probability than a
        # fully-OOV bigram (denominator grows with c1), so 2 vs 3 has no
        # fixed order — only seen-vs-unseen does
        assert scored[1][1] < scored[2][1]
        assert scored[1][1] < scored[3][1]

    def test_rejects_bad_k(self, spark):
        train = spark.createDataFrame([("a b",)], "text string")
        lm = train_bigram_lm(train)
        with pytest.raises(ValueError):
            lm_avg_nll(train.select(F.lit(1).alias("doc_id"), "text"), lm, k=0)

    def test_model_joins_are_broadcast(self, spark):
        # small count tables must broadcast under AQE — the corpus side
        # never shuffles on the skewed bigram key
        train = spark.createDataFrame([(t,) for t in TRAIN], "text string")
        score = spark.createDataFrame(SCORE, "doc_id bigint, text string")
        out = lm_avg_nll(score, train_bigram_lm(train))
        out.collect()
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan, plan
