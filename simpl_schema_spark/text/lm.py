"""Distributed n-gram language-model perplexity scoring.

CCNet-style pipelines rank web documents by perplexity under a language
model trained on a trusted slice (Wikipedia in CCNet; any reference
corpus here) — low-perplexity documents read like the reference, high-
perplexity ones are boilerplate/spam/gibberish.  No reference analog
(the reference is a schema validator); this is the quality-prior
operator of the training-data workload, built as pure DataFrame ops so
training and scoring both stay JVM-side.

Model: add-k smoothed bigram LM over lowercase whitespace tokens::

    p(w2 | w1) = (c(w1,w2) + k) / (c(w1) + k*V)

with ``V`` = training vocabulary size; unseen words/bigrams fall out of
the same formula via zero counts (left joins), so there is no special
OOV token and the score is defined for every document.

Scale shape — training: one explode over the reference slice and two
map-side-combinable groupBys (bigram + unigram counts) plus a 1-row
vocab-size aggregate kept lazy and broadcast-cross-joined (no driver
action).  Scoring: the corpus explodes to (doc, w1, w2) rows and joins
the count tables — the model is usually orders of magnitude smaller
than the corpus, so AQE broadcasts it; when a giant model forces a
shuffle join, the natural-language key skew ("of the" is everywhere)
is exactly the case AQE skew-join splitting handles.  One final
per-document aggregation.  Nothing collects.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

from pyspark.sql import DataFrame, functions as F

__all__ = ["BigramLM", "train_bigram_lm", "lm_avg_nll"]


class BigramLM(NamedTuple):
    """Count tables of a trained bigram model (all lazy plans)."""

    bigrams: DataFrame  #: (w1, w2, c2)
    unigrams: DataFrame  #: (w1, c1)
    vocab_size: DataFrame  #: 1 row (v: double)


def _doc_bigrams(df: DataFrame, text_col: str, keep: Sequence[str]) -> DataFrame:
    """Explode each document into (``*keep``, w1, w2) bigram rows.

    Tokens: lowercase whitespace split, empties dropped (the repo's
    word_tokens convention — mirrored verbatim by the DuckDB oracle).
    Documents with fewer than two tokens produce no rows.
    """
    toks = F.filter(
        F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), "\\s+"),
        lambda t: t != "",
    )
    # greatest(..., 0): slice() rejects negative lengths for empty docs
    m = F.greatest(F.size(toks) - 1, F.lit(0))
    pairs = F.arrays_zip(
        F.slice(toks, F.lit(1), m).alias("w1"),
        F.slice(toks, F.lit(2), m).alias("w2"),
    )
    return df.select(*keep, F.explode(pairs).alias("p")).select(
        *keep, F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")
    )


def train_bigram_lm(df: DataFrame, text_col: str = "text") -> BigramLM:
    """Count tables for an add-k bigram LM over the reference corpus."""
    bi = _doc_bigrams(df, text_col, [])
    bigrams = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    # unigram counts must cover the final token of each document too —
    # derive them from the token stream, not from the bigram table
    toks = F.filter(
        F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), "\\s+"),
        lambda t: t != "",
    )
    uni = df.select(F.explode(toks).alias("w1"))
    unigrams = uni.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    # persist the (model-sized) count tables: scoring's two broadcast
    # builds and the vocab-size aggregate would otherwise each re-scan
    # the training corpus.  Registered for deferred release per the
    # repo's cache lifecycle (callers drop them via release_tracked()).
    from ..cache import track

    bigrams = track(bigrams.persist())
    unigrams = track(unigrams.persist())
    vocab_size = unigrams.agg(F.count(F.lit(1)).cast("double").alias("v"))
    return BigramLM(bigrams, unigrams, vocab_size)


def lm_avg_nll(
    df: DataFrame,
    lm: BigramLM,
    text_col: str = "text",
    id_cols: Sequence[str] = ("doc_id",),
    *,
    k: float = 0.1,
) -> DataFrame:
    """Per-document average negative log-likelihood under ``lm``.

    Output: (``*id_cols``, n_bigrams, avg_nll) — ``exp(avg_nll)`` is the
    perplexity; filters threshold avg_nll directly (monotone).  Documents
    with fewer than two tokens yield no row (no bigram evidence).
    ``k`` is the add-k smoothing constant.  Degenerate edge: an EMPTY
    training corpus gives V = 0, so every probability is k/0 → avg_nll
    is -Infinity — train on a non-empty reference slice (the model has
    no information to score with otherwise).
    """
    if k <= 0:
        raise ValueError(f"k must be > 0, got {k}")
    ids = list(id_cols)
    bi = _doc_bigrams(df, text_col, ids)
    joined = (
        bi.join(lm.bigrams, ["w1", "w2"], "left")
        .join(lm.unigrams, ["w1"], "left")
        .crossJoin(F.broadcast(lm.vocab_size))
    )
    # expression ORDER mirrors the oracle SQL exactly: (c2 + k) first,
    # then c1 + (k * V) — IEEE-identical cross-engine up to ln()'s 1-ulp
    nll = -F.log(
        (F.coalesce(F.col("c2"), F.lit(0)).cast("double") + F.lit(k))
        / (
            F.coalesce(F.col("c1"), F.lit(0)).cast("double")
            + F.lit(k) * F.col("v")
        )
    )
    return joined.groupBy(*ids).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.avg(nll).alias("avg_nll"),
    )
