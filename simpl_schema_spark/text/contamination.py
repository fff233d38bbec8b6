"""Benchmark-contamination check: token-n-gram overlap vs an eval corpus.

The standard training-data hygiene step before a large pretraining run:
flag training documents sharing k-gram shingles with a benchmark/eval set
so they can be dropped (or the benchmark score discounted).  Reuses the
dedup pipeline's shingle construction (:func:`..dedup.minhash.shingles`:
normalize → tokenize → distinct word k-grams).

Scale shape: the EVAL side is tiny versus a 10^12-document corpus
(benchmarks are thousands of documents), so its distinct shingle set is
deduped and BROADCAST; the train side is one fused
projection+explode, a broadcast-hash semi join, and a count aggregation —
the corpus text itself never shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..dedup.minhash import shingles_from_tokens
from .analysis import normalized_text, word_tokens

__all__ = ["ngram_overlap"]


def ngram_overlap(
    train: DataFrame,
    eval_df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_text_col: str | None = None,
    k: int = 8,
) -> DataFrame:
    """``(doc_id, n_shared)`` — distinct ``k``-gram shingles each train
    document shares with ANY eval document; only contaminated documents
    (n_shared ≥ 1) are returned.

    ``shingles`` are per-document distinct, so ``n_shared`` counts each
    colliding shingle once per train document.
    """
    etc = eval_text_col or text_col
    # toks staged per side: shingles' gram lambda references the token
    # array per position — inlined tokenizers re-run O(n) times per doc
    # (the winnow trap, BENCH/ROUND5.md)
    t = (
        train.where(F.col(text_col).isNotNull())
        .select(
            F.col(id_col).alias("doc_id"),
            word_tokens(normalized_text(F.col(text_col))).alias("__toks"),
        )
        .select(
            "doc_id",
            F.explode(shingles_from_tokens(F.col("__toks"), k)).alias("g"),
        )
    )
    e = (
        eval_df.where(F.col(etc).isNotNull())
        .select(word_tokens(normalized_text(F.col(etc))).alias("__toks"))
        .select(F.explode(shingles_from_tokens(F.col("__toks"), k)).alias("g"))
        .distinct()
    )
    return (
        t.join(F.broadcast(e), "g")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
