"""Corpus vocabulary: global token frequencies and top-k terms.

Training-data pipelines need corpus-level term statistics (vocabulary
construction, stopword discovery, df-based filtering).  Shape:

    tokenize (projection, fused with scan)
      -> explode
      -> groupBy(token).count()      map-side partial aggregation: the
                                     shuffle carries (token, partial count),
                                     bounded by |vocab| per partition
      -> orderBy(count desc, token).limit(k)
                                     Spark plans TakeOrderedAndProject —
                                     a bounded per-partition top-k merge,
                                     NOT a global sort

``document_frequencies`` counts each token once per document (array_distinct
before the explode) — the df side of tf-idf and the hot-shingle statistic
the dedup cap uses.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["token_frequencies", "top_tokens", "document_frequencies"]


def _tokens(text: Column) -> Column:
    # whitespace tokenization, empty-safe; mirror in SQL oracles with
    # regexp-split on \s+ plus an empty-string filter
    return F.filter(F.split(text, r"\s+"), lambda t: t != "")


def token_frequencies(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """``(token, n)`` global occurrence counts."""
    return (
        df.where(F.col(text_col).isNotNull())
        .select(F.explode(_tokens(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def document_frequencies(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """``(token, df)`` — number of documents containing each token."""
    return (
        df.where(F.col(text_col).isNotNull())
        .select(
            F.explode(
                F.array_distinct(_tokens(F.col(text_col)))
            ).alias("token")
        )
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
    )


def top_tokens(
    df: DataFrame, text_col: str = "text", *, k: int = 100
) -> DataFrame:
    """Top-``k`` tokens by count, deterministic tie-break by token asc."""
    return (
        token_frequencies(df, text_col)
        .orderBy(F.col("n").desc(), F.col("token"))
        .limit(k)
    )
