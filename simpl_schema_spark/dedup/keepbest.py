"""Keep-best deduplication — one survivor per key, chosen by score.

Web crawls see the same page many times (recrawls, mirrors, tracking-param
variants that :func:`..text.urls.url_normalize` collapses to one canonical
url); pipelines keep the *best* version — longest extraction, highest
quality score — not an arbitrary one.

:func:`keep_best` is ONE hash aggregation with full map-side combine: the
winner per key is ``min(struct(-score, id))`` — the repo's deterministic
arg-max idiom (max score, ties to the smallest id) — carried alongside
``count(*)``, so the shuffle moves one tiny struct per key per map
partition no matter how hot the key.  No window, no join, no skew
sensitivity beyond the hash agg AQE already handles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

__all__ = ["keep_best"]

_INTEGRAL = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)


def _neg_exact(df: DataFrame, score_col: str):
    """``-score`` with exact ordering and no ANSI overflow.

    Under Spark 4 ANSI mode ``-CAST(Long.MIN_VALUE AS BIGINT)`` throws
    ARITHMETIC_OVERFLOW; integral scores are therefore widened to
    ``decimal(20,0)`` (lossless for the full 64-bit range, symmetric, so
    negation can't overflow) before negating.  Fractional/decimal types
    negate directly — IEEE floats and Spark decimals are sign-symmetric.
    """
    dt = df.schema[score_col].dataType
    col = F.col(score_col)
    if isinstance(dt, _INTEGRAL):
        col = col.cast("decimal(20,0)")
    return -col


def keep_best(
    df: DataFrame,
    key_col: str,
    score_col: str,
    id_col: str,
) -> DataFrame:
    """One row per ``key_col``: the id with the highest ``score_col``
    (ties → smallest ``id_col``), its score, and the group size.

    Returns ``key_col · keep_id · keep_score · n_dups``.  NULL keys are
    dropped (a null canonical url groups nothing); NULL scores sort last
    within their key (any non-null-scored duplicate wins over them).
    """
    # Ordering trick: struct comparison is lexicographic, so
    # min(struct(-score, id)) is the deterministic arg-max; _neg_exact
    # widens integral scores so the negation is ANSI-overflow-proof.  A
    # leading null-flag field makes the NULL-score rule explicit instead
    # of leaning on engine null-ordering.
    winner = F.min(
        F.struct(
            F.col(score_col).isNull().cast("int").alias("null_last"),
            _neg_exact(df, score_col).alias("s"),
            F.col(id_col).alias("i"),
            F.col(score_col).alias("score"),
        )
    ).alias("w")
    return (
        df.where(F.col(key_col).isNotNull())
        .groupBy(key_col)
        .agg(winner, F.count(F.lit(1)).alias("n_dups"))
        .select(
            key_col,
            F.col("w.i").alias("keep_id"),
            F.col("w.score").alias("keep_score"),
            "n_dups",
        )
    )
