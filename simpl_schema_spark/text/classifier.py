"""Model-based quality scoring — a hashing-trick linear classifier.

The modern web-corpus quality stage is a trained classifier (fastText in
CCNet/DCLM, a linear probe in FineWeb-Edu), not hand heuristics.  Its
inference shape is what matters to the engine: tokens are hashed into a
fixed bucket space (the hashing trick), each bucket carries a learned
weight, and a document's score is the bias plus the MEAN bucket weight
of its tokens — exactly fastText's bag-of-buckets average for a binary
head.  This module runs that inference Spark-native for any
caller-supplied weight table; training happens offline.

Scale shape: token explode rides the scan; the weight table is
bucket-cardinality-sized (2^10..2^20 rows — model-sized, not
corpus-sized) so the lookup join broadcasts (AQE-decided); one
per-document aggregation ends the pipeline.  No Python in the hot path.

Determinism: with integral weights (e.g. milli-units) the per-document
sum is exact integer arithmetic and one final IEEE division — the driver
contract gates it hash-exact against DuckDB via the md5 hash family
(``hash_family='xxhash64'`` is the cheaper production default).  The
score is the LINEAR head (logit); apply a sigmoid downstream if a
probability is needed — libm ``exp`` is not bit-identical across
engines, so the operator does not bake it in.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .analysis import normalized_text, word_tokens

__all__ = ["token_buckets", "classifier_score"]


def token_buckets(
    text: Column, n_buckets: int, *, hash_family: str = "xxhash64"
) -> Column:
    """Per-token hash buckets (``array<long>``, values in
    ``[0, n_buckets)``) over normalized word tokens.

    ``hash_family``: ``'xxhash64'`` (production: one JVM hash per token)
    or ``'md5'`` (engine-portable: any SQL engine reproduces the bucket
    ids bit-for-bit — the repo's established portable-hash idiom).
    """
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    toks = word_tokens(normalized_text(text))
    if hash_family == "xxhash64":
        return F.transform(
            toks, lambda t: F.pmod(F.xxhash64(t), F.lit(n_buckets))
        )
    if hash_family == "md5":
        return F.transform(
            toks,
            lambda t: F.pmod(
                F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long"),
                F.lit(n_buckets),
            ),
        )
    raise ValueError(f"unknown hash_family: {hash_family!r}")


def classifier_score(
    df: DataFrame,
    weights: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    n_buckets: int,
    bias: float = 0.0,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """Linear-head score per document: ``bias + mean(weight[bucket(t)])``
    over the document's tokens (missing buckets weigh 0).

    ``weights``: two columns ``(bucket, weight)`` — the trained model.
    Zero-token documents score exactly ``bias``.  Returns
    ``id_col · n_tokens · score``.
    """
    wcols = weights.columns
    w = weights.select(
        F.col(wcols[0]).cast("long").alias("__bucket"),
        F.col(wcols[1]).alias("__w"),
    )
    exploded = df.select(
        F.col(id_col).alias("__id"),
        F.explode_outer(
            token_buckets(F.col(text_col), n_buckets, hash_family=hash_family)
        ).alias("__b"),
    )
    scored = exploded.join(
        w, F.col("__b") == F.col("__bucket"), "left"
    ).groupBy(F.col("__id").alias(id_col)).agg(
        F.count(F.col("__b")).alias("n_tokens"),
        (
            F.lit(bias)
            + F.coalesce(F.sum("__w"), F.lit(0))
            / F.greatest(F.count(F.col("__b")), F.lit(1))
        ).cast("double").alias("score"),
    )
    return scored
