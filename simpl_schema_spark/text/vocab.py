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

__all__ = [
    "token_frequencies",
    "top_tokens",
    "document_frequencies",
    "tf_idf_top_terms",
    "vocab_coverage",
]


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


def vocab_coverage(
    df: DataFrame, text_col: str = "text", *, vocab_size: int = 1000
) -> DataFrame:
    """One row ``(vocab_size, n_vocab, covered, total, coverage)`` — the
    fraction of all token OCCURRENCES a top-``vocab_size`` frequency
    vocabulary covers (the standard curve for sizing tokenizer vocabs /
    estimating OOV rates; n_vocab < vocab_size when the corpus has fewer
    distinct tokens).

    Shape: one token-count aggregation (map-side combine), a
    TakeOrdered top-V cut of the (distinct-token-sized) count table —
    deterministic ties by token asc — then two 1-row sums crossJoined.
    Integer arithmetic end-to-end except the final ratio (round 6 for
    the engine-portable oracle).
    """
    if vocab_size < 1:
        raise ValueError(f"vocab_size must be >= 1, got {vocab_size}")
    freqs = token_frequencies(df, text_col).persist()
    top = (
        freqs.orderBy(F.col("n").desc(), F.col("token"))
        .limit(vocab_size)
        .agg(
            F.count(F.lit(1)).alias("n_vocab"),
            F.coalesce(F.sum("n"), F.lit(0)).alias("covered"),
        )
    )
    totals = freqs.agg(F.coalesce(F.sum("n"), F.lit(0)).alias("total"))
    out = (
        top.crossJoin(F.broadcast(totals))
        .select(
            F.lit(vocab_size).alias("vocab_size"),
            "n_vocab",
            "covered",
            "total",
            F.round(
                F.when(
                    F.col("total") > 0,
                    F.col("covered") / F.col("total").cast("double"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("coverage"),
        )
    )
    from ..cache import lazy_result

    return lazy_result(out, freqs)


def tf_idf_top_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    k: int = 5,
    min_df: int = 1,
) -> DataFrame:
    """Top-``k`` tf-idf terms per document: ``(doc_id, token, tf, df,
    tf_idf, rank)``.

    Shape: per-doc term counts (one explode + groupBy — map-side combine),
    document frequencies over the same exploded stream, then a plain
    equi-join of the two on ``token``.  The join is deliberately NOT
    broadcast-hinted: a web-scale distinct-token table is itself huge
    (10^8+ rows of typos/URLs/numbers), and a forced broadcast OOMs the
    driver where a co-partitioned shuffle join — both sides already hash
    on ``token`` — is fine; AQE still picks a broadcast at small scale
    where the vocab fits.  ``min_df`` drops tokens appearing in fewer
    documents before the join (the standard vocabulary cap — hapax tokens
    dominate an uncapped web vocab and never score top-k anyway; note a
    dropped token's doc rows simply don't join, so per-doc results only
    contain tokens with df ≥ min_df).  The per-doc top-k is a window
    bounded by the document's own term count.  ``tf_idf = tf · ln(n_docs
    / df)``; ordering ties break by token asc so ranks are deterministic.
    """
    from pyspark.sql import Window

    docs = df.where(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("__text")
    )
    # n_docs stays a LAZY 1-row aggregate broadcast-cross-joined below —
    # no eager count job and no corpus-sized persist; the idf division
    # consumes the count cast to double, the identical IEEE value the old
    # F.lit(float(n_docs)) literal carried.  docs is consumed twice
    # (terms + this count) but both are scan-level projections, so the
    # cost is one extra column-pruned scan, not a shuffle.
    n_docs_df = docs.agg(
        F.count(F.lit(1)).cast("double").alias("__n_docs")
    )
    terms = docs.select(
        "doc_id", F.explode(_tokens(F.col("__text"))).alias("token")
    )
    tf = terms.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    # tf IS the distinct (doc, token) set — document frequencies
    # aggregate the (much smaller) tf table instead of re-exploding the
    # corpus through a distinct().  tf is persisted (lazily — the dfreq
    # stage populates it, the score join reuses it) because both read it.
    tf = tf.persist()
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    if min_df > 1:
        dfreq = dfreq.where(F.col("df") >= min_df)
    scored = (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(n_docs_df))
        .select(
            "doc_id",
            "token",
            "tf",
            "df",
            (F.col("tf") * F.log(F.col("__n_docs") / F.col("df"))).alias(
                "tf_idf"
            ),
        )
    )
    # rank on a QUANTIZED score (micro-units, bigint): Math.log and a SQL
    # engine's ln() may differ in the last ulp, and two mathematically
    # equal scores computed via different (tf, df) pairs could order
    # differently across engines — integer micro-units make the ordering
    # engine-portable, with ties broken by token
    w = Window.partitionBy("doc_id").orderBy(
        F.round(F.col("tf_idf") * 1e6).cast("long").desc(), F.col("token")
    )
    out = (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("doc_id", "token", "tf", "df", "tf_idf", "rank")
    )
    # tf feeds both aggregation branches of out's single action — release
    # its cache only after the (k-per-doc-sized) result is materialized
    from ..cache import lazy_result

    return lazy_result(out, tf)
