"""Exact deduplication via content fingerprint hash-aggregation.

Scale shape: one shuffle on a 64-bit hash (not the full text!), map-side
combine collapses repeats early, AQE splits skewed fingerprint buckets.
Hash-collision risk at 10^12 docs with 64-bit hashes is non-trivial
(~birthday at 2^32), so ``exact_duplicate_groups`` can verify within-bucket
equality on a second, independent hash.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame, functions as F

from ..text.analysis import fingerprint, normalized_text

__all__ = ["with_fingerprint", "exact_duplicate_groups", "dedup_exact"]


def with_fingerprint(
    df: DataFrame, text_col: str = "text", *, normalize: bool = True
) -> DataFrame:
    return df.withColumn("fp", fingerprint(F.col(text_col), normalize=normalize))


def exact_duplicate_groups(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    normalize: bool = True,
    verify: bool = True,
    max_group_ids: Optional[int] = None,
) -> DataFrame:
    """Groups of ids sharing identical (normalized) content.

    Output: ``(fp, n_docs, doc_ids array)`` for groups with n_docs > 1.
    ``verify`` adds a second independent hash so 64-bit collisions can't
    merge distinct content (they'd disagree on fp2).

    ``max_group_ids`` is the scale-safe reporting mode: ``doc_ids`` keeps
    only the ``max_group_ids`` smallest ids per group (``n_docs`` stays the
    exact count).  A degenerate corpus — one boilerplate page duplicated
    10^8 times — would otherwise materialize one huge array in a single
    aggregation buffer.  Bounding uses the same two-stage shape as the ANN
    top-k: a partial sorted slice per (group, input partition) — state
    bounded by one partition — then a merge over ≤ cap × #partitions ids.
    """
    src = normalized_text(F.col(text_col)) if normalize else F.col(text_col)
    keyed = df.where(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("doc_id"),
        F.xxhash64(src).alias("fp"),
        *( [F.md5(src).alias("fp2")] if verify else [] ),
    )
    group_keys = ["fp", "fp2"] if verify else ["fp"]
    if max_group_ids is None:
        return (
            keyed.groupBy(*group_keys)
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sort_array(F.collect_list("doc_id")).alias("doc_ids"),
            )
            .where(F.col("n_docs") > 1)
            .select("fp", "n_docs", "doc_ids")
        )
    partial = keyed.groupBy(*group_keys, F.spark_partition_id().alias("_pid")).agg(
        F.count(F.lit(1)).alias("n_part"),
        F.slice(
            F.sort_array(F.collect_list("doc_id")), 1, max_group_ids
        ).alias("ids_part"),
    )
    return (
        partial.groupBy(*group_keys)
        .agg(
            F.sum("n_part").alias("n_docs"),
            F.slice(
                F.sort_array(F.flatten(F.collect_list("ids_part"))),
                1,
                max_group_ids,
            ).alias("doc_ids"),
        )
        .where(F.col("n_docs") > 1)
        .select("fp", "n_docs", "doc_ids")
    )


def dedup_exact(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    normalize: bool = True,
) -> DataFrame:
    """Keep one row (lowest id) per distinct content; NULL text rows kept.

    min_by-shaped aggregation: associative, combiner-friendly, skew-safe.
    """
    src = normalized_text(F.col(text_col)) if normalize else F.col(text_col)
    non_null = df.where(F.col(text_col).isNotNull())
    keyed = non_null.withColumn("__fp", F.xxhash64(src))
    kept = (
        keyed.groupBy("__fp")
        .agg(
            F.min(
                F.struct(F.col(id_col), F.struct(*[F.col(c) for c in df.columns]).alias("r"))
            ).alias("m")
        )
        .select("m.r.*")
    )
    return kept.unionByName(df.where(F.col(text_col).isNull()))
