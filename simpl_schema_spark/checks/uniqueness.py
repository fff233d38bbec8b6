"""Uniqueness / duplicate-key checks with skew-aware aggregation.

North rule: "uniqueness checks (url dedup via sort-merge/hash aggregation
with salting for skewed hosts)".

Scale notes (10^12 rows, 1000 executors):
- ``duplicate_keys`` is a hash aggregation on the key. Spark's partial
  aggregation (map-side combine) already collapses hot keys per task, so a
  COUNT-shaped agg doesn't need manual salting; AQE's skew handling covers
  the final exchange. We still expose ``salt_buckets`` for the pathological
  case (one url repeated billions of times): a two-stage
  ``(key, salt) → partial count → key → final sum`` aggregation bounds any
  single reducer's work.
- ``dedup_keep_first`` needs a full row per group, so heavy groups DO hurt:
  we use a two-stage min-struct aggregation (associative, combiner-friendly)
  instead of ``row_number() over (partition by …)``, which would sort whole
  partitions and choke on a skewed key.
"""

from __future__ import annotations

from typing import Iterable, Optional, Sequence

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["duplicate_keys", "duplicate_violations", "dedup_keep_first"]


def duplicate_keys(
    df: DataFrame,
    key_cols: Sequence[str],
    *,
    salt_buckets: Optional[int] = None,
) -> DataFrame:
    """Keys appearing more than once → ``(key…, dup_count)``."""
    keys = [F.col(k) for k in key_cols]
    if not salt_buckets:
        return (
            df.groupBy(*keys)
            .agg(F.count(F.lit(1)).alias("dup_count"))
            .where(F.col("dup_count") > 1)
        )
    # explicit two-stage salted aggregation: bounds per-reducer work even if
    # one key dominates the table
    salt = (F.xxhash64(F.monotonically_increasing_id()) % salt_buckets).alias("__salt")
    partial = (
        df.select(*keys, salt)
        .groupBy(*key_cols, "__salt")
        .agg(F.count(F.lit(1)).alias("__partial"))
    )
    return (
        partial.groupBy(*key_cols)
        .agg(F.sum("__partial").alias("dup_count"))
        .where(F.col("dup_count") > 1)
    )


def duplicate_violations(
    df: DataFrame,
    key_col: str,
    *,
    salt_buckets: Optional[int] = None,
) -> DataFrame:
    """Duplicates as violation rows ``(name, type, value…)`` keyed by the
    offending key value — the relational form of a 'duplicate url' error."""
    dups = duplicate_keys(df, [key_col], salt_buckets=salt_buckets)
    return dups.select(
        F.col(key_col),
        F.lit(key_col).alias("name"),
        F.lit("duplicateKey").alias("type"),
        F.col(key_col).cast("string").alias("value"),
        F.col("dup_count"),
    )


def dedup_keep_first(
    df: DataFrame,
    key_cols: Sequence[str],
    order_col: str,
    *,
    tie_break_cols: Sequence[str] = (),
) -> DataFrame:
    """Keep the first row per key by ``order_col`` (e.g. earliest warc_ts).

    Implemented as ``min_by``-style struct-min aggregation: associative and
    combiner-friendly, so hot keys collapse map-side instead of sorting a
    skewed window partition. One shuffle on the key.
    """
    payload = F.struct(
        F.col(order_col),
        *[F.col(c) for c in tie_break_cols],
        F.struct(*[F.col(c) for c in df.columns]).alias("__row"),
    )
    out = (
        df.groupBy(*[F.col(k) for k in key_cols])
        .agg(F.min(payload).alias("__first"))
        .select("__first.__row.*")
    )
    return out
