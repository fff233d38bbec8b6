"""Bounded bucket collection for LSH-style candidate generation.

All four candidate generators (n-gram inverted index, MinHash bands, SimHash
chunks, hyperplane-LSH chunks) share the shape::

    explode → groupBy(bucket_key) → collect_list(member) → within-bucket pairs

A hot bucket (boilerplate shingle, near-constant band hash) must never
materialize its full member list in a single aggregation buffer — at 10^12
docs a 10^8-member bucket would OOM the reducer before the size filter could
drop it.  :func:`bounded_buckets` therefore applies the size filter BEFORE
the collect:

1. count pass — ``groupBy(key).count()``: map-side partial aggregation, the
   shuffle carries only ``(key, long)`` pairs; peak reducer state is one
   counter per key.
2. semi-join the in-range keys back onto the exploded rows (AQE picks a
   broadcast when the surviving key set is small; otherwise both sides
   shuffle on the same key, co-partitioned).
3. collect pass — every group is now ≤ ``max_bucket_size`` by construction,
   so the aggregation buffer is bounded.

Cost: one extra (cheap, countable) shuffle versus the naive shape; the
exploded input is evaluated twice, so derive it from a persisted upstream
(all callers persist their signature/shingle DF already).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["bounded_buckets"]


def bounded_buckets(
    exploded: DataFrame,
    key_cols: list[str],
    member: Column,
    *,
    max_bucket_size: int,
    min_bucket_size: int = 2,
    members_alias: str = "members",
) -> DataFrame:
    """``groupBy(key_cols).collect_list(member)`` with the bucket-size filter
    applied BEFORE collection (see module docstring)."""
    sizes = exploded.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("__n"))
    keep = sizes.where(
        (F.col("__n") >= min_bucket_size) & (F.col("__n") <= max_bucket_size)
    ).select(*key_cols)
    bounded = exploded.join(keep, key_cols, "inner")
    return bounded.groupBy(*key_cols).agg(
        F.collect_list(member).alias(members_alias)
    )
