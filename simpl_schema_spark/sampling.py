"""Deterministic sampling for training-data pipelines.

Random sampling is wrong for a resumable 10^12-row pipeline: re-runs must
select the SAME rows (idempotent partitions, reproducible ablations), and
the selection must be stable under repartitioning.  Both operators key the
decision on a content hash, not on RNG state:

- :func:`hash_sample` — keep a row iff the md5 of its key falls below the
  rate threshold.  Pure projection: fuses with the scan, prunes BEFORE any
  downstream shuffle, and two pipelines sampling the same key space select
  identical rows.  md5 (not xxhash64) so any engine — including the DuckDB
  oracle — reproduces the selection bit-for-bit.
- :func:`stratified_sample` — exactly ``n`` rows per stratum (e.g. per
  language), chosen by hash order so the per-stratum sample is also
  deterministic.  Two-stage bounded top-n (the repo's ann/exact-dup
  shape), NOT a per-stratum window: a window ``partitionBy(stratum)``
  funnels EVERY row of a stratum through one task's sort, and with
  low-cardinality strata (lang='en' is half a web corpus) that one task
  is a serial bottleneck at scale.  Stage 1 slices the n smallest-hash
  rows per (stratum, input partition) — state bounded by one input
  partition; stage 2 merges ≤ n × #partitions candidates per stratum.

At 100 TB prefer ``hash_sample`` (shuffle-free) whenever proportional
sampling is acceptable; reach for ``stratified_sample`` only when exact
per-stratum counts matter (eval set construction, per-language caps).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["hash_key", "hash_sample", "stratified_sample"]

#: 16^8 — the sample decision reads the first 8 hex chars of the md5
_SPACE = 1 << 32


def hash_key(key: Column) -> Column:
    """First 8 md5 hex chars of the stringified key as a uniform uint32.
    md5-on-string is portable across engines (same value in DuckDB SQL:
    ``('0x' || substring(md5(k), 1, 8))::ubigint``)."""
    return F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10).cast(
        "long"
    )


def hash_sample(
    df: DataFrame, key_col: str, rate: float
) -> DataFrame:
    """Deterministic ~``rate`` sample keyed on ``key_col``'s content."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    threshold = int(rate * _SPACE)
    return df.where(hash_key(F.col(key_col)) < F.lit(threshold))


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    key_col: str,
    n: int,
) -> DataFrame:
    """Exactly ``min(n, |stratum|)`` rows per stratum, deterministic by
    hash order (ties broken by the key itself for full determinism).

    Selected set is identical to ``row_number() over (partition by stratum
    order by hash_key(key), key) <= n`` but computed with the two-stage
    bounded top-n shape — no single-task per-stratum sort, and the stage-2
    shuffle moves only ≤ n rows per (stratum, input partition) instead of
    the full table.  Sorting compares only ``(hash, key)`` via an explicit
    ``array_sort`` comparator, so rows may contain non-orderable columns
    (maps) without breaking the sort.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    # NULL keys sort first (the window version's asc-nulls-first default),
    # carried as an EXPLICIT leading flag — xxhash/md5 outputs range over
    # the full integer space, so no sentinel hash value can encode
    # null-ness without colliding with a real key's hash
    item = F.struct(
        F.col(key_col).isNotNull().cast("int").alias("nn"),
        hash_key(F.col(key_col)).alias("hk"),
        F.col(key_col).alias("k"),
        F.struct(*[F.col(c) for c in df.columns]).alias("row"),
    )

    def _cmp(a, b):
        return (
            F.when(a["nn"] < b["nn"], F.lit(-1))
            .when(a["nn"] > b["nn"], F.lit(1))
            .when(a["hk"] < b["hk"], F.lit(-1))
            .when(a["hk"] > b["hk"], F.lit(1))
            .when(a["k"] < b["k"], F.lit(-1))
            .when(a["k"] > b["k"], F.lit(1))
            .otherwise(F.lit(0))
        )

    partial = df.groupBy(
        F.col(stratum_col).alias("__stratum"),
        F.spark_partition_id().alias("__pid"),
    ).agg(
        F.slice(F.array_sort(F.collect_list(item), _cmp), 1, n).alias("__cand")
    )
    merged = partial.groupBy("__stratum").agg(
        F.slice(
            F.array_sort(F.flatten(F.collect_list("__cand")), _cmp), 1, n
        ).alias("__top")
    )
    return merged.select(F.explode("__top").alias("__e")).select("__e.row.*")
