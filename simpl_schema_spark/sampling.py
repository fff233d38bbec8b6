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
  deterministic.  One shuffle on the stratum key; per-group state is the
  window's top-n buffer, bounded by ``n`` per partition via the ranked
  filter (Spark's WindowExec spills, and n is small by construction).

At 100 TB prefer ``hash_sample`` (shuffle-free) whenever proportional
sampling is acceptable; reach for ``stratified_sample`` only when exact
per-stratum counts matter (eval set construction, per-language caps).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

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
    hash order (ties broken by the key itself for full determinism)."""
    w = Window.partitionBy(stratum_col).orderBy(
        hash_key(F.col(key_col)), F.col(key_col)
    )
    return (
        df.withColumn("__rank", F.row_number().over(w))
        .where(F.col("__rank") <= n)
        .drop("__rank")
    )
