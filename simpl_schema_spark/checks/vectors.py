"""Embedding/vector column validation.

Embedding tables are first-class citizens of a training-data lakehouse, and
their failure modes are not covered by scalar rules: wrong dimensionality
(a model change half-way through a backfill), non-finite values (NaN/Inf
from fp16 overflow), and zero vectors (failed encodes) silently poison
ANN indexes and similarity joins downstream.

``vector_violations`` emits the standard violation rows for them — pure
JVM expressions (``F.size`` / ``F.exists``), one projection, fused with
the scan like every other validator in this engine:

- ``expectedDim``  — array length ≠ the declared dimension (or NULL array)
- ``nonFinite``    — any element NaN, ±Inf, or NULL (a null element is not
  a finite number; without an explicit check SQL three-valued logic would
  let such vectors through as "valid")
- ``zeroVector``   — every element exactly 0.0

One error per row, in that order (dimension errors mask element checks,
matching the one-error-per-key convention of the scalar validators).
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["vector_violations", "with_vector_violation"]

#: engine-level violation types for vector columns (no reference analog —
#: the reference has no array-of-float semantics beyond generic arrays)
EXPECTED_DIM = "expectedDim"
NON_FINITE = "nonFinite"
ZERO_VECTOR = "zeroVector"


def _violation_type(vec: Column, dim: int) -> Column:
    is_bad_dim = vec.isNull() | (F.size(vec) != dim)
    # x.isNull() FIRST: exists() over (null → NULL, finite → false) yields
    # SQL NULL, which would skip this branch and report the vector valid
    has_non_finite = F.exists(
        vec, lambda x: x.isNull() | F.isnan(x) | (F.abs(x) == float("inf"))
    )
    all_zero = ~F.exists(vec, lambda x: x != 0.0)
    return (
        F.when(is_bad_dim, F.lit(EXPECTED_DIM))
        .when(has_non_finite, F.lit(NON_FINITE))
        .when(all_zero, F.lit(ZERO_VECTOR))
    )


def with_vector_violation(
    df: DataFrame, vec_col: str, dim: int, *, out_col: str = "vec_violation"
) -> DataFrame:
    """Attach the (nullable) violation type column — NULL means valid."""
    return df.withColumn(out_col, _violation_type(F.col(vec_col), dim))


def vector_violations(
    df: DataFrame,
    vec_col: str,
    dim: int,
    *,
    id_cols: Iterable[str] = ("vec_id",),
) -> DataFrame:
    """Violation rows ``(*id_cols, name, type)`` for an embedding column."""
    id_cols = list(id_cols)
    t = _violation_type(F.col(vec_col), dim)
    return (
        df.select(*id_cols, t.alias("type"))
        .where(F.col("type").isNotNull())
        .select(*id_cols, F.lit(vec_col).alias("name"), "type")
    )
