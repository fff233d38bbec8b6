"""Per-column stats profile — one aggregation pass over the table.

North-rule checks with no reference analog (BASELINE.json: "per-column stats
(null rate, distinct-count via HLL sketches, min/max, type conformance)").

Design for 100 TB:
- ONE ``df.agg(...)`` computes every column's stats in a single scan with
  partial (map-side) aggregation — no per-column jobs, no shuffle beyond the
  final single-partition combine of already-tiny partials.
- distinct counts use HyperLogLog++ (``approx_count_distinct``; mergeable,
  bounded memory) — exact distinct on 10^12 urls would shuffle the world.
- :func:`observe_validation_stats` piggybacks the SAME metrics onto any other
  action via ``df.observe`` so the validation pass and the profile share one
  scan.
"""

from __future__ import annotations

from typing import Iterable, Optional

from pyspark.sql import Column, DataFrame, Observation, functions as F, types as T

__all__ = ["column_profile", "observe_validation_stats", "PROFILE_SCHEMA"]

PROFILE_SCHEMA = (
    "column string, n_rows bigint, null_count bigint, null_rate double, "
    "distinct_approx bigint, min_value string, max_value string"
)


def _stat_exprs(colname: str, dtype: T.DataType, rsd: float) -> list[Column]:
    c = F.col(colname)
    is_orderable = not isinstance(dtype, (T.MapType, T.BinaryType))
    min_c = (
        F.min(c).cast("string") if is_orderable else F.lit(None).cast("string")
    )
    max_c = (
        F.max(c).cast("string") if is_orderable else F.lit(None).cast("string")
    )
    distinct_src = F.xxhash64(c) if isinstance(dtype, (T.BinaryType, T.MapType)) else c
    return [
        F.count(F.lit(1)).alias(f"{colname}__n"),
        F.sum(c.isNull().cast("long")).alias(f"{colname}__nulls"),
        F.approx_count_distinct(distinct_src, rsd).alias(f"{colname}__distinct"),
        min_c.alias(f"{colname}__min"),
        max_c.alias(f"{colname}__max"),
    ]


def column_profile(
    df: DataFrame,
    columns: Optional[Iterable[str]] = None,
    *,
    rsd: float = 0.02,
) -> DataFrame:
    """Long-format profile: one row per column.

    Output: ``(column, n_rows, null_count, null_rate, distinct_approx,
    min_value, max_value)``.
    """
    cols = list(columns) if columns is not None else df.columns
    field_types = {f.name: f.dataType for f in df.schema.fields}
    exprs: list[Column] = []
    for name in cols:
        exprs.extend(_stat_exprs(name, field_types[name], rsd))
    agg = df.agg(*exprs)

    # unpivot the single wide row into long format (still one tiny row — this
    # is a driver-sized reshape expressed relationally)
    per_col = [
        F.struct(
            F.lit(name).alias("column"),
            F.col(f"{name}__n").alias("n_rows"),
            F.col(f"{name}__nulls").alias("null_count"),
            (F.col(f"{name}__nulls") / F.col(f"{name}__n")).alias("null_rate"),
            F.col(f"{name}__distinct").alias("distinct_approx"),
            F.col(f"{name}__min").alias("min_value"),
            F.col(f"{name}__max").alias("max_value"),
        )
        for name in cols
    ]
    return (
        agg.select(F.explode(F.array(*per_col)).alias("s"))
        .select("s.*")
    )


def observe_validation_stats(
    df: DataFrame,
    columns: Optional[Iterable[str]] = None,
    *,
    violations_col: Optional[str] = "violations",
) -> tuple[DataFrame, Observation]:
    """Attach an Observation computing null counts / row count / violation
    totals to an existing plan — zero extra scans; metrics materialize with
    whatever action runs the plan."""
    cols = list(columns) if columns is not None else [
        c for c in df.columns if c != violations_col
    ]
    metrics = [F.count(F.lit(1)).alias("n_rows")]
    for name in cols:
        metrics.append(F.sum(F.col(name).isNull().cast("long")).alias(f"{name}__nulls"))
    if violations_col and violations_col in df.columns:
        metrics.append(
            F.sum(F.size(violations_col)).alias("violation_count")
        )
        metrics.append(
            F.sum((F.size(violations_col) > 0).cast("long")).alias("invalid_rows")
        )
    obs = Observation("simpl_schema_stats")
    return df.observe(obs, *metrics), obs
