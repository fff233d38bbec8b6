"""Schema drift: structural comparison of a table against its baseline.

Value-level drift (chi²/PSI/KS) misses the failure mode that precedes it:
the crawl pipeline's SCHEMA changed — a column disappeared, appeared, or
changed type between snapshots.  ``schema_drift_violations`` compares a
DataFrame's actual schema against a baseline (a Spark ``StructType``, a
``SimpleSchema`` via its StructType exporter, or a plain
``{name: simpleString}`` dict) and emits violation-style rows:

- ``missingColumn`` — in the baseline, absent from the data
- ``newColumn``    — in the data, absent from the baseline
- ``typeChanged``  — present in both with different Spark types

Driver-side only (schemas are metadata) — zero jobs, usable as a
pre-flight gate before launching a 100 TB validation run.
"""

from __future__ import annotations

from typing import Union

from pyspark.sql import DataFrame, SparkSession, types as T

__all__ = ["schema_drift_violations"]

MISSING_COLUMN = "missingColumn"
NEW_COLUMN = "newColumn"
TYPE_CHANGED = "typeChanged"


def _as_field_map(baseline) -> dict:
    if isinstance(baseline, T.StructType):
        return {f.name: f.dataType.simpleString() for f in baseline.fields}
    if isinstance(baseline, dict):
        return {k: str(v) for k, v in baseline.items()}
    # SimpleSchema: use the StructType exporter
    from ..schema.schema import SimpleSchema

    if isinstance(baseline, SimpleSchema):
        from ..schema.exporters import to_spark_struct

        return _as_field_map(to_spark_struct(baseline))
    raise TypeError(
        f"baseline must be StructType, dict, or SimpleSchema; got "
        f"{type(baseline).__name__}"
    )


def schema_drift_violations(
    df: DataFrame,
    baseline: Union[T.StructType, dict, object],
) -> DataFrame:
    """``(name, type, expected, actual)`` rows; empty when schemas agree."""
    base = _as_field_map(baseline)
    actual = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    rows = []
    for name, dtype in base.items():
        if name not in actual:
            rows.append((name, MISSING_COLUMN, dtype, None))
        elif actual[name] != dtype:
            rows.append((name, TYPE_CHANGED, dtype, actual[name]))
    for name, dtype in actual.items():
        if name not in base:
            rows.append((name, NEW_COLUMN, None, dtype))
    spark = df.sparkSession
    return spark.createDataFrame(
        rows, "name string, type string, expected string, actual string"
    )
