"""Test helpers: run a schema against literal rows, mirroring the reference's
expectErrorLength / expectErrorOfTypeLength helpers
(/root/reference/test/helpers/*.ts)."""

from __future__ import annotations

from pyspark.sql import functions as F

from simpl_schema_spark.validation import with_violations


def run_validation(spark, schema, ddl, rows, **kwargs):
    """Validate literal rows; returns list of violation dicts (single doc →
    the doc's violations; multiple docs → list of lists by input order)."""
    df = spark.createDataFrame(rows, schema=ddl)
    out = with_violations(df, schema, **kwargs).select("violations").collect()
    return [[v.asDict() for v in row.violations] for row in out]


def expect_valid(spark, schema, ddl, row, **kwargs):
    violations = run_validation(spark, schema, ddl, [row], **kwargs)[0]
    assert violations == [], f"expected valid, got {violations}"


def expect_errors(spark, schema, ddl, row, expected, **kwargs):
    """expected: list of (name, type) pairs, order-insensitive."""
    violations = run_validation(spark, schema, ddl, [row], **kwargs)[0]
    got = sorted((v["name"], v["type"]) for v in violations)
    assert got == sorted(expected), f"\n got: {got}\nwant: {sorted(expected)}"


def expect_error_length(spark, schema, ddl, row, n, **kwargs):
    violations = run_validation(spark, schema, ddl, [row], **kwargs)[0]
    assert len(violations) == n, f"expected {n} errors, got {violations}"


def expect_required_length(spark, schema, ddl, row, n, **kwargs):
    violations = run_validation(spark, schema, ddl, [row], **kwargs)[0]
    req = [v for v in violations if v["type"] == "required"]
    assert len(req) == n, f"expected {n} required errors, got {violations}"
