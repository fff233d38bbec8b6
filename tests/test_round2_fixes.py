"""Round-2 regression tests: ADVICE fixes + cross-field custom validators.

- lineage: derived part_key must not leak into validation (spurious
  keyNotInSchema per row)
- compile: Python custom validators on nested keys receive the LEAF value
- modifiers: trim re-encodes JSON strings with proper escaping
- exporters: to_spark_struct honors required → nullable=False
- cross-field custom validators: @spark_rule ctx.field()/sibling_field()
  (JVM path) and two-argument Python validators (pandas ctx path), mirroring
  the reference's password-match test (test/SimpleSchema_custom.tests.ts:9-21)
"""

import json

import pytest

from pyspark.sql import functions as F

from simpl_schema_spark.compiler import spark_rule
from simpl_schema_spark.schema import SimpleSchema
from simpl_schema_spark.schema.exporters import to_spark_struct

from helpers import expect_errors, expect_valid, run_validation


class TestCrossFieldSparkRule:
    def _schema(self):
        @spark_rule
        def matches_password(value, ctx):
            return F.when(
                value != ctx.field("password"), F.lit("passwordMismatch")
            )

        return SimpleSchema(
            {
                "password": str,
                "confirm": {"type": str, "custom": matches_password},
            }
        )

    def test_mismatch(self, spark):
        expect_errors(
            spark,
            self._schema(),
            "password string, confirm string",
            {"password": "a", "confirm": "b"},
            [("confirm", "passwordMismatch")],
        )

    def test_match(self, spark):
        expect_valid(
            spark,
            self._schema(),
            "password string, confirm string",
            {"password": "a", "confirm": "a"},
        )

    def test_sibling_field_nested(self, spark):
        @spark_rule
        def lo_below_hi(value, ctx):
            return F.when(
                value > ctx.sibling_field("hi"), F.lit("loAboveHi")
            )

        ss = SimpleSchema(
            {
                "r": {"type": dict},
                "r.lo": {"type": int, "custom": lo_below_hi},
                "r.hi": int,
            }
        )
        ddl = "r struct<lo bigint, hi bigint>"
        expect_errors(
            spark, ss, ddl, {"r": {"lo": 9, "hi": 3}}, [("r.lo", "loAboveHi")]
        )
        expect_valid(spark, ss, ddl, {"r": {"lo": 1, "hi": 3}})

    def test_conditionally_required(self, spark):
        # reference README:1175+ recipe: requiredIf another field is set
        @spark_rule
        def required_if_email(value, ctx):
            return F.when(
                value.isNull() & ctx.field("wants_email").isNotNull(),
                F.lit("required"),
            )

        ss = SimpleSchema(
            {
                "wants_email": {"type": bool, "optional": True},
                "email": {"type": str, "optional": True,
                          "custom": required_if_email},
            }
        )
        ddl = "wants_email boolean, email string"
        expect_errors(
            spark, ss, ddl, {"wants_email": True, "email": None},
            [("email", "required")],
        )
        expect_valid(spark, ss, ddl, {"wants_email": None, "email": None})
        expect_valid(spark, ss, ddl, {"wants_email": True, "email": "x@y.z"})


class TestCrossFieldPandasValidator:
    def test_two_arg_python_validator(self, spark):
        def matches_password(value, ctx):
            if value != ctx.field("password"):
                return "passwordMismatch"
            return None

        ss = SimpleSchema(
            {
                "password": str,
                "confirm": {"type": str, "custom": matches_password},
            }
        )
        ddl = "password string, confirm string"
        expect_errors(
            spark, ss, ddl, {"password": "a", "confirm": "b"},
            [("confirm", "passwordMismatch")],
        )
        expect_valid(spark, ss, ddl, {"password": "a", "confirm": "a"})

    def test_declared_context_fields(self, spark):
        def matches_password(value, ctx):
            return None if value == ctx.field("password") else "passwordMismatch"

        matches_password.context_fields = ["password"]

        ss = SimpleSchema(
            {
                "password": str,
                "confirm": {"type": str, "custom": matches_password},
                "other": {"type": str, "optional": True},
            }
        )
        expect_errors(
            spark, ss, "password string, confirm string, other string",
            {"password": "a", "confirm": "b", "other": None},
            [("confirm", "passwordMismatch")],
        )

    def test_nested_key_python_validator_gets_leaf(self, spark):
        # ADVICE regression: custom validator on 'a.b' used to receive the
        # parent struct and crash inside the Arrow UDF
        seen = []

        def check_leaf(value):
            if value == "bad":
                return "badLeaf"
            return None

        ss = SimpleSchema(
            {
                "a": {"type": dict},
                "a.b": {"type": str, "custom": check_leaf},
            }
        )
        ddl = "a struct<b string>"
        expect_errors(spark, ss, ddl, {"a": {"b": "bad"}}, [("a.b", "badLeaf")])
        expect_valid(spark, ss, ddl, {"a": {"b": "good"}})

    def test_sibling_field_python_nested(self, spark):
        def must_match_sib(value, ctx):
            if value != ctx.sibling_field("expected"):
                return "sibMismatch"
            return None

        ss = SimpleSchema(
            {
                "o": {"type": dict},
                "o.got": {"type": str, "custom": must_match_sib},
                "o.expected": str,
            }
        )
        ddl = "o struct<got string, expected string>"
        expect_errors(
            spark, ss, ddl, {"o": {"got": "x", "expected": "y"}},
            [("o.got", "sibMismatch")],
        )
        expect_valid(spark, ss, ddl, {"o": {"got": "y", "expected": "y"}})


class TestLineagePartKeyFix:
    def test_no_spurious_part_key_violations(self, spark, tmp_path):
        from simpl_schema_spark.datagen import documents_schema, generate_documents
        from simpl_schema_spark.lineage import run_partitioned_validation

        out = str(tmp_path / "run")
        docs = generate_documents(spark, 300).where(
            F.to_date("warc_ts") == "2024-01-01"
        )
        n = docs.count()
        assert n > 0
        run_partitioned_validation(docs, documents_schema(), out)
        v = spark.read.parquet(f"{out}/violations")
        assert v.where(F.col("name") == "part_key").count() == 0
        metrics = spark.read.parquet(f"{out}/metrics")
        row = metrics.collect()[0]
        # without the fix every row was invalid (spurious keyNotInSchema)
        assert row.n_invalid_rows < row.n_rows


class TestModifierTrimEscaping:
    def test_trim_preserves_escapes(self, spark):
        from simpl_schema_spark.modifiers import clean_modifier_table

        ss = SimpleSchema({"s": str})
        raw = '  say "hi" \\ there  '
        df = spark.createDataFrame(
            [(1, "$set", "s", json.dumps(raw), False)],
            "doc_id bigint, op string, key_path string, value string, upsert boolean",
        )
        out = clean_modifier_table(df, ss).collect()
        assert len(out) == 1
        cleaned = out[0].value
        # must still be valid JSON and decode to the trimmed original
        assert json.loads(cleaned) == 'say "hi" \\ there'

    def test_cleaned_value_still_validated(self, spark):
        # regression: corrupted JSON made from_json return NULL and silently
        # skipped min/regEx checks
        from simpl_schema_spark.modifiers import (
            clean_modifier_table,
            validate_modifier_table,
        )

        ss = SimpleSchema({"s": {"type": str, "max": 5}})
        raw = '  a "quoted" overlong value  '
        df = spark.createDataFrame(
            [(1, "$set", "s", json.dumps(raw), False)],
            "doc_id bigint, op string, key_path string, value string, upsert boolean",
        )
        cleaned = clean_modifier_table(df, ss)
        viols = validate_modifier_table(cleaned, ss).collect()
        assert [(v.name, v.type) for v in viols] == [("s", "maxString")]


class TestStructExportNullable:
    def test_required_not_nullable(self):
        ss = SimpleSchema(
            {"req": str, "opt": {"type": str, "optional": True}}
        )
        st = to_spark_struct(ss)
        by_name = {f.name: f for f in st.fields}
        assert by_name["req"].nullable is False
        assert by_name["opt"].nullable is True
