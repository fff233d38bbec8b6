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


class TestArrayItemPythonValidators:
    """Python custom validators on array-item keys (reference
    validateField.ts:293-306 + friendsSchema-style nested arrays): one
    Arrow UDF over the whole array column, per-index violation names."""

    def test_scalar_items(self, spark):
        def no_banana(v):
            return "noBanana" if v == "banana" else None

        ss = SimpleSchema(
            {
                "tags": {"type": SimpleSchema.Array, "optional": True},
                "tags.$": {"type": str, "custom": no_banana},
            }
        )
        ddl = "tags array<string>"
        expect_errors(
            spark, ss, ddl, {"tags": ["ok", "banana", "x", "banana"]},
            [("tags.1", "noBanana"), ("tags.3", "noBanana")],
        )
        expect_valid(spark, ss, ddl, {"tags": ["a", "b"]})
        expect_valid(spark, ss, ddl, {"tags": None})

    def test_struct_item_field(self, spark):
        # friendsSchema pattern: array of objects, validator on a field
        def valid_name(v):
            if v is not None and not v.istitle():
                return "notTitleCase"
            return None

        ss = SimpleSchema(
            {
                "friends": {"type": SimpleSchema.Array},
                "friends.$": {"type": dict},
                "friends.$.name": {"type": str, "custom": valid_name},
            }
        )
        ddl = "friends array<struct<name string>>"
        expect_errors(
            spark, ss, ddl, {"friends": [{"name": "Ada"}, {"name": "bob"}]},
            [("friends.1.name", "notTitleCase")],
        )
        expect_valid(spark, ss, ddl, {"friends": [{"name": "Ada"}]})

    def test_item_validator_with_context(self, spark):
        def must_match_host(v, ctx):
            host = ctx.field("host")
            if v is not None and host is not None and not v.endswith(host):
                return "hostMismatch"
            return None

        ss = SimpleSchema(
            {
                "host": str,
                "urls": {"type": SimpleSchema.Array, "optional": True},
                "urls.$": {"type": str, "custom": must_match_host},
            }
        )
        ddl = "host string, urls array<string>"
        expect_errors(
            spark, ss, ddl,
            {"host": "a.com", "urls": ["x.a.com", "y.b.org"]},
            [("urls.1", "hostMismatch")],
        )

    def test_mixed_with_builtin_rules(self, spark):
        def no_empty(v):
            return "custom" if v == "zz" else None

        ss = SimpleSchema(
            {
                "tags": {"type": SimpleSchema.Array, "optional": True},
                "tags.$": {"type": str, "max": 4, "custom": no_empty},
            }
        )
        ddl = "tags array<string>"
        expect_errors(
            spark, ss, ddl, {"tags": ["toolong", "zz", "ok"]},
            [("tags.0", "maxString"), ("tags.1", "custom")],
        )


class TestNamedContexts:
    """Named validation contexts + `keys` retained-error merge
    (reference ValidationContext.ts:115-125, SimpleSchema.ts:813-823)."""

    def _schema(self):
        return SimpleSchema(
            {
                "id": {"type": int, "optional": True},
                "a": {"type": str, "min": 3},
                "b": {"type": int, "min": 0, "max": 10},
            }
        )

    def test_named_context_cached(self, spark):
        ss = self._schema()
        assert ss.named_context("form") is ss.named_context("form")
        assert ss.named_context("form") is not ss.named_context("other")
        assert ss.new_context() is not ss.new_context()

    def test_keys_revalidation_retains_other_errors(self, spark):
        ss = self._schema()
        ctx = ss.named_context("form", id_cols=("id",))
        df = spark.createDataFrame([(1, "x", 99)], "id bigint, a string, b bigint")
        r1 = ctx.validate(df)
        errs1 = sorted((e["name"], e["type"]) for e in r1.validation_errors())
        assert errs1 == [("a", "minString"), ("b", "maxNumber")]

        # fix `b` only; revalidate just `b` → a's prior error is retained
        df2 = spark.createDataFrame([(1, "x", 5)], "id bigint, a string, b bigint")
        r2 = ctx.validate(df2, keys=["b"])
        errs2 = sorted((e["name"], e["type"]) for e in r2.validation_errors())
        assert errs2 == [("a", "minString")]
        assert ctx.key_is_invalid("a") and not ctx.key_is_invalid("b")

    def test_keys_revalidation_replaces_validated_key(self, spark):
        ss = self._schema()
        ctx = ss.new_context(id_cols=("id",))
        df = spark.createDataFrame([(1, "ok!", 99)], "id bigint, a string, b bigint")
        ctx.validate(df)
        # b still invalid on revalidation → new error, not duplicated
        r2 = ctx.validate(df, keys=["b"])
        errs = [(e["name"], e["type"]) for e in r2.validation_errors()]
        assert errs == [("b", "maxNumber")]

    def test_reset_clears_retained(self, spark):
        ss = self._schema()
        ctx = ss.new_context(id_cols=("id",))
        df = spark.createDataFrame([(1, "x", 5)], "id bigint, a string, b bigint")
        ctx.validate(df)
        ctx.reset()
        r = ctx.validate(df, keys=["b"])
        assert r.validation_errors() == []  # 'a' error NOT retained after reset


class TestDoublyNestedPythonValidators:
    """Python custom validators under two nested arrays (a.$.b.$.c) — the
    reference recurses arbitrarily (getPositionsForAutoValue.ts:43-148);
    here one Arrow UDF over the OUTER array returns array<array<string>>
    and the nested lambdas index into it."""

    def test_leaf_field_two_levels(self, spark):
        def no_zz(v):
            return "noZZ" if v == "zz" else None

        ss = SimpleSchema(
            {
                "teams": {"type": SimpleSchema.Array, "optional": True},
                "teams.$": {"type": dict},
                "teams.$.members": {"type": SimpleSchema.Array},
                "teams.$.members.$": {"type": str, "custom": no_zz},
            }
        )
        ddl = "teams array<struct<members array<string>>>"
        expect_errors(
            spark, ss, ddl,
            {"teams": [{"members": ["ok", "zz"]}, {"members": ["zz"]}]},
            [("teams.0.members.1", "noZZ"), ("teams.1.members.0", "noZZ")],
        )
        expect_valid(spark, ss, ddl, {"teams": [{"members": ["a", "b"]}]})
        expect_valid(spark, ss, ddl, {"teams": None})

    def test_array_of_arrays(self, spark):
        def positive(v):
            return "notPositive" if v is not None and v <= 0 else None

        ss = SimpleSchema(
            {
                "grid": {"type": SimpleSchema.Array, "optional": True},
                "grid.$": {"type": SimpleSchema.Array},
                "grid.$.$": {"type": int, "custom": positive},
            }
        )
        ddl = "grid array<array<bigint>>"
        expect_errors(
            spark, ss, ddl,
            {"grid": [[1, -2], [3]]},
            [("grid.0.1", "notPositive")],
        )
        expect_valid(spark, ss, ddl, {"grid": [[1], [2, 3]]})

    def test_two_level_with_context(self, spark):
        def below_cap(v, ctx):
            cap = ctx.field("cap")
            if v is not None and cap is not None and v > cap:
                return "overCap"
            return None

        ss = SimpleSchema(
            {
                "cap": int,
                "rows": {"type": SimpleSchema.Array, "optional": True},
                "rows.$": {"type": dict},
                "rows.$.vals": {"type": SimpleSchema.Array},
                "rows.$.vals.$": {"type": int, "custom": below_cap},
            }
        )
        ddl = "cap bigint, rows array<struct<vals array<bigint>>>"
        expect_errors(
            spark, ss, ddl,
            {"cap": 5, "rows": [{"vals": [3, 9]}]},
            [("rows.0.vals.1", "overCap")],
        )
