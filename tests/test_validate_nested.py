"""Nested-structure parity tests.

Golden expectations ported from:
- required decision table incl. optional-object gating:
  /root/reference/test/SimpleSchema_required.tests.ts:42-116 and
  test/helpers/requiredSchema.ts
- two-level arrays-of-objects: test/helpers/friendsSchema.ts:3-55
"""

import datetime

import pytest

from simpl_schema_spark.schema import SimpleSchema
from simpl_schema_spark.compiler import spark_rule

from helpers import (
    expect_errors,
    expect_required_length,
    expect_valid,
    run_validation,
)

UTC = datetime.timezone.utc


def required_schema():
    """Port of test/helpers/requiredSchema.ts (custom validators as
    @spark_rule — JVM fast path)."""
    from pyspark.sql import functions as F

    @spark_rule
    def invalid_email(value, ctx):
        return F.when(~value.contains("@"), F.lit("invalidEmail"))

    @spark_rule
    def invalid_url(value, ctx):
        return F.when(
            ~value.rlike(r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^\s]+$"), F.lit("invalidUrl")
        )

    return SimpleSchema(
        {
            "requiredString": str,
            "requiredBoolean": bool,
            "requiredNumber": int,
            "requiredDate": {"type": SimpleSchema.Date},
            "requiredEmail": {"type": str, "custom": invalid_email},
            "requiredUrl": {"type": str, "custom": invalid_url},
            "requiredObject": {"type": dict},
            "requiredObject.requiredNumber": int,
            "optionalObject": {"type": dict, "optional": True},
            "optionalObject.requiredString": str,
            "anOptionalOne": {"type": str, "optional": True, "min": 20},
        }
    )


REQUIRED_DDL = (
    "requiredString string, requiredBoolean boolean, requiredNumber bigint, "
    "requiredDate timestamp, requiredEmail string, requiredUrl string, "
    "requiredObject struct<requiredNumber:bigint>, "
    "optionalObject struct<requiredString:string>, anOptionalOne string"
)


class TestRequiredDecisionTable:
    def test_all_present_valid(self, spark):
        expect_valid(
            spark,
            required_schema(),
            REQUIRED_DDL,
            {
                "requiredString": "test",
                "requiredBoolean": True,
                "requiredNumber": 1,
                "requiredDate": datetime.datetime(2020, 1, 1, tzinfo=UTC),
                "requiredEmail": "test123@sub.example.edu",
                "requiredUrl": "http://google.com",
                "requiredObject": {"requiredNumber": 1},
                "optionalObject": {"requiredString": "test"},
            },
        )

    def test_empty_doc_8_required(self, spark):
        # {} ⇒ 8 (requiredObject.requiredNumber fires via promotion;
        # optionalObject.requiredString does NOT)
        expect_required_length(spark, required_schema(), REQUIRED_DDL, {}, 8)

    def test_optional_object_present_9_required(self, spark):
        expect_required_length(
            spark,
            required_schema(),
            REQUIRED_DDL,
            {"optionalObject": {"requiredString": None}},
            9,
        )

    def test_optional_object_empty_9_required(self, spark):
        expect_required_length(
            spark, required_schema(), REQUIRED_DDL, {"optionalObject": {}}, 9
        )

    def test_optional_object_null_8_required(self, spark):
        expect_required_length(
            spark, required_schema(), REQUIRED_DDL, {"optionalObject": None}, 8
        )

    def test_empty_strings_pass_required(self, spark):
        # '' passes required (test/SimpleSchema_required.tests.ts:103-116 ⇒ 7)
        expect_required_length(
            spark,
            required_schema(),
            REQUIRED_DDL,
            {
                "requiredString": "",
                "optionalObject": {"requiredString": ""},
            },
            7,
        )

    def test_whitespace_only_passes_required(self, spark):
        # un-cleaned whitespace-only string passes required
        expect_required_length(
            spark,
            required_schema(),
            REQUIRED_DDL,
            {
                "requiredString": "   ",
                "optionalObject": {"requiredString": "   "},
            },
            7,
        )


def friends_schema():
    """Port of test/helpers/friendsSchema.ts:3-55."""
    return SimpleSchema(
        {
            "name": {"type": str, "optional": True},
            "friends": {"type": SimpleSchema.Array, "minCount": 1},
            "friends.$": {"type": dict},
            "friends.$.name": {"type": str, "max": 3},
            "friends.$.type": {"type": str, "allowedValues": ["best", "good", "bad"]},
            "friends.$.a": {"type": dict, "optional": True},
            "friends.$.a.b": {"type": int, "optional": True},
            "enemies": {"type": SimpleSchema.Array},
            "enemies.$": {"type": dict},
            "enemies.$.name": {"type": str},
            "enemies.$.traits": {"type": SimpleSchema.Array, "optional": True},
            "enemies.$.traits.$": {"type": dict},
            "enemies.$.traits.$.name": {"type": str},
            "enemies.$.traits.$.weight": {"type": float},
        }
    )


FRIENDS_DDL = (
    "name string, "
    "friends array<struct<name:string, type:string, a:struct<b:bigint>>>, "
    "enemies array<struct<name:string, traits:array<struct<name:string, weight:double>>>>"
)


class TestFriendsSchema:
    def test_valid(self, spark):
        expect_valid(
            spark,
            friends_schema(),
            FRIENDS_DDL,
            {
                "friends": [{"name": "Bob", "type": "best", "a": {"b": 1}}],
                "enemies": [],
            },
        )

    def test_missing_arrays(self, spark):
        expect_errors(
            spark,
            friends_schema(),
            FRIENDS_DDL,
            {},
            [("friends", "required"), ("enemies", "required")],
        )

    def test_min_count(self, spark):
        expect_errors(
            spark,
            friends_schema(),
            FRIENDS_DDL,
            {"friends": [], "enemies": []},
            [("friends", "minCount")],
        )

    def test_item_object_required_children(self, spark):
        expect_errors(
            spark,
            friends_schema(),
            FRIENDS_DDL,
            {"friends": [{}], "enemies": []},
            [("friends.0.name", "required"), ("friends.0.type", "required")],
        )

    def test_item_field_rules_with_index_names(self, spark):
        expect_errors(
            spark,
            friends_schema(),
            FRIENDS_DDL,
            {
                "friends": [
                    {"name": "Bobby", "type": "best"},
                    {"name": "Bob", "type": "wut"},
                ],
                "enemies": [],
            },
            [("friends.0.name", "maxString"), ("friends.1.type", "notAllowed")],
        )

    def test_two_level_array_recursion(self, spark):
        # per-index violation naming two levels deep: enemies.0.traits.0.weight
        expect_errors(
            spark,
            friends_schema(),
            FRIENDS_DDL,
            {
                "friends": [{"name": "Bob", "type": "best"}],
                "enemies": [
                    {
                        "name": "Dr. Evil",
                        "traits": [
                            {"name": "evil"},
                            {"weight": 1.5},
                        ],
                    }
                ],
            },
            [
                ("enemies.0.traits.0.weight", "required"),
                ("enemies.0.traits.1.name", "required"),
            ],
        )

    def test_optional_nested_object_in_item(self, spark):
        expect_valid(
            spark,
            friends_schema(),
            FRIENDS_DDL,
            {
                "friends": [{"name": "Bob", "type": "best", "a": None}],
                "enemies": [],
            },
        )


class TestSubschemaComposition:
    def test_subschema_keys_validate(self, spark):
        ref = SimpleSchema({"string": str, "number": {"type": float, "optional": True}})
        ss = SimpleSchema({"ref": {"type": ref, "optional": True}})
        ddl = "ref struct<string:string, number:double>"
        expect_valid(spark, ss, ddl, {"ref": {"string": "hi", "number": 1.5}})
        expect_errors(
            spark, ss, ddl, {"ref": {"number": 1.5}}, [("ref.string", "required")]
        )

    def test_subschema_inside_array(self, spark):
        item = SimpleSchema({"x": {"type": int, "min": 0}})
        ss = SimpleSchema(
            {"arr": {"type": SimpleSchema.Array, "optional": True}, "arr.$": {"type": item}}
        )
        ddl = "arr array<struct<x:bigint>>"
        expect_valid(spark, ss, ddl, {"arr": [{"x": 1}]})
        expect_errors(
            spark, ss, ddl, {"arr": [{"x": -1}]}, [("arr.0.x", "minNumber")]
        )


class TestDeepNesting:
    def test_three_level_objects(self, spark):
        ss = SimpleSchema(
            {
                "a": {"type": dict},
                "a.b": {"type": dict},
                "a.b.c": str,
            }
        )
        ddl = "a struct<b:struct<c:string>>"
        expect_valid(spark, ss, ddl, {"a": {"b": {"c": "x"}}})
        # missing required promotes through required ancestors: a, a.b, a.b.c all fire
        expect_errors(
            spark,
            ss,
            ddl,
            {},
            [("a", "required"), ("a.b", "required"), ("a.b.c", "required")],
        )

    def test_optional_middle_gates_descendants(self, spark):
        ss = SimpleSchema(
            {
                "a": {"type": dict},
                "a.b": {"type": dict, "optional": True},
                "a.b.c": str,
            }
        )
        ddl = "a struct<b:struct<c:string>>"
        # a present, b missing → only nothing (b optional gates c)
        expect_valid(spark, ss, ddl, {"a": {"b": None}})
        # b present, c missing → c required
        expect_errors(
            spark, ss, ddl, {"a": {"b": {}}}, [("a.b.c", "required")]
        )
