"""Scalar rule parity tests — assertions drawn from the reference suite:
type checks (test/SimpleSchema_type.tests.ts), min/max
(test/SimpleSchema_min.tests.ts, _max.tests.ts), regEx
(test/SimpleSchema_regEx.tests.ts), allowedValues
(test/SimpleSchema_allowedValues.tests.ts)."""

import datetime
import math
import re

import pytest

from simpl_schema_spark.schema import SimpleSchema, oneOf
from simpl_schema_spark.compiler import spark_rule

from helpers import (
    expect_errors,
    expect_error_length,
    expect_valid,
    run_validation,
)

UTC = datetime.timezone.utc


class TestStringRules:
    def _schema(self):
        return SimpleSchema(
            {
                "s": {"type": str, "optional": True, "min": 2, "max": 5},
                "r": {"type": str, "optional": True, "regEx": re.compile(r"^[a-z0-9_]+$")},
            }
        )

    DDL = "s string, r string"

    def test_valid(self, spark):
        expect_valid(spark, self._schema(), self.DDL, {"s": "abc", "r": "ok_1"})

    def test_null_optional_passes(self, spark):
        expect_valid(spark, self._schema(), self.DDL, {})

    def test_max_string(self, spark):
        vs = run_validation(spark, self._schema(), self.DDL, [{"s": "toolong"}])[0]
        assert [(v["name"], v["type"], v["max"]) for v in vs] == [("s", "maxString", "5")]

    def test_min_string(self, spark):
        expect_errors(spark, self._schema(), self.DDL, {"s": "a"}, [("s", "minString")])

    def test_regex_fails(self, spark):
        vs = run_validation(spark, self._schema(), self.DDL, [{"r": "NOPE!"}])[0]
        assert vs[0]["type"] == "regEx"
        assert vs[0]["regExp"] == "/^[a-z0-9_]+$/"

    def test_empty_string_fails_regex(self, spark):
        # '' is a real value (test/SimpleSchema_regEx.tests.ts:8-37)
        expect_errors(spark, self._schema(), self.DDL, {"r": ""}, [("r", "regEx")])

    def test_skip_regex_for_empty_strings(self, spark):
        ss = SimpleSchema(
            {
                "r": {
                    "type": str,
                    "optional": True,
                    "regEx": re.compile("^x"),
                    "skipRegExCheckForEmptyStrings": True,
                }
            }
        )
        expect_valid(spark, ss, "r string", {"r": ""})
        expect_errors(spark, ss, "r string", {"r": "y"}, [("r", "regEx")])

    def test_regex_array_must_match_all(self, spark):
        ss = SimpleSchema(
            {
                "r": {
                    "type": str,
                    "optional": True,
                    "regEx": [re.compile("^a"), re.compile("b$")],
                }
            }
        )
        expect_valid(spark, ss, "r string", {"r": "ab"})
        expect_errors(spark, ss, "r string", {"r": "ax"}, [("r", "regEx")])
        expect_errors(spark, ss, "r string", {"r": "xb"}, [("r", "regEx")])

    def test_case_insensitive_regex(self, spark):
        ss = SimpleSchema(
            {"r": {"type": str, "optional": True, "regEx": re.compile("^abc$", re.I)}}
        )
        expect_valid(spark, ss, "r string", {"r": "ABC"})

    def test_wrong_type_column(self, spark):
        ss = SimpleSchema({"s": {"type": str, "optional": True}})
        vs = run_validation(spark, ss, "s boolean", [{"s": True}])[0]
        assert [(v["name"], v["type"], v["dataType"]) for v in vs] == [
            ("s", "expectedType", "String")
        ]

    def test_max_checked_before_min_regex(self, spark):
        # checkStringValue order: max, min, regex — one error per key
        ss = SimpleSchema(
            {"s": {"type": str, "optional": True, "max": 3, "regEx": re.compile("^z")}}
        )
        vs = run_validation(spark, ss, "s string", [{"s": "aaaa"}])[0]
        assert [v["type"] for v in vs] == ["maxString"]


class TestNumberRules:
    def test_integer_column_passes(self, spark):
        ss = SimpleSchema({"n": {"type": int, "optional": True}})
        expect_valid(spark, ss, "n bigint", {"n": 7})

    def test_integer_accepts_whole_double(self, spark):
        # Number.isInteger(5.0) === true (checkNumberValue.ts:51-53)
        ss = SimpleSchema({"n": {"type": int, "optional": True}})
        expect_valid(spark, ss, "n double", {"n": 5.0})

    def test_integer_rejects_fraction(self, spark):
        ss = SimpleSchema({"n": {"type": int, "optional": True}})
        expect_errors(spark, ss, "n double", {"n": 5.5}, [("n", "noDecimal")])

    def test_nan_rejected(self, spark):
        ss = SimpleSchema({"n": {"type": float, "optional": True}})
        vs = run_validation(spark, ss, "n double", [{"n": math.nan}])[0]
        assert [(v["name"], v["type"], v["dataType"]) for v in vs] == [
            ("n", "expectedType", "Number")
        ]

    def test_min_max(self, spark):
        ss = SimpleSchema(
            {"n": {"type": int, "optional": True, "min": 10, "max": 20}}
        )
        expect_valid(spark, ss, "n bigint", {"n": 10})
        expect_valid(spark, ss, "n bigint", {"n": 20})
        vs = run_validation(spark, ss, "n bigint", [{"n": 9}])[0]
        assert [(v["type"], v["min"]) for v in vs] == [("minNumber", "10")]
        vs = run_validation(spark, ss, "n bigint", [{"n": 21}])[0]
        assert [(v["type"], v["max"]) for v in vs] == [("maxNumber", "20")]

    def test_exclusive_bounds(self, spark):
        ss = SimpleSchema(
            {
                "n": {
                    "type": int,
                    "optional": True,
                    "min": 10,
                    "max": 20,
                    "exclusiveMin": True,
                    "exclusiveMax": True,
                }
            }
        )
        expect_valid(spark, ss, "n bigint", {"n": 11})
        expect_errors(
            spark, ss, "n bigint", {"n": 10}, [("n", "minNumberExclusive")]
        )
        expect_errors(
            spark, ss, "n bigint", {"n": 20}, [("n", "maxNumberExclusive")]
        )

    def test_number_accepts_any_numeric(self, spark):
        ss = SimpleSchema({"n": {"type": float, "optional": True}})
        expect_valid(spark, ss, "n bigint", {"n": 3})
        expect_valid(spark, ss, "n double", {"n": 3.14})

    def test_number_rejects_string_column(self, spark):
        ss = SimpleSchema({"n": {"type": float, "optional": True}})
        expect_errors(spark, ss, "n string", {"n": "3"}, [("n", "expectedType")])


class TestDateRules:
    def test_min_max_date(self, spark):
        # testSchema.ts:160-164 minMaxDate: [2013-01-01, 2013-12-31] UTC
        ss = SimpleSchema(
            {
                "d": {
                    "type": SimpleSchema.Date,
                    "optional": True,
                    "min": datetime.datetime(2013, 1, 1, tzinfo=UTC),
                    "max": datetime.datetime(2013, 12, 31, tzinfo=UTC),
                }
            }
        )
        ddl = "d timestamp"
        expect_valid(spark, ss, ddl, {"d": datetime.datetime(2013, 6, 1, tzinfo=UTC)})
        vs = run_validation(
            spark, ss, ddl, [{"d": datetime.datetime(2012, 12, 31, tzinfo=UTC)}]
        )[0]
        assert [(v["type"], v["min"]) for v in vs] == [("minDate", "2013-01-01")]
        vs = run_validation(
            spark, ss, ddl, [{"d": datetime.datetime(2014, 1, 1, tzinfo=UTC)}]
        )[0]
        assert [(v["type"], v["max"]) for v in vs] == [("maxDate", "2013-12-31")]

    def test_wrong_type(self, spark):
        ss = SimpleSchema({"d": {"type": SimpleSchema.Date, "optional": True}})
        expect_errors(spark, ss, "d string", {"d": "2013-01-01"}, [("d", "expectedType")])


class TestAllowedValues:
    def test_allowed(self, spark):
        ss = SimpleSchema(
            {"a": {"type": str, "optional": True, "allowedValues": ["tuna", "fish", "salad"]}}
        )
        expect_valid(spark, ss, "a string", {"a": "tuna"})
        vs = run_validation(spark, ss, "a string", [{"a": "pizza"}])[0]
        assert [(v["type"], v["value"]) for v in vs] == [("notAllowed", "pizza")]

    def test_set_valued_allowed_values(self, spark):
        # Set behaves like array (test/SimpleSchema_allowedValues.tests.ts:20-48)
        ss = SimpleSchema(
            {"a": {"type": str, "optional": True, "allowedValues": {"a", "b"}}}
        )
        expect_valid(spark, ss, "a string", {"a": "a"})
        expect_errors(spark, ss, "a string", {"a": "z"}, [("a", "notAllowed")])

    def test_numeric_allowed_values(self, spark):
        ss = SimpleSchema(
            {"n": {"type": int, "optional": True, "allowedValues": [1, 2, 3]}}
        )
        expect_valid(spark, ss, "n bigint", {"n": 2})
        expect_errors(spark, ss, "n bigint", {"n": 9}, [("n", "notAllowed")])


class TestArrayRules:
    def test_min_max_count(self, spark):
        ss = SimpleSchema(
            {
                "arr": {"type": SimpleSchema.Array, "optional": True, "minCount": 1, "maxCount": 2},
                "arr.$": {"type": str},
            }
        )
        ddl = "arr array<string>"
        expect_valid(spark, ss, ddl, {"arr": ["a"]})
        vs = run_validation(spark, ss, ddl, [{"arr": []}])[0]
        assert [(v["name"], v["type"], v["minCount"]) for v in vs] == [
            ("arr", "minCount", "1")
        ]
        vs = run_validation(spark, ss, ddl, [{"arr": ["a", "b", "c"]}])[0]
        # maxCount overflow is ONE error on the array key
        # (test/SimpleSchema_max.tests.ts:27-30)
        assert [(v["name"], v["type"]) for v in vs] == [("arr", "maxCount")]

    def test_item_rules_per_index(self, spark):
        # ['short','short'] with item min ⇒ 2 errors named key.0, key.1
        # (test/SimpleSchema_min.tests.ts:203-213)
        ss = SimpleSchema(
            {
                "minMaxStringArray": {
                    "type": SimpleSchema.Array,
                    "optional": True,
                    "minCount": 1,
                    "maxCount": 2,
                },
                "minMaxStringArray.$": {"type": str, "min": 10, "max": 20},
            }
        )
        ddl = "minMaxStringArray array<string>"
        expect_valid(spark, ss, ddl, {"minMaxStringArray": ["longenough"]})
        expect_errors(
            spark,
            ss,
            ddl,
            {"minMaxStringArray": ["short", "short"]},
            [("minMaxStringArray.0", "minString"), ("minMaxStringArray.1", "minString")],
        )

    def test_item_allowed_values(self, spark):
        ss = SimpleSchema(
            {
                "a": {"type": SimpleSchema.Array, "optional": True},
                "a.$": {"type": str, "allowedValues": ["x", "y"]},
            }
        )
        expect_errors(
            spark, ss, "a array<string>", {"a": ["x", "z"]}, [("a.1", "notAllowed")]
        )


class TestOneOf:
    def test_props_per_alternative(self, spark):
        # oneOf({Integer,min:5},{Integer,min:10}) accepts 7
        # (test/SimpleSchema_oneOf.tests.ts:619-633)
        ss = SimpleSchema(
            {
                "n": {
                    "type": oneOf({"type": int, "min": 5}, {"type": int, "min": 10}),
                    "optional": True,
                }
            }
        )
        expect_valid(spark, ss, "n bigint", {"n": 7})
        expect_valid(spark, ss, "n bigint", {"n": 12})
        # errors reported from the LAST tried type (validateField.ts:253-255)
        vs = run_validation(spark, ss, "n bigint", [{"n": 3}])[0]
        assert [(v["type"], v["min"]) for v in vs] == [("minNumber", "10")]

    def test_any_short_circuits(self, spark):
        ss = SimpleSchema(
            {"x": {"type": oneOf(str, SimpleSchema.Any), "optional": True}}
        )
        expect_valid(spark, ss, "x bigint", {"x": 5})


class TestBlackboxAndAny:
    def test_blackbox_object_content_passes(self, spark):
        ss = SimpleSchema(
            {"bb": {"type": dict, "optional": True, "blackbox": True}}
        )
        expect_valid(
            spark, ss, "bb struct<anything:string, other:bigint>",
            {"bb": {"anything": "goes", "other": 1}},
        )

    def test_any_passes_everything(self, spark):
        ss = SimpleSchema({"x": {"type": SimpleSchema.Any, "optional": True}})
        expect_valid(spark, ss, "x string", {"x": "str"})
        expect_valid(spark, ss, "x double", {"x": 1.5})

    def test_binary_column(self, spark):
        # Uint8Array analog: binary validates by type, never traversed
        # (test/SimpleSchema_type.tests.ts:13-23)
        ss = SimpleSchema({"b": {"type": SimpleSchema.Binary, "optional": True}})
        expect_valid(spark, ss, "b binary", {"b": bytearray(b"\x01\x02")})
        vs = run_validation(spark, ss, "b string", [{"b": "nope"}])[0]
        assert [(v["type"], v["dataType"]) for v in vs] == [
            ("expectedType", "Uint8Array")
        ]


class TestCustomValidators:
    def test_spark_rule_custom(self, spark):
        @spark_rule
        def must_contain_at(value, ctx):
            from pyspark.sql import functions as F

            return F.when(~value.contains("@"), F.lit("invalidEmail"))

        ss = SimpleSchema(
            {"email": {"type": str, "optional": True, "custom": must_contain_at}}
        )
        expect_valid(spark, ss, "email string", {"email": "a@b.c"})
        expect_errors(
            spark, ss, "email string", {"email": "nope"}, [("email", "invalidEmail")]
        )

    def test_python_custom_via_pandas_udf(self, spark):
        def check(value):
            if value is not None and "@" not in value:
                return "invalidEmail"
            return None

        ss = SimpleSchema(
            {"email": {"type": str, "optional": True, "custom": check}}
        )
        expect_valid(spark, ss, "email string", {"email": "a@b.c"})
        expect_errors(
            spark, ss, "email string", {"email": "nope"}, [("email", "invalidEmail")]
        )

    def test_custom_message_rendering(self, spark):
        ss = SimpleSchema(
            {"email": {"type": str, "optional": True}},
            get_error_message=lambda e, label: (
                f"{label} is not a valid email address"
                if e["type"] == "invalidEmail"
                else None
            ),
        )
        msg = ss.message_for_error({"name": "email", "type": "invalidEmail"})
        assert msg == "Email is not a valid email address"


class TestKeyNotInSchema:
    def test_extra_column_flagged(self, spark):
        ss = SimpleSchema({"a": {"type": str, "optional": True}})
        vs = run_validation(
            spark, ss, "a string, admin boolean", [{"a": "x", "admin": True}]
        )[0]
        assert [(v["name"], v["type"]) for v in vs] == [("admin", "keyNotInSchema")]

    def test_extra_column_policy_ignore(self, spark):
        ss = SimpleSchema({"a": {"type": str, "optional": True}})
        vs = run_validation(
            spark, ss, "a string, admin boolean", [{"a": "x", "admin": True}],
            extra_key_policy="ignore",
        )[0]
        assert vs == []

    def test_extra_column_policy_error(self, spark):
        ss = SimpleSchema({"a": {"type": str, "optional": True}})
        with pytest.raises(Exception):
            run_validation(
                spark, ss, "a string, admin boolean", [{"a": "x", "admin": True}],
                extra_key_policy="error",
            )


class TestOptions:
    def test_ignore_filters_types(self, spark):
        ss = SimpleSchema({"a": str, "b": {"type": str, "optional": True, "min": 5}})
        vs = run_validation(
            spark, ss, "a string, b string", [{"b": "x"}], ignore=["required"]
        )[0]
        assert [(v["name"], v["type"]) for v in vs] == [("b", "minString")]

    def test_keys_subset(self, spark):
        ss = SimpleSchema({"a": str, "b": str})
        vs = run_validation(spark, ss, "a string, b string", [{}], keys=["a"])[0]
        assert [(v["name"], v["type"]) for v in vs] == [("a", "required")]
