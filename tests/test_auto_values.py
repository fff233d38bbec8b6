"""autoValue / defaultValue completion (round 2).

Representative cases ported from the reference's
test/clean/autoValue.tests.ts (1,058 lines) and
test/clean/defaultValue.tests.ts (846 lines) — semantics, not code:
opaque Python autoValues (pandas-UDF fallback) with the AutoValueRunner
context (value/isSet/field/siblingField/unset, return-undefined=no-change),
array-position write-back, parents-first ordering, and the upsert
$setOnInsert emission (SimpleSchema.ts:1148-1167).
"""

import json

import pytest

from pyspark.sql import functions as F

from simpl_schema_spark.cleaning import clean, spark_auto_value
from simpl_schema_spark.schema import SimpleSchema


def _one(df):
    return df.collect()[0].asDict(recursive=True)


class TestPythonAutoValue:
    def test_transform_value(self, spark):
        def upper(ctx):
            return ctx.value.upper() if ctx.is_set else ctx.UNCHANGED

        ss = SimpleSchema({"s": {"type": str, "autoValue": upper}})
        df = spark.createDataFrame([("hi",)], "s string")
        assert _one(clean(df, ss))["s"] == "HI"

    def test_runs_when_unset(self, spark):
        # autoValue fns run on unset keys too (isSet=false) — the
        # createdAt pattern (autoValue.tests.ts 'content' cases)
        def fill(ctx):
            if not ctx.is_set:
                return "filled"

        ss = SimpleSchema({"s": {"type": str, "optional": True, "autoValue": fill}})
        df = spark.createDataFrame([(None,)], "s string")
        assert _one(clean(df, ss))["s"] == "filled"

    def test_return_unchanged_means_unchanged(self, spark):
        # None now SETS null (reference parity); UNCHANGED is the no-op
        def noop(ctx):
            return ctx.UNCHANGED

        ss = SimpleSchema({"s": {"type": str, "autoValue": noop}})
        df = spark.createDataFrame([("keep",)], "s string")
        assert _one(clean(df, ss))["s"] == "keep"

    def test_unset_removes_value(self, spark):
        def strip(ctx):
            if ctx.value == "secret":
                ctx.unset()
            return ctx.UNCHANGED

        ss = SimpleSchema({"s": {"type": str, "optional": True, "autoValue": strip}})
        df = spark.createDataFrame([("secret",), ("ok",)], "s string")
        got = {r.s for r in clean(df, ss).collect()}
        assert got == {None, "ok"}

    def test_field_access(self, spark):
        # this.field() — cross-field derivation (autoValue.tests.ts context)
        def derive(ctx):
            first = ctx.field("first") or ""
            last = ctx.field("last") or ""
            return f"{first} {last}".strip()

        ss = SimpleSchema(
            {
                "first": str,
                "last": str,
                "full": {"type": str, "optional": True, "autoValue": derive},
            }
        )
        df = spark.createDataFrame([("Ada", "Lovelace", None)],
                                   "first string, last string, full string")
        assert _one(clean(df, ss))["full"] == "Ada Lovelace"

    def test_sibling_field_nested(self, spark):
        def double_sib(ctx):
            n = ctx.sibling_field("n")
            return (n or 0) * 2

        ss = SimpleSchema(
            {
                "o": {"type": dict},
                "o.n": int,
                "o.twice": {"type": int, "optional": True, "autoValue": double_sib},
            }
        )
        df = spark.createDataFrame([((5, None),)], "o struct<n bigint, twice bigint>")
        assert _one(clean(df, ss))["o"]["twice"] == 10

    def test_declared_context_fields(self, spark):
        def use_flag(ctx):
            return "yes" if ctx.field("flag") else "no"

        use_flag.context_fields = ["flag"]
        ss = SimpleSchema(
            {
                "flag": bool,
                "s": {"type": str, "optional": True, "autoValue": use_flag},
                "big": {"type": str, "optional": True},
            }
        )
        df = spark.createDataFrame([(True, None, "x" * 10)],
                                   "flag boolean, s string, big string")
        assert _one(clean(df, ss))["s"] == "yes"

    def test_parents_first_ordering(self, spark):
        # a child autoValue sees the result of a parent-level autoValue
        # (setAutoValues.ts:15-36 sort)
        def set_parent_n(ctx):
            return 7

        def child_from_parent(ctx):
            return (ctx.field("o.n") or 0) + 1

        ss = SimpleSchema(
            {
                "o": {"type": dict},
                "o.n": {"type": int, "optional": True, "autoValue": set_parent_n},
                "o.m": {"type": int, "optional": True,
                        "autoValue": child_from_parent},
            }
        )
        df = spark.createDataFrame([((None, None),)], "o struct<n bigint, m bigint>")
        got = _one(clean(df, ss))["o"]
        assert got == {"n": 7, "m": 8}


class TestArrayPositionAutoValue:
    def test_scalar_items(self, spark):
        @spark_auto_value
        def upper(ctx):
            return F.upper(ctx.value)

        ss = SimpleSchema(
            {
                "tags": {"type": SimpleSchema.Array, "optional": True},
                "tags.$": {"type": str, "autoValue": upper},
            }
        )
        df = spark.createDataFrame([(["a", "b"],)], "tags array<string>")
        assert _one(clean(df, ss))["tags"] == ["A", "B"]

    def test_struct_item_field(self, spark):
        @spark_auto_value
        def stamp(ctx):
            return F.coalesce(ctx.value, F.lit("stamped"))

        ss = SimpleSchema(
            {
                "items": {"type": SimpleSchema.Array, "optional": True},
                "items.$": {"type": dict},
                "items.$.name": str,
                "items.$.note": {"type": str, "optional": True, "autoValue": stamp},
            }
        )
        df = spark.createDataFrame(
            [([("a", None), ("b", "kept")],)],
            "items array<struct<name string, note string>>",
        )
        got = _one(clean(df, ss))["items"]
        assert got == [
            {"name": "a", "note": "stamped"},
            {"name": "b", "note": "kept"},
        ]

    def test_default_value_fills_array_items(self, spark):
        ss = SimpleSchema(
            {
                "items": {"type": SimpleSchema.Array, "optional": True},
                "items.$": {"type": dict},
                "items.$.state": {"type": str, "defaultValue": "new"},
            }
        )
        df = spark.createDataFrame(
            [([("old",), (None,)],)], "items array<struct<state string>>"
        )
        got = _one(clean(df, ss))["items"]
        assert got == [{"state": "old"}, {"state": "new"}]

    def test_null_array_untouched(self, spark):
        @spark_auto_value
        def upper(ctx):
            return F.upper(ctx.value)

        ss = SimpleSchema(
            {
                "tags": {"type": SimpleSchema.Array, "optional": True},
                "tags.$": {"type": str, "autoValue": upper},
            }
        )
        df = spark.createDataFrame([(None,)], "tags array<string>")
        assert _one(clean(df, ss))["tags"] is None

    def test_python_fn_on_array_item_now_supported(self, spark):
        # was NotImplementedError through round 2; now the whole-array
        # Arrow rebuild path (see TestNestedArrayAutoValues) handles it
        def bang(ctx):
            return (ctx.value or "") + "!"

        ss = SimpleSchema(
            {
                "tags": {"type": SimpleSchema.Array, "optional": True},
                "tags.$": {"type": str, "autoValue": bang},
            }
        )
        df = spark.createDataFrame([(["a"],)], "tags array<string>")
        assert list(clean(df, ss).collect()[0].tags) == ["a!"]


class TestDefaultValueDocMode:
    def test_applied_when_unset_not_when_set(self, spark):
        ss = SimpleSchema({"s": {"type": str, "defaultValue": "d"}})
        df = spark.createDataFrame([(None,), ("x",)], "s string")
        assert {r.s for r in clean(df, ss).collect()} == {"d", "x"}

    def test_false_and_zero_are_set(self, spark):
        # falsy-but-present values are NOT replaced (defaultValue.tests.ts)
        ss = SimpleSchema(
            {
                "b": {"type": bool, "defaultValue": True},
                "n": {"type": int, "defaultValue": 5},
            }
        )
        df = spark.createDataFrame([(False, 0)], "b boolean, n bigint")
        got = _one(clean(df, ss))
        assert got == {"b": False, "n": 0}

    def test_nested_default_requires_parent(self, spark):
        ss = SimpleSchema(
            {
                "o": {"type": dict, "optional": True},
                "o.s": {"type": str, "defaultValue": "d"},
            }
        )
        df = spark.createDataFrame([((None,),), (None,)], "o struct<s string>")
        got = sorted(
            (r.asDict(recursive=True)["o"] or {}).get("s", "ABSENT")
            for r in clean(df, ss).collect()
        )
        # parent present → filled; parent absent → stays absent
        assert got == ["ABSENT", "d"]


class TestDefaultValueUpsert:
    MOD_DDL = "doc_id bigint, op string, key_path string, value string, upsert boolean"

    def _schema(self):
        return SimpleSchema(
            {
                "name": str,
                "state": {"type": str, "defaultValue": "new"},
                "rank": {"type": int, "defaultValue": 1, "optional": True},
            }
        )

    def _clean(self, spark, rows, **opts):
        from simpl_schema_spark.modifiers import clean_modifier_table

        df = spark.createDataFrame(rows, self.MOD_DDL)
        out = clean_modifier_table(df, self._schema(), **opts)
        return sorted((r.doc_id, r.op, r.key_path, r.value) for r in out.collect())

    def test_set_on_insert_emitted_for_upsert(self, spark):
        got = self._clean(spark, [(1, "$set", "name", '"x"', True)])
        assert got == [
            (1, "$set", "name", '"x"'),
            (1, "$setOnInsert", "rank", "1"),
            (1, "$setOnInsert", "state", '"new"'),
        ]

    def test_not_emitted_for_non_upsert(self, spark):
        got = self._clean(spark, [(1, "$set", "name", '"x"', False)])
        assert got == [(1, "$set", "name", '"x"')]

    def test_not_emitted_when_key_referenced(self, spark):
        # key referenced under ANY op is isSet → no default injection
        got = self._clean(
            spark,
            [
                (1, "$set", "name", '"x"', True),
                (1, "$set", "state", '"done"', True),
            ],
        )
        assert got == [
            (1, "$set", "name", '"x"'),
            (1, "$set", "state", '"done"'),
            (1, "$setOnInsert", "rank", "1"),
        ]

    def test_off_switch(self, spark):
        got = self._clean(
            spark, [(1, "$set", "name", '"x"', True)], get_auto_values=False
        )
        assert got == [(1, "$set", "name", '"x"')]

    def test_roundtrip_validates(self, spark):
        from simpl_schema_spark.modifiers import (
            clean_modifier_table,
            validate_modifier_table,
        )

        df = spark.createDataFrame(
            [(1, "$set", "name", '"x"', True)], self.MOD_DDL
        )
        cleaned = clean_modifier_table(df, self._schema())
        # after default injection the upsert has every required key
        assert validate_modifier_table(cleaned, self._schema()).collect() == []


class TestModifierAutoValues:
    """autoValue fns over modifier tables, incl. pseudo-modifier returns
    (reference AutoValueRunner.ts:112-142; test/clean/autoValue.tests.ts
    'content updateCount' cases)."""

    def _schema(self):
        from simpl_schema_spark.schema import SimpleSchema

        def update_count(ctx):
            if ctx.operator is None:
                return 0
            return {"$inc": 1}

        def first_word(ctx):
            content = ctx.field("content")
            if content is not None:
                return content.split(" ")[0]
            ctx.unset()
            return ctx.UNCHANGED

        return SimpleSchema(
            {
                "content": {"type": str, "optional": True},
                "name": {"type": str},
                "updateCount": {"type": int, "autoValue": update_count},
                "firstWord": {"type": str, "optional": True,
                              "autoValue": first_word},
            }
        )

    def _clean(self, spark, rows):
        from simpl_schema_spark.modifiers import clean_modifier_table

        df = spark.createDataFrame(
            rows, "doc_id bigint, op string, key_path string, value string, upsert boolean"
        )
        out = clean_modifier_table(df, self._schema())
        return sorted(
            (r.doc_id, r.op, r.key_path, r.value) for r in out.collect()
        )

    def test_pseudo_modifier_inc(self, spark):
        got = self._clean(spark, [(1, "$set", "name", '"Test"', False)])
        assert (1, "$inc", "updateCount", "1") in got
        # name row untouched
        assert (1, "$set", "name", '"Test"') in got

    def test_pseudo_modifier_replaces_existing_entry(self, spark):
        got = self._clean(
            spark,
            [(1, "$set", "name", '"Test"', False),
             (1, "$set", "updateCount", "99", False)],
        )
        assert (1, "$inc", "updateCount", "1") in got
        assert (1, "$set", "updateCount", "99") not in got

    def test_plain_return_sets_from_cross_field(self, spark):
        got = self._clean(
            spark,
            [(1, "$set", "name", '"Test"', False),
             (1, "$set", "content", '"hello world"', False)],
        )
        assert (1, "$set", "firstWord", '"hello"') in got

    def test_unset_removes_manual_value(self, spark):
        got = self._clean(
            spark,
            [(1, "$set", "name", '"Test"', False),
             (1, "$set", "firstWord", '"manual"', False)],
        )
        assert not any(k == "firstWord" for (_, _, k, _) in got)


class TestAutoValueNullContract:
    def test_return_none_sets_null(self, spark):
        # reference `return null` sets null (AutoValueRunner.ts:146);
        # UNCHANGED is the explicit no-op sentinel
        from simpl_schema_spark.cleaning import clean
        from simpl_schema_spark.schema import SimpleSchema

        def nullify(ctx):
            if ctx.value == "kill":
                return None
            return ctx.UNCHANGED

        ss = SimpleSchema(
            {"s": {"type": str, "optional": True, "autoValue": nullify}}
        )
        df = spark.createDataFrame([("kill",), ("ok",)], "s string")
        vals = sorted(
            (r.s is None, r.s) for r in clean(df, ss).collect()
        )
        assert vals == [(False, "ok"), (True, None)]


class TestNestedArrayAutoValues:
    """autoValue under one and two nested array levels — Python fns rebuild
    the whole outer array in one Arrow UDF; @spark_auto_value fns compile to
    nested F.transform (getPositionsForAutoValue.ts:43-148 parity)."""

    def test_python_fn_on_item_key(self, spark):
        from simpl_schema_spark.cleaning import clean
        from simpl_schema_spark.schema import SimpleSchema

        def upper(ctx):
            if ctx.value is None:
                return ctx.UNCHANGED
            return ctx.value.upper()

        ss = SimpleSchema(
            {
                "tags": {"type": SimpleSchema.Array, "optional": True},
                "tags.$": {"type": str, "autoValue": upper},
            }
        )
        df = spark.createDataFrame([(["a", "b"],), (None,)], "tags array<string>")
        rows = sorted(str(r.tags) for r in clean(df, ss).collect())
        assert rows == ["None", "['A', 'B']"]

    def test_python_fn_on_struct_item_field(self, spark):
        from simpl_schema_spark.cleaning import clean
        from simpl_schema_spark.schema import SimpleSchema

        def title(ctx):
            if ctx.value is None:
                return ctx.UNCHANGED
            return ctx.value.title()

        ss = SimpleSchema(
            {
                "friends": {"type": SimpleSchema.Array, "optional": True},
                "friends.$": {"type": dict},
                "friends.$.name": {"type": str, "autoValue": title},
            }
        )
        df = spark.createDataFrame(
            [([{"name": "ada lovelace"}, {"name": "bob"}],)],
            "friends array<struct<name string>>",
        )
        out = clean(df, ss).collect()[0].friends
        assert [f.name for f in out] == ["Ada Lovelace", "Bob"]

    def test_python_fn_doubly_nested(self, spark):
        from simpl_schema_spark.cleaning import clean
        from simpl_schema_spark.schema import SimpleSchema

        def clamp(ctx):
            if ctx.value is not None and ctx.value > 10:
                return 10
            return ctx.UNCHANGED

        ss = SimpleSchema(
            {
                "teams": {"type": SimpleSchema.Array, "optional": True},
                "teams.$": {"type": dict},
                "teams.$.scores": {"type": SimpleSchema.Array},
                "teams.$.scores.$": {"type": int, "autoValue": clamp},
            }
        )
        df = spark.createDataFrame(
            [([{"scores": [5, 99]}, {"scores": [12]}],)],
            "teams array<struct<scores array<bigint>>>",
        )
        out = clean(df, ss).collect()[0].teams
        assert [list(t.scores) for t in out] == [[5, 10], [10]]

    def test_spark_auto_value_doubly_nested(self, spark):
        from pyspark.sql import functions as F
        from simpl_schema_spark.cleaning import clean, spark_auto_value
        from simpl_schema_spark.schema import SimpleSchema

        @spark_auto_value
        def double_it(ctx):
            return ctx.value * 2

        ss = SimpleSchema(
            {
                "grid": {"type": SimpleSchema.Array, "optional": True},
                "grid.$": {"type": SimpleSchema.Array},
                "grid.$.$": {"type": int, "autoValue": double_it},
            }
        )
        df = spark.createDataFrame(
            [([[1, 2], [3]],)], "grid array<array<bigint>>"
        )
        out = clean(df, ss).collect()[0].grid
        assert [list(g) for g in out] == [[2, 4], [6]]

    def test_python_fn_null_struct_element_left_null(self, spark):
        # regression: arrays with NULL struct elements must not crash the
        # Arrow rebuild; null elements stay null like the expression path
        from simpl_schema_spark.cleaning import clean
        from simpl_schema_spark.schema import SimpleSchema

        def title(ctx):
            if ctx.value is None:
                return "Anon"
            return ctx.value.title()

        ss = SimpleSchema(
            {
                "friends": {"type": SimpleSchema.Array, "optional": True},
                "friends.$": {"type": dict},
                "friends.$.name": {"type": str, "autoValue": title},
            }
        )
        df = spark.createDataFrame(
            [([None, {"name": "bob"}],)],
            "friends array<struct<name string>>",
        )
        out = clean(df, ss).collect()[0].friends
        assert out[0] is None and out[1].name == "Bob"
