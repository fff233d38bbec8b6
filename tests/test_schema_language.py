"""Schema-language parity tests (pure Python, no Spark).

Assertions mirror the reference suite:
- expandShorthand: /root/reference/test/expandShorthand.tests.ts
- labels/humanize: /root/reference/test/humanize.tests.ts
- extend/pick/omit: /root/reference/test/SimpleSchema_extend.tests.ts etc.
"""

import re

import pytest

from simpl_schema_spark.schema import (
    SchemaValidationError,
    SimpleSchema,
    expand_shorthand,
    humanize,
    make_key_generic,
    oneOf,
)
from simpl_schema_spark.schema.types import (
    ArrayType,
    Boolean,
    DateType,
    Integer,
    Number,
    String,
)


class TestShorthand:
    def test_bare_type(self):
        out = expand_shorthand({"name": str})
        assert out == {"name": {"type": str}}

    def test_regex(self):
        rx = re.compile(r"^[a-f0-9]+$")
        out = expand_shorthand({"id": rx})
        assert out == {"id": {"type": String, "regEx": rx}}

    def test_array_of_type(self):
        out = expand_shorthand({"tags": [str]})
        assert out["tags"] == {"type": ArrayType}
        assert out["tags.$"] == {"type": str}

    def test_array_of_regex(self):
        rx = re.compile("^a")
        out = expand_shorthand({"tags": [rx]})
        assert out["tags.$"] == {"type": String, "regEx": rx}

    def test_nested_array_shorthand_throws(self):
        with pytest.raises(SchemaValidationError):
            expand_shorthand({"tags": [[str]]})

    def test_array_shorthand_conflict_throws(self):
        with pytest.raises(SchemaValidationError):
            expand_shorthand({"tags": [str], "tags.$": {"type": str}})

    def test_longhand_passthrough_is_cloned(self):
        d = {"type": String, "max": 5}
        out = expand_shorthand({"k": d})
        assert out["k"] == d and out["k"] is not d


class TestHumanize:
    # cases from reference test/humanize.tests.ts / string-humanize
    @pytest.mark.parametrize(
        "given,expected",
        [
            ("super_snake_case", "Super snake case"),
            ("capitalizedCamelCase", "Capitalized camel case"),
            ("hyphen-case", "Hyphen case"),
            ("no-extensions-here.md", "No extensions here"),
            ("lower cased phrase", "Lower cased phrase"),
            ("  so   many  spaces  ", "So many spaces"),
            (123, "123"),
            ("", ""),
            (None, ""),
            ("item_id", "Item ID"),
        ],
    )
    def test_humanize(self, given, expected):
        assert humanize(given) == expected


class TestConstruction:
    def test_required_by_default(self):
        ss = SimpleSchema({"name": str})
        assert ss.get_definition_raw("name")["optional"] is False

    def test_required_inverted_and_deleted(self):
        ss = SimpleSchema({"name": {"type": str, "required": False}})
        d = ss.get_definition_raw("name")
        assert d["optional"] is True and "required" not in d

    def test_array_item_forced_optional(self):
        ss = SimpleSchema({"tags": [str]})
        assert ss.get_definition_raw("tags.$")["optional"] is True

    def test_label_inflected(self):
        ss = SimpleSchema({"firstName": str})
        assert ss.label("firstName") == "First name"

    def test_label_for_array_item_uses_parent_segment(self):
        ss = SimpleSchema({"friendNames": [str]})
        assert ss.label("friendNames.$") == "Friend names"

    def test_explicit_label_wins(self):
        ss = SimpleSchema({"a": {"type": str, "label": "Custom"}})
        assert ss.label("a") == "Custom"

    def test_missing_array_item_def_throws(self):
        with pytest.raises(SchemaValidationError):
            SimpleSchema({"tags": {"type": ArrayType}})

    def test_undeclared_parent_throws(self):
        # "No implied objects!" (reference SimpleSchema.ts:757-767)
        with pytest.raises(SchemaValidationError):
            SimpleSchema({"a.b": str})

    def test_unknown_option_throws(self):
        with pytest.raises(SchemaValidationError):
            SimpleSchema({"a": {"type": str, "banana": 1}})

    def test_missing_type_throws(self):
        with pytest.raises(SchemaValidationError):
            SimpleSchema({"a": {"optional": True}})

    def test_default_value_becomes_auto_value(self):
        ss = SimpleSchema({"a": {"type": str, "defaultValue": "x"}})
        assert ss.default_value("a") == "x"
        avs = dict(ss.auto_value_functions())
        assert "a" in avs

    def test_generic_key_normalization(self):
        assert make_key_generic("a.0.b") == "a.$.b"
        assert make_key_generic("a.$.b") == "a.$.b"

    def test_integer_normalized(self):
        ss = SimpleSchema({"n": int})
        assert ss.get_definition_raw("n")["type"].single_type is Integer

    def test_float_is_number(self):
        ss = SimpleSchema({"n": float})
        assert ss.get_definition_raw("n")["type"].single_type is Number


class TestOneOf:
    def test_requires_two(self):
        with pytest.raises(SchemaValidationError):
            oneOf(str)

    def test_alternatives_keep_own_props(self):
        # oneOf rule props are per-alternative (SURVEY §2.7)
        ss = SimpleSchema(
            {"n": {"type": oneOf({"type": int, "min": 5}, {"type": int, "min": 10})}}
        )
        alts = ss.resolved_alternatives("n")
        assert [a["min"] for a in alts] == [5, 10]

    def test_regex_alternative(self):
        rx = re.compile("^x")
        ss = SimpleSchema({"k": {"type": oneOf(str, rx)}})
        alts = ss.resolved_alternatives("k")
        assert alts[1]["regEx"] is rx and alts[1]["type"] is String


class TestExtendPickOmit:
    def test_extend_merges_min_and_max(self):
        # min and max from different extends both survive
        # (reference test/SimpleSchema_extend.tests.ts:142-183)
        ss = SimpleSchema({"name": {"type": str, "min": 5}})
        ss.extend({"name": {"type": str, "max": 15}})
        alt = ss.resolved_alternatives("name")[0]
        assert alt["min"] == 5 and alt["max"] == 15

    def test_extend_without_type(self):
        ss = SimpleSchema({"name": {"type": str, "min": 5}})
        ss.extend({"name": {"max": 15}})
        alt = ss.resolved_alternatives("name")[0]
        assert alt["type"] is String and alt["max"] == 15

    def test_extend_does_not_mutate_source(self):
        base = SimpleSchema({"name": {"type": str, "min": 5}})
        ext = SimpleSchema({"name": {"type": str, "max": 15}})
        combined = SimpleSchema()
        combined.extend(base)
        combined.extend(ext)
        assert "max" not in base.resolved_alternatives("name")[0]
        assert combined.resolved_alternatives("name")[0]["max"] == 15

    def test_extend_required_override(self):
        ss = SimpleSchema({"name": {"type": str, "optional": True}})
        ss.extend({"name": {"required": True}})
        assert ss.get_definition_raw("name")["optional"] is False

    def test_pick_includes_subtree(self):
        ss = SimpleSchema(
            {"a": {"type": dict}, "a.b": str, "c": str}
        )
        picked = ss.pick("a")
        assert set(picked.schema_keys) == {"a", "a.b"}

    def test_omit_drops_subtree(self):
        ss = SimpleSchema({"a": {"type": dict}, "a.b": str, "c": str})
        omitted = ss.omit("a")
        assert set(omitted.schema_keys) == {"c"}

    def test_clone_independent(self):
        ss = SimpleSchema({"a": str})
        c = ss.clone()
        assert set(c.schema_keys) == {"a"}
        c.extend({"b": str})
        assert "b" not in ss and "b" in c and "a" in c


class TestKeyQueries:
    def _schema(self):
        sub = SimpleSchema({"x": str, "y": {"type": int, "optional": True}})
        return SimpleSchema(
            {
                "top": str,
                "obj": {"type": dict},
                "obj.inner": str,
                "bb": {"type": dict, "blackbox": True},
                "anything": {"type": SimpleSchema.Any},
                "sub": {"type": sub},
                "arr": [str],
            }
        )

    def test_allows_declared(self):
        ss = self._schema()
        assert ss.allows_key("top")
        assert ss.allows_key("obj.inner")
        assert not ss.allows_key("nope")
        assert not ss.allows_key("obj.nope")

    def test_allows_blackbox_descendants(self):
        ss = self._schema()
        assert ss.allows_key("bb.any.thing")
        assert ss.allows_key("anything.foo")

    def test_allows_subschema_keys(self):
        ss = self._schema()
        assert ss.allows_key("sub.x")
        assert not ss.allows_key("sub.zzz")

    def test_allows_concrete_array_index(self):
        ss = self._schema()
        assert ss.allows_key("arr.0")
        assert ss.allows_key("arr.$")

    def test_object_keys(self):
        ss = self._schema()
        assert ss.object_keys() == ["top", "obj", "bb", "anything", "sub", "arr"]
        assert ss.object_keys("obj") == ["inner"]
        assert ss.object_keys("sub") == ["x", "y"]

    def test_key_is_in_blackbox(self):
        ss = self._schema()
        assert ss.key_is_in_blackbox("bb.foo")
        assert ss.key_is_in_blackbox("bb.foo.bar")
        assert not ss.key_is_in_blackbox("bb")
        assert not ss.key_is_in_blackbox("obj.inner")

    def test_get_object_schema(self):
        ss = self._schema()
        obj = ss.get_object_schema("sub")
        assert set(obj.schema_keys) == {"x", "y"}


class TestMessages:
    def test_default_messages(self):
        ss = SimpleSchema({"firstName": str})
        msg = ss.message_for_error({"name": "firstName", "type": "required"})
        assert msg == "First name is required"

    def test_max_string_message(self):
        ss = SimpleSchema({"name": {"type": str, "max": 5}})
        msg = ss.message_for_error(
            {"name": "name", "type": "maxString", "max": 5}
        )
        assert msg == "Name cannot exceed 5 characters"

    def test_schema_level_override(self):
        ss = SimpleSchema(
            {"name": str},
            get_error_message=lambda e, label: "NOPE" if e["type"] == "required" else None,
        )
        assert ss.message_for_error({"name": "name", "type": "required"}) == "NOPE"
        assert (
            ss.message_for_error({"name": "name", "type": "minString", "min": 2})
            == "Name must be at least 2 characters"
        )


class TestQuickType:
    def test_quick_types(self):
        ss = SimpleSchema(
            {
                "s": str,
                "n": float,
                "i": int,
                "b": bool,
                "d": {"type": DateType},
                "tags": [str],
                "o": {"type": dict},
                "o.x": str,
            }
        )
        assert ss.get_quick_type_for_key("s") == "string"
        assert ss.get_quick_type_for_key("n") == "number"
        assert ss.get_quick_type_for_key("i") == "number"
        assert ss.get_quick_type_for_key("b") == "boolean"
        assert ss.get_quick_type_for_key("d") == "date"
        assert ss.get_quick_type_for_key("tags") == "stringArray"
        assert ss.get_quick_type_for_key("o") == "object"
