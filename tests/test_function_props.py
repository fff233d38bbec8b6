"""Function-valued definition props (reference SimpleSchema.ts:55-67,
397-421): allowedValues/min/max/optional/label etc. may be callables,
resolved with a context at definition-resolution (our compile) time."""

from simpl_schema_spark.schema import SimpleSchema


class TestFunctionProps:
    def test_min_max_as_functions(self):
        ss = SimpleSchema(
            {"n": {"type": int, "min": lambda ctx: 5, "max": lambda ctx: 10}}
        )
        alt = ss.resolved_alternatives("n")[0]
        assert alt["min"] == 5 and alt["max"] == 10

    def test_optional_as_function(self):
        ss = SimpleSchema({"k": {"type": str, "optional": lambda ctx: True}})
        d = ss.get_definition("k")
        assert d["optional"] is True

    def test_required_function_inverted_to_optional(self):
        ss = SimpleSchema({"k": {"type": str, "required": lambda: False}})
        d = ss.get_definition("k")
        assert d["optional"] is True

    def test_allowed_values_as_function(self):
        ss = SimpleSchema(
            {"k": {"type": str, "allowedValues": lambda ctx: ["a", "b"]}}
        )
        alt = ss.resolved_alternatives("k")[0]
        assert alt["allowedValues"] == ["a", "b"]

    def test_label_as_function(self):
        ss = SimpleSchema({"k": {"type": str, "label": lambda: "Dyn"}})
        assert ss.label("k") == "Dyn"

    def test_context_exposes_key(self):
        seen = {}

        def min_fn(ctx):
            seen["key"] = ctx.key
            return 1

        ss = SimpleSchema({"k": {"type": int, "min": min_fn, "optional": True}})
        ss.resolved_alternatives("k")
        assert seen["key"] == "k"
