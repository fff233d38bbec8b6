"""Dynamic JSON document mode (validateField.ts:262-279 per-row key scan)."""

import pytest

from simpl_schema_spark.jsondoc import validate_json_column
from simpl_schema_spark.schema import SimpleSchema


def run(spark, rows, ss):
    df = spark.createDataFrame([(i, r) for i, r in enumerate(rows)],
                               "doc_id bigint, json_blob string")
    out = validate_json_column(df, ss)
    return sorted((r.doc_id, r.name, r.type) for r in out.collect())


def schema():
    return SimpleSchema(
        {
            "name": {"type": str, "min": 2},
            "age": {"type": int, "min": 0, "max": 130, "optional": True},
            "lang": {"type": str, "optional": True, "allowedValues": ["en", "de"]},
            "meta": {"type": dict, "optional": True},
            "meta.k": {"type": str, "optional": True},
            "bag": {"type": dict, "optional": True, "blackbox": True},
            "tags": {"type": SimpleSchema.Array, "optional": True, "maxCount": 2},
            "tags.$": str,
        }
    )


class TestJsonDocMode:
    def test_valid_doc(self, spark):
        assert run(spark, ['{"name": "ok", "age": 4}'], schema()) == []

    def test_required_missing_and_null(self, spark):
        got = run(spark, ['{"age": 4}', '{"name": null}'], schema())
        assert got == [(0, "name", "required"), (1, "name", "required")]

    def test_type_mismatch(self, spark):
        got = run(spark, ['{"name": 5}'], schema())
        assert got == [(0, "name", "expectedType")]

    def test_value_rules(self, spark):
        got = run(
            spark,
            ['{"name": "x"}', '{"name": "ok", "age": 999}',
             '{"name": "ok", "lang": "xx"}'],
            schema(),
        )
        assert got == [
            (0, "name", "minString"),
            (1, "age", "maxNumber"),
            (2, "lang", "notAllowed"),
        ]

    def test_unknown_key_per_row(self, spark):
        got = run(spark, ['{"name": "ok", "zzz": 1}'], schema())
        assert got == [(0, "zzz", "keyNotInSchema")]

    def test_unknown_nested_key(self, spark):
        got = run(spark, ['{"name": "ok", "meta": {"k": "v", "bad": 1}}'], schema())
        assert got == [(0, "meta.bad", "keyNotInSchema")]

    def test_blackbox_subtree_free(self, spark):
        assert run(
            spark, ['{"name": "ok", "bag": {"anything": [1, {"x": 2}]}}'], schema()
        ) == []

    def test_array_count(self, spark):
        got = run(spark, ['{"name": "ok", "tags": ["a","b","c"]}'], schema())
        assert got == [(0, "tags", "maxCount")]

    def test_heterogeneous_batch(self, spark):
        # the motivating case: one column, rows with different shapes
        got = run(
            spark,
            ['{"name": "ok"}',
             '{"name": "ok", "extra": true, "age": "nan"}'],
            schema(),
        )
        assert got == [
            (1, "age", "expectedType"),
            (1, "extra", "keyNotInSchema"),
        ]

    def test_array_item_checks(self, spark):
        # per-element item checks with concrete-index names
        got = run(
            spark,
            ['{"name": "ok", "tags": ["fine", 5]}',
             '{"name": "ok", "tags": ["a", "b"]}'],
            schema(),
        )
        assert got == [(0, "tags.1", "expectedType")]

    def test_array_item_and_count_together(self, spark):
        got = run(
            spark, ['{"name": "ok", "tags": [1, "a", "b"]}'], schema()
        )
        assert got == [(0, "tags", "maxCount"), (0, "tags.0", "expectedType")]


class TestJsonRobustness:
    def test_malformed_json_single_violation(self, spark):
        # truncated / invalid JSON must not kill the job (try_parse_json):
        # exactly one malformedJson row, no spurious required cascade
        got = run(
            spark,
            ['{"name": "ok"', 'not json at all', '{"name": "ok"}'],
            schema(),
        )
        assert got == [
            (0, "$", "malformedJson"),
            (1, "$", "malformedJson"),
        ]

    def test_callable_optional_evaluated(self, spark):
        # callable optional follows the fixed-column compiler: bool(optional())
        ss = SimpleSchema(
            {
                "a": {"type": str, "optional": lambda: True},
                "b": {"type": str, "optional": lambda: False},
            }
        )
        got = run(spark, ["{}"], ss)
        assert got == [(0, "b", "required")]
