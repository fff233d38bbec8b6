"""Schema exporters: JSON Schema draft 2020-12 and Spark StructType.

- :func:`to_json_schema` reproduces the reference's ``toJsonSchema``
  (``/root/reference/src/toJsonSchema.ts:55-170``): anyOf for oneOf groups,
  enum/minLength/maxLength/pattern for strings, minimum/maximum (exclusive
  variants) for numbers, date-time strings for dates, positional ``items``
  for arrays, nested object schemas with ``additionalProperties`` =
  blackbox; function-valued props and custom validators are ignored.
- :func:`to_spark_struct` is the engine-native addition (SURVEY §2.3 S9
  note): the expected Spark ``StructType`` implied by a schema — the bridge
  between the declarative surface and a concrete table layout.
"""

from __future__ import annotations

from typing import Any, Optional

from pyspark.sql import types as T

from .definition import make_key_generic
from .schema import SimpleSchema
from .types import (
    AnyType,
    ArrayType,
    Binary,
    Boolean,
    DateType,
    Integer,
    Number,
    ObjectType,
    String,
    TypeToken,
)
from ..compiler.regex import js_regex_repr

__all__ = ["to_json_schema", "to_spark_struct"]

_JSON_SCHEMA_VERSION = "https://json-schema.org/draft/2020-12/schema"


def to_json_schema(ss: SimpleSchema, id: Optional[str] = None) -> dict:  # noqa: A002
    out: dict[str, Any] = {}
    if id is not None:
        out["$id"] = id
    out["$schema"] = _JSON_SCHEMA_VERSION
    out.update(_object_schema(ss, additional=False))
    return out


def _object_schema(ss: SimpleSchema, additional: bool) -> dict:
    properties: dict[str, Any] = {}
    required: list[str] = []
    for key in ss.object_keys():
        definition = ss.get_definition_raw(key)
        if definition is None:
            continue
        if definition.get("optional") is not True:
            required.append(key)
        field = _field_schema(ss, key)
        if field is not None:
            properties[key] = field
    return {
        "type": "object",
        "properties": properties,
        "required": required,
        "additionalProperties": additional,
    }


def _field_schema(ss: SimpleSchema, key: str) -> Optional[dict]:
    definition = ss.get_definition_raw(key)
    if definition is None:
        return None
    schemas = []
    for alt in definition["type"].definitions:
        t = alt.get("type")
        item: Optional[dict] = None
        if t is String:
            item = {"type": "string"}
            av = alt.get("allowedValues")
            if av is not None and not callable(av):
                item["enum"] = sorted(av) if isinstance(av, set) else list(av)
            if alt.get("max") is not None and not callable(alt["max"]):
                item["maxLength"] = alt["max"]
            if alt.get("min") is not None and not callable(alt["min"]):
                item["minLength"] = alt["min"]
            regex = alt.get("regEx")
            if regex is not None and not isinstance(regex, (list, tuple)):
                item["pattern"] = js_regex_repr(regex)
        elif t in (Number, Integer):
            item = {"type": "number" if t is Number else "integer"}
            if alt.get("max") is not None and not callable(alt["max"]):
                item["exclusiveMaximum" if alt.get("exclusiveMax") is True else "maximum"] = alt["max"]
            if alt.get("min") is not None and not callable(alt["min"]):
                item["exclusiveMinimum" if alt.get("exclusiveMin") is True else "minimum"] = alt["min"]
        elif t is Boolean:
            item = {"type": "boolean"}
        elif t is DateType:
            item = {"type": "string", "format": "date-time"}
        elif t is ArrayType:
            inner = _field_schema(ss, f"{key}.$")
            if inner is not None:
                item = {"type": "array", "items": [inner], "additionalItems": False}
                if alt.get("minCount") is not None:
                    item["minItems"] = alt["minCount"]
                if alt.get("maxCount") is not None:
                    item["maxItems"] = alt["maxCount"]
        elif t is ObjectType:
            item = _object_schema(
                ss.get_object_schema(key), alt.get("blackbox") is True
            )
        elif t is AnyType:
            item = {}
        elif isinstance(t, SimpleSchema):
            item = _object_schema(t, alt.get("blackbox") is True)
        elif t is Binary:
            item = {"type": "string", "contentEncoding": "base64"}
        if item is not None and "defaultValue" in definition:
            item["default"] = definition["defaultValue"]
        if item is not None:
            schemas.append(item)
    if len(schemas) > 1:
        return {"anyOf": schemas}
    return schemas[0] if schemas else None


def to_spark_struct(ss: SimpleSchema) -> T.StructType:
    """Expected table layout: one StructField per first-level key; nested
    keys/subschemas → StructType; ``key.$`` → ArrayType(element)."""
    fields = []
    for key in ss.object_keys():
        dt = _spark_type(ss, key)
        nullable = ss.get_definition_raw(key).get("optional") is not False
        fields.append(T.StructField(key, dt, nullable))
    return T.StructType(fields)


def _spark_type(ss: SimpleSchema, key: str) -> T.DataType:
    definition = ss.get_definition_raw(key)
    if definition is None:
        return T.StringType()
    t = definition["type"].single_type
    if t is String:
        return T.StringType()
    if t is Number:
        return T.DoubleType()
    if t is Integer:
        return T.LongType()
    if t is Boolean:
        return T.BooleanType()
    if t is DateType:
        return T.TimestampType()
    if t is Binary:
        return T.BinaryType()
    if t is AnyType:
        return T.StringType()
    if t is ArrayType:
        return T.ArrayType(_spark_type(ss, f"{key}.$"))
    if isinstance(t, SimpleSchema):
        return to_spark_struct(t)
    if t is ObjectType:
        obj = ss.get_object_schema(key)
        if obj.schema_keys:
            return to_spark_struct(obj)
        return T.MapType(T.StringType(), T.StringType())  # blackbox payload
    return T.StringType()
