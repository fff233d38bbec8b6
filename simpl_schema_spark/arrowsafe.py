"""Workaround for a PySpark 4.1 JVM→Arrow serialization crash.

Shipping a column whose type nests THREE or more list levels (e.g.
``array<struct<array<struct<array<string>>>>>``) to a pandas UDF SEGFAULTS
the Python worker inside ``arrow_to_pandas`` whenever the TOP-LEVEL array
of a row is NULL or EMPTY — the serialized batch then carries a
zero-length struct child whose grandchild list buffers pyarrow 16 crashes
on.  (Reproduced with an identity ``pandas_udf``; pure
``pyarrow.Array.to_pandas`` on the same logical values is fine, so the
malformed buffers come from Spark's ArrowWriter.)  Inner-level nulls and
empties are unaffected, and a one-element ``[null]`` top-level array
round-trips correctly.

The workaround: for list-depth ≥ 3 inputs, substitute ``[null]`` for
null/empty top-level arrays before the UDF boundary, ship a companion
BOOLEAN dummy-flag column, and have the UDF return None for flagged rows
WITHOUT iterating the dummy (so null-unsafe user fns are never invoked
on it); the caller gates the UDF's result back to the original
null/empty value.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F, types as T

__all__ = [
    "list_depth",
    "needs_arrow_guard",
    "arrow_safe_array",
    "resolve_dtype",
    "ctx_safe_struct",
    "decode_ctx_row",
]


def list_depth(dtype: T.DataType) -> int:
    """Maximum number of nested ArrayType levels anywhere in ``dtype``."""
    if isinstance(dtype, T.ArrayType):
        return 1 + list_depth(dtype.elementType)
    if isinstance(dtype, T.StructType):
        return max((list_depth(f.dataType) for f in dtype.fields), default=0)
    if isinstance(dtype, T.MapType):
        return max(list_depth(dtype.keyType), list_depth(dtype.valueType))
    return 0


def needs_arrow_guard(dtype: T.DataType) -> bool:
    return list_depth(dtype) >= 3


def resolve_dtype(schema: T.StructType, path: str) -> T.DataType:
    """DataType of a (possibly dotted) column path in a struct schema."""
    cur: T.DataType = schema
    for seg in path.split("."):
        cur = cur[seg].dataType  # type: ignore[index]
    return cur


def ctx_safe_struct(schema: T.StructType, cols: list) -> tuple:
    """``(struct Column, jsonified names)`` for a cross-field context.

    Context structs re-ship whole columns, and wrapping a ≥3-list-level
    column in one MORE struct level crashes the Arrow converter even for
    fully-populated data — so deeply nested context columns travel as
    ``to_json`` strings instead, and :func:`decode_ctx_row` restores them
    to plain dicts/lists on the Python side (the same shapes Arrow's own
    struct decoding produces; datetimes inside such columns arrive as ISO
    strings — documented tradeoff of the JSON detour).
    """
    out, jsonified = [], []
    for c in cols:
        col = F.col(c)
        if needs_arrow_guard(resolve_dtype(schema, c)):
            out.append(F.to_json(col).alias(c))
            jsonified.append(c)
        else:
            out.append(col.alias(c))
    return F.struct(*out), jsonified


def decode_ctx_row(row: dict, jsonified: list) -> dict:
    """Restore JSON-detoured context values to dicts/lists (see
    :func:`ctx_safe_struct`); NULL columns stay None."""
    if not jsonified:
        return row
    import json

    out = dict(row)
    for k in jsonified:
        v = out.get(k)
        if isinstance(v, str):
            out[k] = json.loads(v)
    return out


def arrow_safe_array(arr: Column, arr_type: T.ArrayType) -> Column:
    """``arr`` with null/empty top-level values replaced by ``[null]`` —
    safe to ship through the Arrow UDF boundary at any nesting depth.
    Callers must gate the UDF result on the ORIGINAL column's null/empty
    state (``F.when(F.size(arr) > 0, result)…``)."""
    dummy = F.array(F.lit(None).cast(arr_type.elementType))
    # ANSI size(NULL) is NULL → the > 0 test is falsy for null arrays too
    return F.when(F.size(arr) > 0, arr).otherwise(dummy)
