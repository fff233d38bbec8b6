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
null/empty top-level arrays before the UDF boundary and have the caller
gate the UDF's result back to the original null/empty.  Callers' per-
element logic never dereferences the dummy null element (extraction of
the next level from ``None`` short-circuits), so results are unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F, types as T

__all__ = ["list_depth", "needs_arrow_guard", "arrow_safe_array"]


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


def arrow_safe_array(arr: Column, arr_type: T.ArrayType) -> Column:
    """``arr`` with null/empty top-level values replaced by ``[null]`` —
    safe to ship through the Arrow UDF boundary at any nesting depth.
    Callers must gate the UDF result on the ORIGINAL column's null/empty
    state (``F.when(F.size(arr) > 0, result)…``)."""
    dummy = F.array(F.lit(None).cast(arr_type.elementType))
    # ANSI size(NULL) is NULL → the > 0 test is falsy for null arrays too
    return F.when(F.size(arr) > 0, arr).otherwise(dummy)
