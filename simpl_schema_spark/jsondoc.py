"""Dynamic/JSON document mode: validate a JSON string column row-by-row.

The fixed-column validator (compiler/compile.py) enforces KEY_NOT_IN_SCHEMA
at compile time — right for tables, impossible for a ``json_blob`` column of
heterogeneous crawl payloads.  This module reproduces the reference's
present-key iteration (``validateField.ts:262-279``: unknown keys flagged
per document; ``typeValidator`` on each declared key) over JSON text:

- one ``parse_json`` per row (variant), then per declared key a
  ``try_variant_get``/``to_json`` extraction that PRESERVES JSON token types
  (strings stay quoted) so the modifier-table rule compiler's value checks
  (type, min/max, regex, allowedValues, minCount/maxCount) apply verbatim
- required: key absent or JSON null (doc mode, requiredValidator.ts:28,34)
- KEY_NOT_IN_SCHEMA: ``json_object_keys`` at the root and inside each
  declared (non-blackbox) object subtree, minus declared/blackbox names
- blackbox / Any subtrees skipped (validateField.ts:112-113,174-175)

Everything is one Catalyst projection per row — no shuffle, no Python; at
10^12 docs this fuses with the scan like the fixed-column path.

Limitations (documented): array ITEM checks run element-wise only for the
whole-array type/count rules (per-element value rules need the long-format
modifier path or exploded items).
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import Column, DataFrame, functions as F

from .errors import ErrorTypes, VIOLATION_SCHEMA
from .modifiers import _ModifierCompiler, _is_json_null
from .compiler.compile import violation, _null_violation
from .schema.schema import SimpleSchema
from .schema.types import AnyType, ObjectType

__all__ = ["json_violations_column", "validate_json_column"]


def _variant_path(key: str) -> str:
    return "$" + "".join(f"['{seg}']" for seg in key.split("."))


def json_violations_column(
    schema: SimpleSchema, json_col: Column
) -> Column:
    """``array<violation>`` for one JSON-document column."""
    comp = _ModifierCompiler(schema)
    # try_parse_json: heterogeneous crawl payloads WILL contain malformed
    # rows; a null variant yields one malformedJson violation (below)
    # instead of failing the whole job
    var = F.try_parse_json(json_col)
    blackbox = set(schema.blackbox_keys())

    def _optional(d: dict) -> bool:
        # callable `optional` evaluated like the fixed-column compiler
        # (compiler/compile.py:401-403): bool(optional())
        opt = d.get("optional", False)
        return bool(opt()) if callable(opt) else bool(opt)

    optional_map = {k: _optional(d) for k, d in comp.merged.items()}

    def is_blackboxed(key: str) -> bool:
        return any(key == b or key.startswith(b + ".") for b in blackbox)

    arrays: list[Column] = []
    object_keys: list[str] = []
    for k in comp.merged:
        if ".$" in k or k.endswith(".$") or is_blackboxed(k):
            continue
        alts = comp._alternatives(k)
        if any(a.get("type") is AnyType for a in alts):
            continue
        extracted = F.to_json(F.try_variant_get(var, _variant_path(k), "variant"))
        name = F.lit(k)
        chain: list[Column] = []
        if not optional_map.get(k, False):
            chain.append(
                F.when(
                    extracted.isNull() | _is_json_null(extracted),
                    violation(name, ErrorTypes.REQUIRED),
                ).otherwise(_null_violation())
            )
        err = comp.value_error(k, extracted, name, F.lit("$set"))
        if err is not None:
            chain.append(
                F.when(
                    extracted.isNotNull() & ~_is_json_null(extracted), err
                ).otherwise(_null_violation())
            )
        if chain:
            arrays.append(
                F.array(chain[0] if len(chain) == 1 else F.coalesce(*chain))
            )
        # per-ELEMENT item checks for declared arrays: array<variant>
        # extraction keeps each element's JSON token; violations get
        # concrete-index names (validateField.ts:293-306)
        item_key = f"{k}.$"
        has_item_rules = (
            item_key in comp.merged
            and not is_blackboxed(item_key)
            and comp.value_error(
                k, F.lit('"probe"'), F.lit("probe"), F.lit("$set"), as_item=True
            )
            is not None
        )
        if has_item_rules:
            elems = F.try_variant_get(var, _variant_path(k), "array<variant>")
            per_elem = F.filter(
                F.transform(
                    elems,
                    lambda e, i: comp.value_error(
                        k,
                        F.to_json(e),
                        F.concat(F.lit(k + "."), i.cast("string")),
                        F.lit("$set"),
                        as_item=True,
                    ),
                ),
                lambda x: x.isNotNull(),
            )
            arrays.append(
                F.when(elems.isNotNull(), per_elem).otherwise(
                    F.array().cast(f"array<{VIOLATION_SCHEMA.simpleString()}>")
                )
            )
        if any(
            isinstance(a.get("type"), SimpleSchema) or a.get("type") is ObjectType
            for a in alts
        ) and not any(a.get("blackbox") is True for a in alts):
            object_keys.append(k)

    # ---- KEY_NOT_IN_SCHEMA: root + every declared object subtree ----------
    def unknown_in(obj_json: Column, prefix: str) -> Column:
        declared = sorted(
            {
                k[len(prefix):].split(".")[0]
                for k in comp.merged
                if (k.startswith(prefix) if prefix else True) and ".$" not in k
            }
            | {
                b[len(prefix):].split(".")[0]
                for b in blackbox
                if (b.startswith(prefix) if prefix else True)
            }
        )
        declared_arr = (
            F.array(*[F.lit(n) for n in declared])
            if declared
            else F.array().cast("array<string>")
        )
        return F.transform(
            F.coalesce(
                F.array_except(F.json_object_keys(obj_json), declared_arr),
                F.array().cast("array<string>"),
            ),
            lambda nm: violation(
                F.concat(F.lit(prefix), nm), ErrorTypes.KEY_NOT_IN_SCHEMA
            ),
        )

    arrays.append(unknown_in(json_col, ""))
    for k in object_keys:
        sub = F.to_json(F.try_variant_get(var, _variant_path(k), "variant"))
        arrays.append(
            F.when(sub.isNotNull(), unknown_in(sub, k + ".")).otherwise(
                F.array().cast(f"array<{VIOLATION_SCHEMA.simpleString()}>")
            )
        )

    combined = F.concat(*arrays) if len(arrays) > 1 else arrays[0]
    # malformed document: one malformedJson violation, nothing else (the
    # per-key chains would otherwise cascade spurious `required` rows)
    return F.when(
        json_col.isNotNull() & var.isNull(),
        F.array(violation(F.lit("$"), ErrorTypes.MALFORMED_JSON)),
    ).otherwise(F.array_compact(combined))


def validate_json_column(
    df: DataFrame,
    schema: SimpleSchema,
    json_col: str = "json_blob",
    id_cols: Iterable[str] = ("doc_id",),
) -> DataFrame:
    """Exploded violations table for a JSON string column."""
    id_cols = list(id_cols)
    return (
        df.select(
            *id_cols,
            F.explode(
                json_violations_column(schema, F.col(json_col))
            ).alias("violation"),
        ).select(*id_cols, "violation.*")
    )
