"""MongoDB-style update-modifier validation over a long-format table.

The reference's distinguishing feature (README:13,173-193): a modifier
document is validated so the stored document AFTER applying it would be
valid.  Dispatch table: ``/root/reference/src/doValidation.ts:40-86``;
required decision table: ``src/validation/requiredValidator.ts:13-61``;
``$inc`` bounds exemption: ``src/validation/typeValidator/checkNumberValue.ts:20,36``;
``$push``/``$addToSet`` item validation incl. ``$each``:
``doValidation.ts:52-58``; ``$currentDate`` forms:
``typeValidator/index.ts:40-44,57-59``; removal ops skipped:
``doValidation.ts:9-12``.

Relational encoding (FIXTURES.md F6): one row per (document, operator, key)::

    (doc_id string/bigint, op string, key_path string, value string, upsert boolean)

``value`` is JSON; dates use extended-JSON ``{"$date": "ISO-8601"}``.

Execution shape: ONE projection over the long table (all per-row rules are a
CASE WHEN forest over the generic key, exactly like the document validator)
plus ONE small aggregation per upsert-required injection (collect the set of
"keys with values" per document and anti-join the compile-time required-key
list — the relational form of getKeysWithValueInObj,
``src/utility/index.ts:46-64``).
"""

from __future__ import annotations

import json
from functools import reduce
from typing import Any, Optional

import pandas as pd

from pyspark.sql import Column, DataFrame, functions as F, types as T

from .compiler.compile import violation, _null_violation
from .compiler.regex import js_regex_repr, to_java_regex
from .errors import ErrorTypes, VIOLATION_SCHEMA
from .schema.schema import SimpleSchema
from .schema.types import (
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

__all__ = ["validate_modifier_table", "UnsupportedModifierError"]

#: value never checked / cleaned for these (doValidation.ts:9-12)
OPS_SKIPPED = ("$pull", "$pullAll", "$pop", "$slice")
OPS_SET = ("$set", "$setOnInsert")
OPS_PUSH = ("$push", "$addToSet")
KNOWN_OPS = OPS_SKIPPED + OPS_SET + OPS_PUSH + (
    "$unset", "$rename", "$inc", "$currentDate", "$min", "$max", "$mul",
)


class UnsupportedModifierError(Exception):
    """$pushAll (doValidation.ts:10) and non-$ keys (ts:44-46)."""


def _generic_key(key_path: Column) -> Column:
    """a.0.b → a.$.b (mongo-object makeKeyGeneric parity)."""
    return F.regexp_replace(key_path, r"(?<=^|\.)\d+(?=\.|$)", "\\$")


# ---------------------------------------------------------------- JSON typing

def _is_json_string(v: Column) -> Column:
    return v.rlike('^\\s*"')


def _is_json_null(v: Column) -> Column:
    return v.rlike("^\\s*null\\s*$")


def _is_json_bool(v: Column) -> Column:
    return v.rlike("^\\s*(true|false)\\s*$")


def _is_json_number(v: Column) -> Column:
    return v.rlike(r"^\s*-?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?\s*$")


def _is_json_array(v: Column) -> Column:
    return v.rlike(r"^\s*\[")


def _is_json_object(v: Column) -> Column:
    return v.rlike(r"^\s*\{")


def _is_ext_date(v: Column) -> Column:
    return v.rlike(r'^\s*\{\s*"\$date"')


def _token_matches_alternatives(alts: list[dict], token: Column) -> Column:
    """True when the JSON token's type class matches ANY alternative of a
    oneOf group — autoConvert must then leave it alone (the reference gates
    conversion on !isValueTypeValid over all definitions, clean.ts:101).
    Integer alternatives match only integral numbers (Number.isInteger)."""
    conds = []
    for a in alts:
        t = a.get("type")
        if t is String:
            conds.append(_is_json_string(token))
        elif t is Integer:
            num = _json_num(token)
            conds.append(_is_json_number(token) & (num == F.floor(num)))
        elif t is Number:
            conds.append(_is_json_number(token))
        elif t is Boolean:
            conds.append(_is_json_bool(token))
        elif t is DateType:
            conds.append(_is_ext_date(token))
        elif t is ArrayType:
            conds.append(_is_json_array(token))
        else:  # Object / nested SimpleSchema / custom classes
            conds.append(_is_json_object(token) & ~_is_ext_date(token))
    return reduce(lambda x, y: x | y, conds) if conds else F.lit(True)


def _json_str(v: Column) -> Column:
    return F.from_json(F.concat(F.lit('{"v":'), v, F.lit("}")), "v string").getField("v")


def _json_num(v: Column) -> Column:
    return F.from_json(F.concat(F.lit('{"v":'), v, F.lit("}")), "v double").getField("v")


def _json_quote(s: Column) -> Column:
    """Encode a decoded string back to a JSON string token with proper
    escaping (quotes, backslashes, control chars): to_json(array(s)) minus
    the surrounding brackets."""
    encoded = F.to_json(F.array(s))
    return F.substring(encoded, 2, F.length(encoded) - 2)


def _json_date(v: Column) -> Column:
    iso = F.from_json(v, "`$date` string").getField("$date")
    return F.coalesce(
        iso.try_cast("timestamp"),
        F.try_to_timestamp(iso, F.lit("yyyy-MM-dd'T'HH:mm:ss.SSSXXX")),
        F.try_to_timestamp(iso, F.lit("yyyy-MM-dd'T'HH:mm:ssXXX")),
    )


def _display(v: Column) -> Column:
    """Offending-value payload: unquote JSON strings, else raw JSON."""
    return F.when(_is_json_string(v), _json_str(v)).otherwise(F.trim(v))


class _ModifierCompiler:
    """Compile per-(key, op-class) value rules into one CASE forest."""

    def __init__(self, schema: SimpleSchema) -> None:
        self.schema = schema
        self.merged = schema.merged_schema()

    # ---------------------------------------------------------- per-key rules

    def _alternatives(self, generic: str) -> list[dict]:
        d = self.merged[generic]
        outer = {k: v for k, v in d.items() if k != "type"}
        return [{**outer, **alt} for alt in d["type"].definitions]

    def value_error(
        self,
        generic: str,
        v: Column,
        name: Column,
        op: Column,
        *,
        as_item: bool = False,
    ) -> Optional[Column]:
        """First violation for a JSON value checked against key ``generic``
        (item definition when as_item)."""
        key = f"{generic}.$" if as_item and f"{generic}.$" in self.merged else generic
        if key not in self.merged:
            return None
        alts = self._alternatives(key)
        if any(a.get("type") is AnyType for a in alts):
            return None
        errs = [self._alt_error(a, v, name, op) for a in alts]
        errs = [e for e in errs if e is not None]
        if not errs:
            return None
        if len(errs) == 1:
            return errs[0]
        any_ok = reduce(lambda a, b: a | b, [e.isNull() for e in errs])
        return F.when(any_ok, _null_violation()).otherwise(errs[-1])

    def _alt_error(self, alt: dict, v: Column, name: Column, op: Column) -> Optional[Column]:
        token = alt.get("type")
        if isinstance(token, SimpleSchema):
            token = ObjectType
        if not isinstance(token, TypeToken):
            return None
        chain: list[Column] = []

        type_err = self._type_error(token, alt, v, name, op)
        if type_err is not None:
            chain.append(type_err)

        allowed = alt.get("allowedValues")
        if allowed is not None:
            vals = sorted(allowed) if isinstance(allowed, set) else list(allowed)
            typed = _json_str(v) if isinstance(vals[0], str) else _json_num(v)
            chain.append(
                F.when(
                    ~typed.isin(*vals),
                    violation(name, ErrorTypes.VALUE_NOT_ALLOWED, value=_display(v)),
                ).otherwise(_null_violation())
            )
        if not chain:
            return None
        return chain[0] if len(chain) == 1 else F.coalesce(*chain)

    def _type_error(
        self, token: TypeToken, alt: dict, v: Column, name: Column, op: Column
    ) -> Optional[Column]:
        if token is String:
            s = _json_str(v)
            conds = [
                F.when(
                    ~_is_json_string(v),
                    violation(name, ErrorTypes.EXPECTED_TYPE, value=_display(v), dataType="String"),
                ).otherwise(_null_violation())
            ]
            if alt.get("max") is not None:
                conds.append(
                    F.when(
                        F.length(s) > alt["max"],
                        violation(name, ErrorTypes.MAX_STRING, value=s, max=str(alt["max"])),
                    ).otherwise(_null_violation())
                )
            if alt.get("min") is not None:
                conds.append(
                    F.when(
                        F.length(s) < alt["min"],
                        violation(name, ErrorTypes.MIN_STRING, value=s, min=str(alt["min"])),
                    ).otherwise(_null_violation())
                )
            regex = alt.get("regEx")
            if regex is not None:
                pats = regex if isinstance(regex, (list, tuple)) else [regex]
                for pat in pats:
                    fail = ~s.rlike(to_java_regex(pat))
                    if alt.get("skipRegExCheckForEmptyStrings") is True and not isinstance(
                        regex, (list, tuple)
                    ):
                        fail = fail & (s != "")
                    conds.append(
                        F.when(
                            fail,
                            violation(
                                name,
                                ErrorTypes.FAILED_REGULAR_EXPRESSION,
                                value=s,
                                regExp=js_regex_repr(pat),
                            ),
                        ).otherwise(_null_violation())
                    )
            return F.coalesce(*conds)

        if token in (Number, Integer):
            n = _json_num(v)
            dt = "Integer" if token is Integer else "Number"
            conds = [
                F.when(
                    ~_is_json_number(v),
                    violation(name, ErrorTypes.EXPECTED_TYPE, value=_display(v), dataType=dt),
                ).otherwise(_null_violation())
            ]
            not_inc = op != "$inc"  # bounds skipped under $inc
            if alt.get("max") is not None:
                excl = alt.get("exclusiveMax") is True
                cond = (n >= alt["max"]) if excl else (n > alt["max"])
                conds.append(
                    F.when(
                        not_inc & cond,
                        violation(
                            name,
                            ErrorTypes.MAX_NUMBER_EXCLUSIVE if excl else ErrorTypes.MAX_NUMBER,
                            value=_display(v),
                            max=str(alt["max"]),
                        ),
                    ).otherwise(_null_violation())
                )
            if alt.get("min") is not None:
                excl = alt.get("exclusiveMin") is True
                cond = (n <= alt["min"]) if excl else (n < alt["min"])
                conds.append(
                    F.when(
                        not_inc & cond,
                        violation(
                            name,
                            ErrorTypes.MIN_NUMBER_EXCLUSIVE if excl else ErrorTypes.MIN_NUMBER,
                            value=_display(v),
                            min=str(alt["min"]),
                        ),
                    ).otherwise(_null_violation())
                )
            if token is Integer:
                conds.append(
                    F.when(
                        n != F.floor(n),
                        violation(name, ErrorTypes.MUST_BE_INTEGER, value=_display(v)),
                    ).otherwise(_null_violation())
                )
            return F.coalesce(*conds)

        if token is Boolean:
            return F.when(
                ~_is_json_bool(v),
                violation(name, ErrorTypes.EXPECTED_TYPE, value=_display(v), dataType="Boolean"),
            ).otherwise(_null_violation())

        if token is DateType:
            # $currentDate accepts true or {"$type":"date"}
            # (typeValidator/index.ts:40-44); the substituted value is `now`,
            # checked against min/max (ts:57-59)
            current_ok = (op == "$currentDate") & (
                v.rlike("^\\s*true\\s*$")
                | (F.regexp_replace(v, "\\s", "") == F.lit('{"$type":"date"}'))
            )
            ts = F.when(current_ok, F.current_timestamp()).otherwise(_json_date(v))
            conds = [
                F.when(
                    ts.isNull(),
                    violation(name, ErrorTypes.EXPECTED_TYPE, value=_display(v), dataType="Date"),
                ).otherwise(_null_violation())
            ]
            if alt.get("min") is not None:
                from .compiler.compile import _date_str

                conds.append(
                    F.when(
                        ts < F.lit(alt["min"]),
                        violation(
                            name, ErrorTypes.MIN_DATE, value=ts.cast("string"),
                            min=_date_str(alt["min"]),
                        ),
                    ).otherwise(_null_violation())
                )
            if alt.get("max") is not None:
                from .compiler.compile import _date_str

                conds.append(
                    F.when(
                        ts > F.lit(alt["max"]),
                        violation(
                            name, ErrorTypes.MAX_DATE, value=ts.cast("string"),
                            max=_date_str(alt["max"]),
                        ),
                    ).otherwise(_null_violation())
                )
            return F.coalesce(*conds)

        if token is ArrayType:
            conds = [
                F.when(
                    ~_is_json_array(v),
                    violation(name, ErrorTypes.EXPECTED_TYPE, value=_display(v), dataType="Array"),
                ).otherwise(_null_violation())
            ]
            if alt.get("minCount") is not None:
                conds.append(
                    F.when(
                        F.json_array_length(v) < alt["minCount"],
                        violation(name, ErrorTypes.MIN_COUNT, value=v, minCount=str(alt["minCount"])),
                    ).otherwise(_null_violation())
                )
            if alt.get("maxCount") is not None:
                conds.append(
                    F.when(
                        F.json_array_length(v) > alt["maxCount"],
                        violation(name, ErrorTypes.MAX_COUNT, value=v, maxCount=str(alt["maxCount"])),
                    ).otherwise(_null_violation())
                )
            return F.coalesce(*conds)

        if token is ObjectType:
            return F.when(
                ~_is_json_object(v) | _is_ext_date(v),
                violation(name, ErrorTypes.EXPECTED_TYPE, value=_display(v), dataType="Object"),
            ).otherwise(_null_violation())

        if token is Binary:
            return F.when(
                F.lit(True),
                violation(name, ErrorTypes.EXPECTED_TYPE, value=_display(v), dataType="Uint8Array"),
            ).otherwise(_null_violation())

        return None


def _each_elements_as_json(v: Column, comp: "_ModifierCompiler", item_key: str) -> Column:
    """Parse ``{"$each": [...]}`` and re-encode each element as a standalone
    JSON string, typed by the item definition's first alternative.

    String elements round-trip via ``to_json(array(e))`` minus the brackets
    (correct escaping); numerics/booleans stringify directly; dates keep the
    extended-JSON object form.
    """
    alts = comp._alternatives(item_key)
    token = alts[0].get("type") if alts else String
    if token in (Number, Integer):
        arr = F.from_json(v, "`$each` array<double>").getField("$each")
        return F.transform(arr, lambda e: e.cast("string"))
    if token is Boolean:
        arr = F.from_json(v, "`$each` array<boolean>").getField("$each")
        return F.transform(arr, lambda e: e.cast("string"))
    if token is DateType:
        arr = F.from_json(v, "`$each` array<struct<`$date`:string>>").getField("$each")
        return F.transform(arr, lambda e: F.to_json(e))
    # default: strings (and anything else) — JSON-escape via to_json(array(e))
    arr = F.from_json(v, "`$each` array<string>").getField("$each")
    return F.transform(
        arr,
        lambda e: F.substring(
            F.to_json(F.array(e)), 2, F.length(F.to_json(F.array(e))) - 2
        ),
    )


def _expand_object_set_rows(
    mods: DataFrame, comp: "_ModifierCompiler", schema: SimpleSchema, id_col: str
) -> DataFrame:
    """Recursively expand object-valued ``$set``/``$setOnInsert`` rows into
    child rows so descendant keys flow through the normal per-key rules
    (reference doValidation.ts:64-70 → validateField object recursion).

    For each declared non-blackbox Object key ``k``, rows
    ``(id, $set, k, {json object})`` yield:

    - one child row per DECLARED child; absent or explicit-null children get
      value ``'null'``, so required fires through the existing $set-null rule
      (missing non-optional children of a wholesale-replaced object ARE
      required errors — validateField.ts:323-345 iterates the key union)
    - one row per PRESENT-but-undeclared child, which the existing
      KEY_NOT_IN_SCHEMA rule flags

    Child JSON is extracted with variant functions (``try_variant_get`` +
    ``to_json``), which preserve JSON token types exactly (strings stay
    quoted, numbers bare) — pure JVM expressions, one projection per declared
    object key, no shuffle.  Nested declared objects expand transitively
    (keys processed parents-first).  Returns ``mods`` ∪ expanded rows.
    """
    blackbox = set(schema.blackbox_keys())
    object_keys: list[str] = []
    for k, d in comp.merged.items():
        if ".$" in k or k in blackbox:
            continue
        alts = comp._alternatives(k)
        if any(
            isinstance(a.get("type"), SimpleSchema) or a.get("type") is ObjectType
            for a in alts
        ) and not any(a.get("blackbox") is True for a in alts):
            object_keys.append(k)
    if not object_keys:
        return mods

    struct_t = "key_path string, value string"
    all_rows = mods
    for k in sorted(object_keys, key=lambda s: s.count(".")):
        prefix = f"{k}."
        declared = sorted(
            {
                c[len(prefix):].split(".")[0]
                for c in comp.merged
                if c.startswith(prefix)
            }
        )
        v = F.col("value")
        # try_parse_json: a truncated '{...' token passes the cheap shape
        # check but must not kill the job — unparseable tokens simply don't
        # expand into child rows (the parent value keeps its own checks)
        var = F.try_parse_json(v)
        rows_k = all_rows.where(
            (_generic_key(F.col("key_path")) == k)
            & F.col("op").isin(*OPS_SET)
            & _is_json_object(v)
            & ~_is_ext_date(v)
            & var.isNotNull()
        )
        children = [
            F.struct(
                F.concat(F.col("key_path"), F.lit("." + n)).alias("key_path"),
                F.coalesce(
                    F.to_json(F.try_variant_get(var, f"$['{n}']", "variant")),
                    F.lit("null"),
                ).alias("value"),
            )
            for n in declared
        ]
        declared_arr = (
            F.array(*[F.lit(n) for n in declared])
            if declared
            else F.array().cast("array<string>")
        )
        unknown = F.transform(
            F.coalesce(
                F.array_except(F.json_object_keys(v), declared_arr),
                F.array().cast("array<string>"),
            ),
            lambda nm: F.struct(
                F.concat(F.col("key_path"), F.lit("."), nm).alias("key_path"),
                F.lit("null").alias("value"),
            ),
        )
        declared_arr_col = (
            F.array(*children)
            if children
            else F.array().cast(f"array<struct<{struct_t}>>")
        )
        expanded = (
            rows_k.select(
                F.col(id_col),
                F.col("op"),
                F.explode(F.concat(declared_arr_col, unknown)).alias("c"),
                F.col("upsert"),
            )
            .select(
                id_col,
                "op",
                F.col("c.key_path").alias("key_path"),
                F.col("c.value").alias("value"),
                "upsert",
            )
        )
        all_rows = all_rows.unionByName(expanded.select(*all_rows.columns))
    return all_rows


def _modifier_rule_forest(
    schema: SimpleSchema, comp: "_ModifierCompiler"
) -> dict:
    """Compiled per-row rule forest for a modifier table — PURE unbound
    Columns over the fixed column names (op, key_path, value, __entries),
    independent of any input DataFrame.  Memoized on the schema instance:
    building the forest issues thousands of py4j round trips (~0.9 s at
    bench scale, cProfile: 4.8k socket round trips), which repeated
    validate calls over the same schema should not re-pay.  Columns are
    immutable Catalyst trees, safe to share across queries (the same
    argument as the compile-time fragment cache in compiler/compile.py).
    Invalidation: ``SimpleSchema._rebuild_caches`` drops the memo on any
    definition change, and the key carries the identity of every active
    custom/global validator so a registry change rebuilds."""
    memo_key = (
        "modifier_forest",
        tuple(id(fn) for fn in schema.all_validators()),
    )
    memo = schema.__dict__.setdefault("_compiled_memo", {})
    if memo_key in memo:
        return memo[memo_key]
    op = F.col("op")
    key_path = F.col("key_path")
    v = F.col("value")
    generic = _generic_key(key_path)

    # ---- input validation (compile-level errors surfaced as rows) ----------
    bad_op = F.when(
        op == "$pushAll",
        violation(key_path, "unsupportedOperator", value=op),
    ).when(
        ~op.startswith("$"),
        violation(key_path, "notAModifierOperator", value=op),
    ).otherwise(_null_violation())

    # ---- KEY_NOT_IN_SCHEMA --------------------------------------------------
    # not emitted for $unset/$rename sources (validateField.ts:265-270) nor
    # `<datekey>.$type` under $currentDate; blackbox descendants allowed
    allowed_keys = set(comp.merged.keys())
    blackbox = schema.blackbox_keys()
    allowed_expr = generic.isin(*allowed_keys) if allowed_keys else F.lit(False)
    for bb in blackbox:
        allowed_expr = allowed_expr | generic.startswith(bb + ".")
    # ancestors of declared keys used as object-valued targets are allowed
    key_unknown = (
        ~allowed_expr
        & ~op.isin("$unset", "$rename")
        & ~((op == "$currentDate") & generic.endswith(".$type"))
    )
    key_not_in_schema = F.when(
        key_unknown,
        violation(key_path, ErrorTypes.KEY_NOT_IN_SCHEMA, value=_display(v)),
    ).otherwise(_null_violation())

    # ---- required: explicit null / $unset / $rename -------------------------
    required_rows = []
    optional_map = {k: _eval_optional(d) for k, d in comp.merged.items()}
    non_optional = [k for k, opt in optional_map.items() if not opt]
    req_cond = None
    if non_optional:
        is_non_opt = generic.isin(*non_optional)
        req_cond = F.when(
            is_non_opt
            & (
                op.isin("$unset", "$rename")
                | (op.isin(*OPS_SET) & _is_json_null(v))
            ),
            violation(key_path, ErrorTypes.REQUIRED),
        ).otherwise(_null_violation())

    # ---- custom validators (validateField.ts:192-226 runs the full chain
    # in modifier mode too): Python fns ride Arrow UDFs over the JSON value
    # token; @spark_rule fns get a typed token extraction; two-argument fns
    # resolve field()/sibling_field() against the document's other operator
    # entries (reference getFieldInfo over the mongoObject)
    def _customs_for(key: str) -> list:
        if key not in comp.merged:
            return []
        fns: list = []
        for a in comp._alternatives(key):
            fn_a = a.get("custom")
            if fn_a is not None and all(fn_a is not c for c in fns):
                fns.append(fn_a)
        return fns + schema.all_validators()

    from .compiler.compile import RuleContext, _wants_context

    any_ctx = any(
        _wants_context(fn)
        for key in comp.merged
        for fn in _customs_for(key)
        if not getattr(fn, "_is_spark_rule", False)
    )
    has_any_custom = any(_customs_for(key) for key in comp.merged)
    entries_col = F.col("__entries") if any_ctx else None

    def _typed_token(key: str, token: Column) -> Column:
        kinds = set()
        for a in comp._alternatives(key):
            t = a.get("type")
            if isinstance(t, SimpleSchema):
                t = ObjectType
            kinds.add(t)
        if kinds == {String}:
            return _json_str(token)
        if kinds <= {Number, Integer} and kinds:
            return _json_num(token)
        if kinds == {Boolean}:
            return F.from_json(
                F.concat(F.lit('{"v":'), token, F.lit("}")), "v boolean"
            ).getField("v")
        # object- / oneOf-typed keys: hand the rule the token parsed as a
        # VARIANT value (malformed tokens → NULL via try_parse_json, same
        # contract as object-valued $set recursion); the rule extracts what
        # it needs with try_variant_get(value, '$.path', type)
        return F.try_parse_json(token)

    def _token_udf(fn, key: str, wants_ctx: bool):
        """Key-masked validator UDF.  Spark extracts pandas UDFs into an
        ArrowEvalPython node evaluated for EVERY row regardless of the
        CASE gating around the result, so the mask column must travel
        into the UDF — otherwise a type-sensitive validator for key X
        would also receive other keys' decoded values and could raise."""
        from .validation import FieldContext

        if wants_ctx:

            def _apply(
                tokens: pd.Series, masks: pd.Series, ents: pd.Series
            ) -> pd.Series:
                out = []
                for tok, m, en in zip(tokens, masks, ents):
                    if not m:
                        out.append(None)
                        continue
                    val = _decode_token(tok)
                    out.append(
                        fn(val, FieldContext(key, val, _decode_entry_row(en)))
                    )
                return pd.Series(out, dtype=object)

            return F.pandas_udf(_apply, T.StringType())

        def _apply(tokens: pd.Series, masks: pd.Series) -> pd.Series:
            return pd.Series(
                [fn(_decode_token(t)) if m else None
                 for t, m in zip(tokens, masks)],
                dtype=object,
            )

        return F.pandas_udf(_apply, T.StringType())

    def _custom_chain(key: str, name: Column) -> list[Column]:
        """Ordered custom-violation columns for one key's value token."""
        chain: list[Column] = []
        # item keys (tags.$) chain onto BOTH concrete-index rows (tags.0 →
        # generic tags.$) and single-value $push rows (generic tags)
        if key.endswith(".$"):
            mask = (generic == key) | (generic == key[: -len(".$")])
        else:
            mask = generic == key
        for fn in _customs_for(key):
            if getattr(fn, "_is_spark_rule", False):
                typed = _typed_token(key, v)
                err_type = fn(
                    typed,
                    RuleContext(
                        key=key, name=name, definition=comp._alternatives(key)[0]
                    ),
                )
            else:
                wants = _wants_context(fn)
                udf = _token_udf(fn, key, wants)
                err_type = (
                    udf(v, mask, entries_col) if wants else udf(v, mask)
                )
            chain.append(
                F.when(
                    err_type.isNotNull(),
                    violation(name, err_type, value=_display(v)),
                ).otherwise(_null_violation())
            )
        return chain

    # ---- per-key value rules -------------------------------------------------
    # value checked for $set/$setOnInsert/$inc/$min/$max/$mul/$currentDate
    # (non-null values); for $push/$addToSet against the ITEM definition
    check_value_ops = list(OPS_SET) + ["$inc", "$currentDate", "$min", "$max", "$mul"]
    empty_viol_arr = F.lit(None).cast(T.ArrayType(VIOLATION_SCHEMA))
    value_rule = _null_violation()
    item_rule = _null_violation()
    each_err = empty_viol_arr
    for k in comp.merged:
        if k.endswith(".$"):
            continue
        err = comp.value_error(k, v, key_path, op)
        customs = _custom_chain(k, key_path) if has_any_custom else []
        if err is not None or customs:
            parts = ([err] if err is not None else []) + customs
            full = parts[0] if len(parts) == 1 else F.coalesce(*parts)
            value_rule = F.when(generic == k, full).otherwise(value_rule)
        # concrete array index paths (tags.0) validate against the item def
        item_key = f"{k}.$"
        if item_key in comp.merged:
            item_customs = (
                _custom_chain(item_key, key_path) if has_any_custom else []
            )
            ierr_idx = comp.value_error(k, v, key_path, op, as_item=True)
            idx_parts = (
                [ierr_idx] if ierr_idx is not None else []
            ) + item_customs
            if idx_parts:
                full_idx = (
                    idx_parts[0]
                    if len(idx_parts) == 1
                    else F.coalesce(*idx_parts)
                )
                value_rule = F.when(generic == item_key, full_idx).otherwise(
                    value_rule
                )
                # single-value $push/$addToSet validates the pushed value
                # against the same item chain
                item_rule = F.when(generic == k, full_idx).otherwise(item_rule)
            ierr = comp.value_error(k, v, key_path, op, as_item=True)
            item_rule_fns = [
                fn
                for fn in (_customs_for(item_key) if has_any_custom else [])
            ]
            if ierr is not None or item_rule_fns:
                # $each: every element validated (doValidation.ts:52-58);
                # elements re-encoded to JSON per the item's expected type.
                # @spark_rule item customs run inside the transform; Python
                # item customs merge via one Arrow UDF over the token array
                # (UDF results can't be referenced inside HOF lambdas)
                elems = _each_elements_as_json(v, comp, item_key)

                def elem_expr_err(e):
                    parts = []
                    base_err = comp.value_error(
                        k, e, key_path, op, as_item=True
                    )
                    if base_err is not None:
                        parts.append(base_err)
                    for fn in item_rule_fns:
                        if not getattr(fn, "_is_spark_rule", False):
                            continue
                        typed = _typed_token(item_key, e)
                        et = fn(
                            typed,
                            RuleContext(
                                key=item_key,
                                name=key_path,
                                definition=comp._alternatives(item_key)[0],
                            ),
                        )
                        parts.append(
                            F.when(
                                et.isNotNull(),
                                violation(key_path, et, value=_display(e)),
                            ).otherwise(_null_violation())
                        )
                    if not parts:
                        return _null_violation()
                    return parts[0] if len(parts) == 1 else F.coalesce(*parts)

                expr_arr = F.transform(
                    F.coalesce(elems, F.array().cast("array<string>")),
                    elem_expr_err,
                )
                py_item_fns = [
                    fn
                    for fn in item_rule_fns
                    if not getattr(fn, "_is_spark_rule", False)
                ]
                if py_item_fns:
                    merge = _each_merge_udf(py_item_fns, item_key)
                    per_elem = merge(
                        expr_arr,
                        F.coalesce(elems, F.array().cast("array<string>")),
                        key_path,
                        entries_col
                        if any_ctx
                        else F.lit(None).cast(
                            "array<struct<op:string,key:string,value:string>>"
                        ),
                    )
                else:
                    per_elem = F.filter(expr_arr, lambda x: x.isNotNull())
                each_err = F.when(
                    (generic == k) & v.rlike(r'^\s*\{\s*"\$each"'), per_elem
                ).otherwise(each_err)

    checked = F.when(
        op.isin(*check_value_ops) & ~_is_json_null(v),
        value_rule,
    ).when(
        op.isin(*OPS_PUSH) & ~v.rlike(r'^\s*\{\s*"\$each"'),
        item_rule,
    ).otherwise(_null_violation())

    per_row = F.coalesce(
        bad_op,
        req_cond if req_cond is not None else _null_violation(),
        key_not_in_schema,
        checked,
    )
    memo[memo_key] = {
        "per_row": per_row,
        "each_err": each_err,
        "non_optional": non_optional,
        "any_ctx": any_ctx,
    }
    return memo[memo_key]


def validate_modifier_table(
    mods: DataFrame,
    schema: SimpleSchema,
    *,
    id_col: str = "doc_id",
) -> DataFrame:
    """Violations table ``(id, name, type, value…)`` for a long-format
    modifier table ``(id, op, key_path, value, upsert)``."""
    comp = _ModifierCompiler(schema)
    rules = _modifier_rule_forest(schema, comp)
    mods = _expand_object_set_rows(mods, comp, schema, id_col)
    if rules["any_ctx"]:
        # one co-partitioned shuffle attaching the (schema-bounded) entry
        # list per document; only paid when a cross-field validator exists
        ents_df = mods.groupBy(id_col).agg(
            F.collect_list(
                F.struct(F.col("op"), F.col("key_path").alias("key"), F.col("value"))
            ).alias("__entries")
        )
        mods = mods.join(ents_df, id_col)
    op = F.col("op")
    per_row = rules["per_row"]
    each_err = rules["each_err"]
    non_optional = rules["non_optional"]

    empty_arr = F.array().cast(T.ArrayType(VIOLATION_SCHEMA))
    base = mods.select(
        F.col(id_col),
        F.array_compact(
            F.concat(
                F.array(per_row),
                F.coalesce(
                    F.when(op.isin(*OPS_PUSH), each_err), empty_arr
                ),
            )
        ).alias("violations"),
    ).select(F.col(id_col), F.explode("violations").alias("violation")).select(
        id_col, "violation.*"
    )

    # ---- upsert required-injection -------------------------------------------
    # for upsert $set/$setOnInsert docs: every non-optional key neither set
    # non-null, nor ancestor-created ("a.b" with value ⇒ "a" satisfied),
    # fires required (requiredValidator.ts:41-60 + doValidation.ts:64-70)
    if non_optional:
        set_rows = mods.where(
            F.col("upsert") & F.col("op").isin(*OPS_SET)
        )
        # keys explicitly set — even to null — are never INJECTED (an explicit
        # null already fires required through the per-row rule; injecting too
        # would duplicate it); ancestor-creating credit needs a real value
        present_any = (
            set_rows.select(F.col(id_col), _generic_key(F.col("key_path")).alias("k"))
            .distinct()
        )
        present = (
            set_rows.where(~_is_json_null(F.col("value")))
            .select(F.col(id_col), _generic_key(F.col("key_path")).alias("k"))
            .distinct()
        )
        upsert_docs = set_rows.select(id_col).distinct()
        keys_df = upsert_docs.sparkSession.createDataFrame(
            [(k,) for k in non_optional if "$" not in k], "k string"
        )
        needed = upsert_docs.crossJoin(F.broadcast(keys_df))
        satisfied = present.select(
            id_col, F.explode(
                F.array_union(
                    F.array(F.col("k")),
                    # ancestor-creating: a.b.c with value satisfies a and a.b
                    F.slice(
                        F.transform(
                            F.sequence(F.lit(1), F.size(F.split(F.col("k"), "\\."))),
                            lambda n: F.array_join(F.slice(F.split(F.col("k"), "\\."), 1, n), "."),
                        ),
                        1,
                        F.greatest(F.size(F.split(F.col("k"), "\\.")) - 1, F.lit(0)),
                    ),
                )
            ).alias("k")
        ).distinct().unionByName(present_any).distinct()
        missing = needed.join(satisfied, on=[id_col, "k"], how="left_anti")
        upsert_viols = missing.select(
            F.col(id_col),
            F.col("k").alias("name"),
            F.lit(ErrorTypes.REQUIRED).alias("type"),
            F.lit(None).cast("string").alias("value"),
            *[F.lit(None).cast("string").alias(c) for c in
              ("dataType", "min", "max", "regExp", "minCount", "maxCount")],
        )
        base = base.unionByName(upsert_viols)

    return base


def clean_modifier_table(
    mods: DataFrame,
    schema: SimpleSchema,
    *,
    id_col: str = "doc_id",
    filter: bool | None = None,  # noqa: A002
    auto_convert: bool | None = None,
    trim_strings: bool | None = None,
    remove_empty_strings: bool | None = None,
    remove_nulls_from_arrays: bool | None = None,
    get_auto_values: bool | None = None,
) -> DataFrame:
    """clean() for modifier tables (reference clean.ts:64-147,175-187).

    Per-row, one projection:

    - ops whose values are never cleaned ($unset/$currentDate, plus
      $rename/$slice by engine choice) pass through untouched
      (operatorsToIgnoreValue, clean.ts:11,69)
    - filter: rows whose generic key the schema doesn't allow are DROPPED
      (clean.ts:80-94); $unset/$rename rows are kept regardless
    - autoConvert: JSON scalars coerced toward the key's first type when no
      alternative matches (string→number, number/bool→string,
      'true'/'false'→bool; convertToProperType.ts:11-65).  For array keys
      with a declared item def, values under $push/$addToSet (direct and
      ``$each``), $pull, $pop, $pullAll, and array-valued $set are cleaned
      toward the ITEM def (mongo-object maps those nodes to ``key.$`` —
      goldens clean.tests.ts:380-630,706-820), $pull query objects pass
      through, and a scalar $set on an array key is wrapped ``[v]``
      (convertToProperType.ts:61)
    - trimStrings: JS-whitespace trim inside JSON string values unless the
      key has ``trim: False`` (item values use the item def's flag)
    - removeNullsFromArrays: null elements dropped from cleaned arrays
      (clean.ts:81-83, default off, matching the reference)
    - removeEmptyStrings: ``$set`` of ``""`` becomes ``$unset``
      (clean.ts:126-142); other operators keep empty strings, as the
      reference only applies this inside docs and ``$set``
    - getAutoValues: for upsert documents, every defaultValue key not
      referenced by any operator gains a ``$setOnInsert`` row
      (getDefaultAutoValueFunction, SimpleSchema.ts:1148-1167; tested by
      test/clean/defaultValue.tests.ts upsert cases)

    "Empty operator removal" (clean.ts:175-187) is inherent to the long
    format: removing the last row of an operator removes the operator.
    """
    from .schema.types import Boolean as BoolTok, Number as NumTok
    from .cleaning import resolve_clean_options

    opts = resolve_clean_options(
        schema,
        filter=filter,
        auto_convert=auto_convert,
        trim_strings=trim_strings,
        remove_empty_strings=remove_empty_strings,
        remove_nulls_from_arrays=remove_nulls_from_arrays,
        get_auto_values=get_auto_values,
    )
    filter = opts["filter"]  # noqa: A001
    auto_convert = opts["auto_convert"]
    trim_strings = opts["trim_strings"]
    remove_empty_strings = opts["remove_empty_strings"]
    remove_nulls_from_arrays = opts["remove_nulls_from_arrays"]
    get_auto_values = opts["get_auto_values"]

    comp = _ModifierCompiler(schema)
    op = F.col("op")
    key_path = F.col("key_path")
    generic = _generic_key(key_path)
    v = F.col("value")

    # reference operatorsToIgnoreValue = ['$unset', '$currentDate']
    # (clean.ts:11,69) — $pull/$pullAll/$pop values ARE cleaned toward the
    # item definition (their nodes map to `key.0` → generic `key.$` via
    # mongo-object's appendAffectedKey; goldens: clean.tests.ts $pull/$pop/
    # $pullAll "type conversion works" + the trim sweep at :706).  $rename
    # stays skipped here: its value is a target KEY NAME, and trimming it
    # like a data value is reference behavior we deliberately don't copy.
    ignore_value_ops = op.isin("$unset", "$rename", "$currentDate", "$slice")

    # ---- filter unknown keys (keep $unset/$rename) --------------------------
    if filter:
        allowed_keys = set(comp.merged.keys())
        allowed = generic.isin(*allowed_keys) if allowed_keys else F.lit(False)
        for bb in schema.blackbox_keys():
            allowed = allowed | generic.startswith(bb + ".")
        # item paths (tags.0) and $each forms target the array key itself
        mods = mods.where(allowed | op.isin("$unset", "$rename"))

    # ---- per-key value cleaning ---------------------------------------------
    def clean_token(k: str, token: Column) -> Column:
        """autoConvert + trim for one JSON token checked against key ``k``."""
        alts = comp._alternatives(k) if k in comp.merged else []
        if not alts or any(
            a.get("blackbox") is True or a.get("type") is AnyType for a in alts
        ):
            return token
        first = alts[0].get("type")
        expr = token
        if auto_convert:
            if first is String:
                # number/bool JSON → quoted string (toString parity);
                # ext-date → quoted ISO payload (reference Date.toString —
                # ISO-8601 is this engine's canonical date rendering)
                expr = F.when(
                    _is_json_number(expr) | _is_json_bool(expr),
                    F.concat(F.lit('"'), F.trim(expr), F.lit('"')),
                ).when(
                    _is_ext_date(expr),
                    _json_quote(F.from_json(expr, "`$date` string").getField("$date")),
                ).otherwise(expr)
            elif first in (NumTok, Integer):
                parsed = _json_str(expr)
                num = parsed.try_cast("double")
                expr = F.when(
                    _is_json_string(expr) & (F.length(parsed) > 0) & num.isNotNull(),
                    F.when(num == F.floor(num), num.cast("long").cast("string"))
                    .otherwise(num.cast("string")),
                ).otherwise(expr)
            elif first is BoolTok:
                lowered = F.lower(_json_str(expr))
                expr = F.when(
                    _is_json_string(expr) & lowered.isin("true", "false"), lowered
                ).otherwise(expr)
            if len(alts) > 1:
                # oneOf: convert only when the token matches NO alternative
                # (clean.ts:101 gates on !isValueTypeValid over ALL defs)
                expr = F.when(
                    _token_matches_alternatives(alts, token), token
                ).otherwise(expr)
        if trim_strings and not any(a.get("trim") is False for a in alts):
            from .cleaning import js_trim

            # decode → trim → RE-ENCODE with proper JSON escaping (a naive
            # quote wrap corrupts values containing '"' or '\')
            expr = F.when(
                _is_json_string(expr),
                _json_quote(js_trim(_json_str(expr))),
            ).otherwise(expr)
        return expr

    def clean_object_value(k: str, token: Column) -> Column:
        """Rebuild an object-valued $set token with each DECLARED child
        cleaned (recursively for nested declared objects), empty-string
        children removed, and — matching the reference's `filter` —
        unknown children dropped (clean.ts:80-94 runs before the value
        transforms).  Returns the original token for non-object input."""
        prefix = f"{k}."
        child_names = sorted(
            {c[len(prefix):].split(".")[0] for c in comp.merged if c.startswith(prefix)}
        )
        # try_parse_json: malformed '{...' input is returned untouched (the
        # var.isNotNull() guard below) instead of crashing the projection
        var = F.try_parse_json(token)
        fragments = []
        for n in child_names:
            child_key = f"{k}.{n}"
            extracted = F.to_json(
                F.try_variant_get(var, f"$['{n}']", "variant")
            )
            child_alts = comp._alternatives(child_key) if child_key in comp.merged else []
            is_obj_child = any(
                isinstance(a.get("type"), SimpleSchema) or a.get("type") is ObjectType
                for a in child_alts
            ) and not any(a.get("blackbox") is True for a in child_alts)
            cleaned_child = (
                clean_object_value(child_key, extracted)
                if is_obj_child
                else clean_token(child_key, extracted)
            )
            frag = F.concat(F.lit(f'"{n}": '), cleaned_child)
            cond = extracted.isNotNull()
            if remove_empty_strings:
                cond = cond & (cleaned_child != F.lit('""'))
            fragments.append(F.when(cond, frag))
        if not fragments:
            return token
        rebuilt = F.concat(
            F.lit("{"),
            F.concat_ws(", ", F.array_compact(F.array(*fragments))),
            F.lit("}"),
        )
        return F.when(
            _is_json_object(token) & ~_is_ext_date(token) & var.isNotNull(),
            rebuilt,
        ).otherwise(token)

    # ---- array-item value cleaning helpers ----------------------------------
    # element tokens come out of a variant parse (exact JSON round-trip,
    # heterogeneous element types preserved); cleaning runs per element
    # inside the transform lambda as pure Catalyst expressions
    def _cleaned_elements(item_key: str, elems: Column) -> Column:
        out_elems = F.transform(
            elems,
            lambda e: F.coalesce(clean_token(item_key, e), F.lit("null")),
        )
        if remove_nulls_from_arrays:
            out_elems = F.filter(out_elems, lambda e: e != F.lit("null"))
        return out_elems

    def _clean_array_value(item_key: str, token: Column) -> Column:
        elems = F.transform(
            F.try_variant_get(F.try_parse_json(token), "$", "array<variant>"),
            lambda e: F.to_json(e),
        )
        rebuilt = F.concat(
            F.lit("["),
            F.concat_ws(", ", _cleaned_elements(item_key, elems)),
            F.lit("]"),
        )
        return F.when(elems.isNotNull(), rebuilt).otherwise(token)

    def _clean_each_value(item_key: str, token: Column) -> Column:
        var = F.try_parse_json(token)
        elems = F.transform(
            F.try_variant_get(var, "$['$each']", "array<variant>"),
            lambda e: F.to_json(e),
        )
        frags = [
            F.concat(
                F.lit('"$each": ['),
                F.concat_ws(", ", _cleaned_elements(item_key, elems)),
                F.lit("]"),
            )
        ]
        # $push sub-operators riding alongside $each survive the rebuild
        for sub in ("$slice", "$position", "$sort"):
            sv = F.to_json(F.try_variant_get(var, f"$['{sub}']", "variant"))
            frags.append(
                F.when(sv.isNotNull(), F.concat(F.lit(f'"{sub}": '), sv))
            )
        rebuilt = F.concat(
            F.lit("{"),
            F.concat_ws(", ", F.array_compact(F.array(*frags))),
            F.lit("}"),
        )
        return F.when(elems.isNotNull(), rebuilt).otherwise(token)

    is_arr_tok = v.rlike(r"^\s*\[")
    is_obj_tok = v.rlike(r"^\s*\{")
    is_each_tok = v.rlike(r'^\s*\{\s*"\$each"')

    cleaned = v
    object_keys = []
    for k in comp.merged:
        if k.endswith(".$"):
            continue
        alts = comp._alternatives(k)
        if any(a.get("blackbox") is True or a.get("type") is AnyType for a in alts):
            continue
        if any(
            isinstance(a.get("type"), SimpleSchema) or a.get("type") is ObjectType
            for a in alts
        ):
            object_keys.append(k)
            continue
        item_key = f"{k}.$"
        if item_key in comp.merged:
            item_alts = comp._alternatives(item_key)
            if any(
                a.get("blackbox") is True or a.get("type") is AnyType
                for a in item_alts
            ):
                continue
            scalar_item = clean_token(item_key, v)
            per_op = (
                F.when(
                    op.isin(*OPS_PUSH) & is_each_tok,
                    _clean_each_value(item_key, v),
                )
                .when(
                    op.isin(*OPS_PUSH) & ~is_obj_tok & ~is_arr_tok, scalar_item
                )
                # $pull/$pop scalars clean toward the item def; $pull match
                # queries and plain-object items pass through untouched
                # (convertToProperType.ts:13-20 early-returns objects)
                .when(
                    op.isin("$pull", "$pop") & ~is_obj_tok & ~is_arr_tok,
                    scalar_item,
                )
                .when(
                    (op == F.lit("$pullAll")) & is_arr_tok,
                    _clean_array_value(item_key, v),
                )
                .when(
                    op.isin(*OPS_SET) & is_arr_tok,
                    _clean_array_value(item_key, v),
                )
            )
            if auto_convert:
                # scalar $set on an array key wraps the RAW token — the
                # reference wraps during autoConvert and never revisits the
                # new element node (convertToProperType.ts:61)
                per_op = per_op.when(
                    op.isin(*OPS_SET)
                    & ~is_arr_tok
                    & ~_is_json_null(v)
                    & (~is_obj_tok | _is_ext_date(v)),
                    F.concat(F.lit("["), v, F.lit("]")),
                )
            cleaned = F.when(generic == k, per_op.otherwise(v)).otherwise(cleaned)
            continue
        cleaned = F.when(generic == k, clean_token(k, v)).otherwise(cleaned)
    # object-valued $set: clean inside the value (declared children only —
    # dynamic names can't be extracted with literal variant paths, and with
    # filter=True the reference drops them anyway)
    if filter:
        for k in object_keys:
            cleaned = F.when(
                (generic == k) & op.isin(*OPS_SET),
                clean_object_value(k, v),
            ).otherwise(cleaned)

    out = mods.withColumn(
        "value", F.when(ignore_value_ops, v).otherwise(cleaned)
    )

    if remove_empty_strings:
        is_empty_str = F.regexp_replace(F.col("value"), "\\s", "") == F.lit('""')
        # $set '' → $unset (clean.ts:126-142); the reference applies
        # removeEmptyStrings only inside docs and $set, so empty strings
        # under every other operator are kept as-is
        out = out.withColumn(
            "op",
            F.when((F.col("op") == "$set") & is_empty_str, F.lit("$unset")).otherwise(
                F.col("op")
            ),
        )

    if get_auto_values:
        # defaultValue keys now run inside _apply_modifier_auto_values
        # through the same position machinery as opaque autoValue fns —
        # upsert $setOnInsert, injection into $set objects / pushed items,
        # and parent-creating dotted paths (defaultValue.tests.ts:229-514)
        out = _apply_modifier_auto_values(out, schema, id_col)
    return out


class _ModifierAutoValueContext:
    """Per-document autoValue context for modifier cleaning — mirrors the
    reference AutoValueRunner context in modifier mode
    (src/clean/AutoValueRunner.ts:42-147): ``value``/``is_set`` from the
    key's operator entry, ``operator`` (the entry's op, ``$set`` for
    unreferenced keys — reference positions generated for missing keys),
    ``is_upsert``, ``field()``/``sibling_field()`` resolved from the
    document's other operator entries, and ``unset()``."""

    # shared sentinel (class → pickles by reference, identity-stable on
    # executors); bound lazily to avoid a module-level cleaning import
    @property
    def UNCHANGED(self):
        from .cleaning import PythonAutoValueContext

        return PythonAutoValueContext.UNCHANGED

    __slots__ = ("key", "value", "operator", "is_upsert", "_ents", "_unset",
                 "_is_set")

    def __init__(self, key, value, is_set, ents, upsert, operator):
        self.key = key
        self.value = value
        self._is_set = is_set
        self._ents = ents
        self.is_upsert = upsert
        self.operator = operator
        self._unset = False

    @property
    def is_set(self) -> bool:
        return self._is_set

    def unset(self) -> None:
        self._unset = True

    def field(self, path: str):
        ent = self._ents.get(path)
        if ent is None or ent[0] not in _VALUE_OPS:
            return None
        return _decode_token(ent[1])

    def sibling_field(self, name: str):
        parent, _, _ = self.key.rpartition(".")
        return self.field(f"{parent}.{name}" if parent else name)

    def parent_field(self):
        parent, _, _ = self.key.rpartition(".")
        return self.field(parent) if parent else None


#: operators whose entries carry a usable value for autoValue contexts
_VALUE_OPS = frozenset(
    ("$set", "$setOnInsert", "$inc", "$push", "$addToSet", "$min", "$max",
     "$mul")
)


def _decode_token(tok):
    if tok is None:
        return None
    try:
        return json.loads(tok)
    except ValueError:
        return None


def _eval_optional(d: dict) -> bool:
    """Callable ``optional`` definitions evaluate like the fixed-column
    compiler (compiler/compile.py:401-403): ``bool(optional())``."""
    opt = d.get("optional", False)
    return bool(opt()) if callable(opt) else bool(opt)


def _decode_entry_row(entries) -> dict:
    """Decode a document's operator entries into a {key: value} dict for
    cross-field FieldContext lookups (value-carrying ops only, first
    entry per key wins).  ``entries`` arrives as a numpy array — test
    ``is None``, never truthiness."""
    row: dict = {}
    if entries is None:
        return row
    for e in entries:
        if e["op"] in _VALUE_OPS and e["key"] not in row:
            row[e["key"]] = _decode_token(e["value"])
    return row


def _each_merge_udf(fns, item_key: str):
    """$each + Python item validators: per-element merge of the expression
    violations (built-in + @spark_rule, already computed JVM-side) with the
    Python validators' verdicts — one Arrow UDF per array key, because UDF
    results cannot be referenced inside higher-order-function lambdas."""
    from .compiler.compile import _wants_context
    from .errors import VIOLATION_FIELDS
    from .validation import FieldContext

    wants = [_wants_context(fn) for fn in fns]
    field_names = [nm for nm, _ in VIOLATION_FIELDS]

    def run(expr_viols, tokens, name, entries):
        if tokens is None:
            return []
        row = _decode_entry_row(entries)
        out = []
        for i, tok in enumerate(tokens):
            ev = None
            if expr_viols is not None and i < len(expr_viols):
                ev = expr_viols[i]
                if ev is not None and ev.get("type") is None:
                    ev = None
            if ev is not None:
                out.append(ev)
                continue
            val = _decode_token(tok)
            for fn, w in zip(fns, wants):
                et = fn(val, FieldContext(item_key, val, row)) if w else fn(val)
                if et is not None:
                    viol = dict.fromkeys(field_names)
                    viol["name"] = name
                    viol["type"] = et
                    # mirror jsondoc._display_token: unquote quoted tokens
                    # that decode to a string; a malformed quoted token
                    # (decodes to None) falls back to the trimmed token
                    # rather than the literal "None"
                    if (tok or "").lstrip().startswith('"'):
                        viol["value"] = val if isinstance(val, str) else tok.strip()
                    else:
                        viol["value"] = tok.strip() if tok else tok
                    out.append(viol)
                    break
        return out

    def _apply(expr: pd.Series, arrs: pd.Series, names: pd.Series,
               ents: pd.Series) -> pd.Series:
        return pd.Series(
            [run(e, a, n, en) for e, a, n, en in zip(expr, arrs, names, ents)],
            dtype=object,
        )

    return F.pandas_udf(_apply, T.ArrayType(VIOLATION_SCHEMA))


class _Skip:
    """Sentinel: positional autoValue returned UNCHANGED (class, not
    instance — identity survives pickling to executors)."""


class _Remove:
    """Sentinel: positional autoValue called ctx.unset() — remove the
    field / null the element / drop the entry."""


def _apply_modifier_auto_values(
    out: DataFrame, schema: SimpleSchema, id_col: str
) -> DataFrame:
    """Run opaque Python autoValue fns against a modifier table, including
    PSEUDO-MODIFIER returns (reference AutoValueRunner.ts:112-142): a fn may
    return ``{"$inc": 1}`` / ``{"$push": ...}`` and the returned operator
    replaces the key's current entry; a plain return sets the value under
    the key's existing operator (``$set`` when unreferenced).  Contract
    matches document mode: ``ctx.UNCHANGED`` = leave as is, ``None`` sets
    JSON null, ``ctx.unset()`` removes the entry.

    AutoValue keys under arrays (``a.$.b``) run POSITIONALLY (reference
    getPositionsForAutoValue.ts:43-148): the fn is applied inside matching
    entries' decoded JSON — per element of a whole-array ``$set``, to the
    pushed item (or each ``$each`` item) of ``$push``/``$addToSet``, and to
    positional/indexed keys (``a.$.b``, ``a.0.b``) directly.  When NO
    entry touches the key's subtree (unrelated update, or a sibling-leaf
    ``$set`` like ``a.0.x`` for field ``a.$.y``) the fn still runs once
    against a synthesized would-be ``$set[<generic key>]`` position —
    skipped for upserts — matching getPositionsForAutoValue.ts:135-147.
    Only plain Python fns run positionally (@spark_auto_value expression
    fns need a Column context and are document-mode only).

    Shape: ONE groupBy(doc) collecting the (bounded, schema-sized) operator
    entries + ONE Arrow-batched UDF evaluating every autoValue fn per doc +
    one co-partitioned anti-join to drop replaced entries."""
    av_fns = [
        ("fn", k, fn, ".$" in k)
        for k, fn in schema.auto_value_functions()
        if not getattr(fn, "is_default", False)
        and ("$" not in k or ".$" in k)
        and not (".$" in k and getattr(fn, "_is_spark_auto_value", False))
    ]
    # defaultValue keys run through the SAME per-doc position machinery as
    # opaque fns (the reference models defaultValue as an autoValue,
    # getDefaultAutoValueFunction SimpleSchema.ts:1148-1167); parents-first
    # ordering lets a parent's emitted {} compose its children's defaults
    av_fns += [
        ("default", k, getattr(fn, "default_value", None), False)
        for k, fn in schema.auto_value_functions()
        if getattr(fn, "is_default", False)
    ]
    if not av_fns:
        return out
    av_fns.sort(key=lambda kv: kv[1].count("."))
    from .cleaning import PythonAutoValueContext

    unchanged = PythonAutoValueContext.UNCHANGED

    act_t = T.ArrayType(
        T.StructType(
            [
                T.StructField("key", T.StringType()),
                T.StructField("drop", T.BooleanType()),
                T.StructField("op", T.StringType()),
                T.StructField("value", T.StringType()),
            ]
        )
    )

    def run_scalar(k, fn, ents, upsert):
        op0, tok = ents.get(k, (None, None))
        is_set = op0 in _VALUE_OPS
        val = _decode_token(tok) if is_set else None
        ctx = _ModifierAutoValueContext(
            k, val, is_set, ents, bool(upsert), op0 or "$set"
        )
        res = fn(ctx)
        if res is not unchanged:
            if isinstance(res, dict) and any(
                str(p).startswith("$") for p in res
            ):
                new_op = next(p for p in res if str(p).startswith("$"))
                # _default_as_json, not json.dumps: the reference's
                # canonical createdAt pattern returns
                # {"$setOnInsert": new Date()} (AutoValueRunner.ts:112-142)
                # and datetimes must take the extended-JSON path
                ents[k] = (new_op, _default_as_json(res[new_op]))
            else:
                new_op = op0 if op0 in _VALUE_OPS else "$set"
                ents[k] = (new_op, _default_as_json(res))
        elif ctx._unset:
            ents.pop(k, None)

    def run_array(g, fn, ents, upsert):
        segs = g.split(".")

        def run_fn(value, op0, present):
            # is_set reflects POSITION PRESENCE (reference isSet = value
            # !== undefined): a field explicitly set to JSON null is
            # still set — only an absent key reports is_set False
            ctx = _ModifierAutoValueContext(
                g, value, present, ents, bool(upsert), op0
            )
            res = fn(ctx)
            if res is unchanged:
                return _Remove if ctx._unset else _Skip
            if ctx._unset:
                return _Remove
            return res

        def apply_at(value, path, op0, present=True):
            if not path:
                return run_fn(value, op0, present)
            seg = path[0]
            if seg == "$":
                if not isinstance(value, list):
                    return _Skip
                new = []
                any_change = False
                for el in value:
                    r = apply_at(el, path[1:], op0)
                    if r is _Skip:
                        new.append(el)
                    else:
                        any_change = True
                        # unset of an element of a value being SET nulls it
                        # in place (removal would shift sibling indices)
                        new.append(None if r is _Remove else r)
                return new if any_change else _Skip
            if not isinstance(value, dict):
                return _Skip
            cur = value.get(seg)
            if len(path) > 1 and not isinstance(cur, (dict, list)):
                # missing intermediate containers are NOT auto-created
                return _Skip
            r = apply_at(cur, path[1:], op0, present=seg in value)
            if r is _Skip:
                return _Skip
            d = dict(value)
            if r is _Remove:
                d.pop(seg, None)
            else:
                d[seg] = r
            return d

        matched = False
        for k in list(ents):
            op0, tok = ents[k]
            kseg = k.split(".")
            if len(kseg) > len(segs):
                continue
            if not all(
                gs == ks or (gs == "$" and (ks == "$" or ks.isdigit()))
                for gs, ks in zip(segs, kseg)
            ):
                continue
            matched = True
            remaining = segs[len(kseg):]
            decoded = _decode_token(tok)
            if op0 in ("$push", "$addToSet"):
                # the entry value is ONE element (or $each items): the
                # leading `$` of the remaining generic path is implicit
                if not remaining or remaining[0] != "$":
                    continue
                rest = remaining[1:]
                if isinstance(decoded, dict) and isinstance(
                    decoded.get("$each"), list
                ):
                    # unset of a pushed item means "don't push it" — DROP
                    # the item, mirroring the plain-$push branch dropping
                    # the whole entry (the two one-item syntaxes agree)
                    items, any_change = [], False
                    for it in decoded["$each"]:
                        r = apply_at(it, rest, op0)
                        if r is _Skip:
                            items.append(it)
                        elif r is _Remove:
                            any_change = True
                        else:
                            any_change = True
                            items.append(r)
                    if any_change:
                        new = dict(decoded)
                        new["$each"] = items
                        ents[k] = (op0, _encode_json_value(new))
                else:
                    r = apply_at(decoded, rest, op0)
                    if r is _Remove:
                        ents.pop(k, None)
                    elif r is not _Skip:
                        ents[k] = (op0, _encode_json_value(r))
            elif op0 in ("$set", "$setOnInsert"):
                r = apply_at(decoded, remaining, op0)
                if r is _Remove:
                    ents.pop(k, None)
                elif r is not _Skip:
                    ents[k] = (op0, _encode_json_value(r))
        if not matched and not upsert:
            # would-be position (getPositionsForAutoValue.ts:135-147): no
            # entry touches this key's subtree — not even partially, like
            # a $set on a SIBLING leaf (`a.0.x` for field `a.$.y`, whose
            # parent path ends in `.$` so no creating position exists) —
            # yet the fn still runs ONCE, unset, under a synthesized
            # `$set[<generic key>]` position.  The `$` stays generic in
            # the emitted key, exactly as the reference's
            # setValueForPosition('$set[a.$.y]') leaves it
            # (AutoValueRunner.ts:137-146); upserts skip it.
            res = run_fn(None, "$set", False)
            if res is not _Skip and res is not _Remove:
                if isinstance(res, dict) and any(
                    str(p).startswith("$") for p in res
                ):
                    new_op = next(p for p in res if str(p).startswith("$"))
                    ents[g] = (new_op, _default_as_json(res[new_op]))
                else:
                    ents[g] = ("$set", _default_as_json(res))

    def _seg_match(gs, ks):
        return gs == ks or (gs == "$" and (ks == "$" or ks.isdigit()))

    def _rel(ks, segs):
        """entry key segs vs generic field segs: 'eq' (same position),
        'extends' (entry creates the field's objects), 'prefix' (the field
        lives inside the entry's value), or None (unrelated)."""
        m = min(len(ks), len(segs))
        if not all(_seg_match(segs[i], ks[i]) for i in range(m)):
            return None
        if len(ks) == len(segs):
            return "eq"
        return "extends" if len(ks) > len(segs) else "prefix"

    def _leaf_slots(value, path):
        """(container_dict, leaf_name) pairs for `path` resolved inside a
        decoded JSON value — one per array element for `$` segments;
        missing intermediates yield no slot (mongo-object position
        semantics: only EXISTING parents give child positions)."""
        if not path:
            return []
        if len(path) == 1:
            return [(value, path[0])] if isinstance(value, dict) else []
        seg = path[0]
        if seg == "$":
            if not isinstance(value, list):
                return []
            out = []
            for el in value:
                out.extend(_leaf_slots(el, path[1:]))
            return out
        if isinstance(value, dict) and seg in value:
            return _leaf_slots(value[seg], path[1:])
        return []

    def run_default(g, dv, ents, upsert):
        """Replay getDefaultAutoValueFunction × getPositionsForAutoValue
        (SimpleSchema.ts:1148-1167, getPositionsForAutoValue.ts:42-148)
        over the entry dict: inject into objects whose parent position is
        set ($set objects, $push/$addToSet items), emit dotted
        $setOnInsert rows on upsert when some entry creates the parent
        path, $setOnInsert for unreferenced top-level keys on upsert."""
        import copy

        segs = g.split(".")
        leaf = segs[-1]
        if g in ents:  # exact entry (any op, incl. $unset) → isSet/done
            return
        slot_entries = []  # (entry_key, op0, root, slots)
        for k in list(ents):
            op0, tok = ents[k]
            if op0 not in _VALUE_OPS:
                continue
            ks = k.split(".")
            r = _rel(ks, segs)
            if r in ("eq", "extends"):
                # a real position exists (isSet → fn returns early) or the
                # entry creates this key (no position → fn never runs)
                return
            if r == "prefix":
                remaining = segs[len(ks):]
                decoded = _decode_token(tok)
                if op0 in ("$push", "$addToSet"):
                    if remaining[0] != "$":
                        continue
                    rest = remaining[1:]
                    if not rest:
                        return  # the pushed element IS the field → set
                    if isinstance(decoded, dict) and isinstance(
                        decoded.get("$each"), list
                    ):
                        roots = decoded["$each"]
                        root_obj = decoded
                    else:
                        roots = [decoded]
                        root_obj = decoded
                else:
                    rest = remaining
                    roots = [decoded]
                    root_obj = decoded
                slots = []
                for rt in roots:
                    slots.extend(_leaf_slots(rt, rest))
                if slots:
                    slot_entries.append((k, op0, root_obj, slots))
        if slot_entries:
            # parent positions exist → inject the default where absent
            for k, op0, root, slots in slot_entries:
                changed = False
                for cont, lf in slots:
                    if lf not in cont:
                        cont[lf] = copy.deepcopy(dv)
                        changed = True
                if changed:
                    ents[k] = (op0, _encode_json_value(root))
            return
        if len(segs) == 1:
            # top-level would-be $set[g]: parent (root) unset → upsert only
            if upsert:
                ents[g] = ("$setOnInsert", _default_as_json(dv))
            return
        if segs[-2] == "$":
            return  # parentPath ends '.$' → no creating-position synthesis
        parent_segs = segs[:-1]
        for k in list(ents):
            op0, _tok = ents[k]
            if op0 not in _VALUE_OPS:
                continue
            ks = k.split(".")
            if _rel(ks, parent_segs) == "extends":
                # would-be $set[<concrete parent>.<leaf>]: parent unset →
                # {$setOnInsert: default} on upsert, dotted path notation
                concrete = ".".join(ks[: len(parent_segs)] + [leaf])
                if upsert and concrete not in ents:
                    ents[concrete] = ("$setOnInsert", _default_as_json(dv))
                return

    def run(entries, upsert):
        ents = {}
        for e in entries:
            ents.setdefault(e["key"], (e["op"], e["value"]))
        orig = dict(ents)
        for kind, k, fn, is_array in av_fns:
            if kind == "default":
                run_default(k, fn, ents, upsert)
            elif is_array:
                run_array(k, fn, ents, upsert)
            else:
                run_scalar(k, fn, ents, upsert)
        acts = []
        for k, (op_, val_) in ents.items():
            if k not in orig:
                acts.append({"key": k, "drop": False, "op": op_, "value": val_})
            elif orig[k] != (op_, val_):
                acts.append({"key": k, "drop": True, "op": op_, "value": val_})
        for k in orig:
            if k not in ents:
                acts.append({"key": k, "drop": True, "op": None, "value": None})
        return acts

    def _apply(entries: pd.Series, upserts: pd.Series) -> pd.Series:
        return pd.Series(
            [run(e, u) for e, u in zip(entries, upserts)], dtype=object
        )

    udf = F.pandas_udf(_apply, act_t)

    docs = out.groupBy(id_col).agg(
        F.collect_list(
            F.struct(
                F.col("op"), F.col("key_path").alias("key"), F.col("value")
            )
        ).alias("entries"),
        F.max(F.col("upsert").cast("int")).cast("boolean").alias("upsert"),
    )
    acts = (
        docs.select(
            F.col(id_col),
            F.col("upsert"),
            F.explode(udf(F.col("entries"), F.col("upsert"))).alias("a"),
        )
        .select(id_col, "upsert", "a.*")
        # lazy persist: drops and new_rows are subtrees of the caller's
        # single action — the first stage populates the cache
        .persist()
    )
    drops = acts.where(F.col("drop")).select(id_col, F.col("key").alias("key_path"))
    kept = out.join(drops, [id_col, "key_path"], "left_anti")
    new_rows = acts.where(F.col("op").isNotNull()).select(
        F.col(id_col),
        F.col("op"),
        F.col("key").alias("key_path"),
        F.col("value"),
        F.col("upsert"),
    )
    return kept.unionByName(new_rows.select(*out.columns))


def _default_as_json(value: Any) -> str:
    """Encode a driver-side defaultValue as the table's JSON value form —
    same encoder as :func:`_encode_json_value` (one extended-JSON policy
    for both the $setOnInsert-default and positional-rebuild families)."""
    return _encode_json_value(value)


def _encode_json_value(value: Any) -> str:
    """json.dumps with extended-JSON datetimes at ANY nesting depth —
    positional autoValues rebuild arbitrary JSON structures whose leaves
    may be datetime returns."""
    import datetime as _dt

    def _default(o):
        if isinstance(o, _dt.datetime):
            return {"$date": o.isoformat()}
        raise TypeError(
            f"autoValue returned unencodable {type(o).__name__!r}"
        )

    return json.dumps(value, default=_default)
