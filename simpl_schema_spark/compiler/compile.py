"""Schema → Spark expression compiler.

Compiles a :class:`~simpl_schema_spark.schema.SimpleSchema` against a concrete
DataFrame schema into ONE Catalyst projection producing an
``array<violation>`` column per row.  No shuffles, no row-at-a-time Python:
the entire validator chain — required decision table, per-type checks
(bounds/regex/NaN/integer), allowedValues, oneOf dispatch, array-item
recursion with per-index violation naming — is pure Spark SQL expressions
(higher-order functions for arrays), so whole-stage codegen fuses it with the
scan.  Opaque Python ``custom`` validators ride Arrow-vectorized pandas UDFs.

Semantics parity map (reference = longshotlabs/simpl-schema):

- validator chain order [required, type, allowedValues, custom, schema
  validators, global validators]: ``src/validation/validateField.ts:192-226``
  → per-key ordered ``F.coalesce`` (first non-null violation wins, which also
  reproduces the one-error-per-key dedupe of ``src/doValidation.ts:115-124``).
- required decision table: ``src/validation/requiredValidator.ts:13-61``;
  missing-object promotion (required descendants of a missing *required*
  object fire; of a missing *optional* object don't):
  ``src/validation/validateField.ts:313-321`` → the ``opt_gate`` conjunction
  of ``isNotNull`` over *optional* ancestors only.
- type checks: ``src/validation/typeValidator/*.ts`` (string max-before-min
  order, NaN rejection, ``Number.isInteger(5.0) === true``, exclusive bounds,
  date payload as YYYY-MM-DD, minCount/maxCount).
- oneOf: first matching alternative wins, errors reported from the LAST
  alternative: ``src/validation/validateField.ts:171-256`` → CASE WHEN.
- ``SimpleSchema.Any`` / ``blackbox: true`` subtrees: no rules compiled
  (``src/validation/validateField.ts:112-113,174-175``).
- per-item array violations named with concrete indexes (``friends.0.name``):
  ``src/validation/validateField.ts:293-306`` → ``F.transform`` with index
  lambda; flatten.
"""

from __future__ import annotations

import datetime
import inspect
from dataclasses import dataclass, field
from functools import reduce
from typing import Any, Callable, Optional

from pyspark.sql import Column, functions as F, types as T

from ..errors import ErrorTypes, VIOLATION_FIELDS, VIOLATION_SCHEMA
from ..schema.definition import make_key_generic
from ..schema.schema import SimpleSchema
from ..schema.types import (
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
from .regex import js_regex_repr, to_java_regex

__all__ = ["RuleCompiler", "compile_violations", "spark_rule"]

# Plan-construction cost note (guide §1.2 step 2 applied to the DRIVER):
# schema compilation issues thousands of py4j round-trips (~0.14 ms each)
# building Column fragments; the fragments below are identical every time
# (unbound literal expressions — immutable Catalyst trees, safe to share
# across parents and across queries), so they are built once per process.
# Data-size-independent, but at bench scale construction was ~60% of the
# validate-family wall (measured 1.0s construct vs 0.6s run at sf0.1).
from functools import lru_cache


@lru_cache(maxsize=None)
def _null_str() -> Column:
    return F.lit(None).cast("string")


@lru_cache(maxsize=None)
def _null_str_alias(fname: str) -> Column:
    return _null_str().alias(fname)


@lru_cache(maxsize=None)
def _errtype_lit(errtype: str) -> Column:
    return F.lit(errtype).cast("string").alias("type")


@lru_cache(maxsize=None)
def _null_violation() -> Column:
    return F.lit(None).cast(VIOLATION_SCHEMA)


def violation(
    name: Column,
    errtype: "Column | str",
    value: Optional[Column] = None,
    dataType: "Column | str | None" = None,
    min: "Column | str | None" = None,  # noqa: A002
    max: "Column | str | None" = None,  # noqa: A002
    regExp: "Column | str | None" = None,
    minCount: "Column | str | None" = None,
    maxCount: "Column | str | None" = None,
) -> Column:
    """Build a violation struct with canonical field order/types."""
    extras = {
        "dataType": dataType,
        "min": min,
        "max": max,
        "regExp": regExp,
        "minCount": minCount,
        "maxCount": maxCount,
    }
    if value is None:
        value = _null_str()
    cols = [
        name.cast("string").alias("name"),
        _errtype_lit(errtype)
        if isinstance(errtype, str)
        else errtype.cast("string").alias("type"),
        value.cast("string").alias("value"),
    ]
    for fname, v in extras.items():
        if v is None:
            cols.append(_null_str_alias(fname))
        elif isinstance(v, Column):
            cols.append(v.cast("string").alias(fname))
        else:
            cols.append(F.lit(str(v)).alias(fname))
    return F.struct(*cols)


def spark_rule(fn: Callable) -> Callable:
    """Mark a custom validator as a JVM-side Spark rule.

    The function receives ``(value: Column, ctx: RuleContext)`` and returns a
    Column evaluating to an error-type string (or NULL for valid).  This is
    the fast path for custom validators whose logic is expressible in Spark
    SQL — use instead of a Python callable whenever possible.
    """
    fn._is_spark_rule = True  # type: ignore[attr-defined]
    return fn


def _wants_context(fn: Callable) -> bool:
    """True if a Python custom validator takes a (value, ctx) pair.

    One-parameter validators keep the value-only fast path; two-parameter
    ones get the reference's cross-field ValidatorContext.
    """
    try:
        params = [
            p
            for p in inspect.signature(fn).parameters.values()
            if p.kind
            in (p.POSITIONAL_ONLY, p.POSITIONAL_OR_KEYWORD, p.VAR_POSITIONAL)
        ]
    except (TypeError, ValueError):
        return False
    if any(p.kind == p.VAR_POSITIONAL for p in params):
        return True
    return len(params) >= 2


@dataclass
class RuleContext:
    """Compile-time context handed to @spark_rule custom validators.

    Mirrors the reference's ValidatorContext (src/types.ts:230-240):
    ``field``/``sibling_field`` give cross-field access — here they resolve to
    Column expressions, so the whole rule stays JVM-side (conditionally-
    required fields, password-match, etc. compile into the same fused
    projection as the built-in rules).
    """

    key: str                      # generic key path
    name: Column                  # concrete key path (may embed array indexes)
    definition: dict              # resolved alternative definition
    row: Optional[Column] = None  # struct of all top-level columns, if needed

    def field(self, path: str) -> Column:
        """Column for any other document key (reference this.field())."""
        return F.col(path)

    def sibling_field(self, name: str) -> Column:
        """Column for a key sharing this key's parent (this.siblingField())."""
        parent, _, _ = self.key.rpartition(".")
        return F.col(f"{parent}.{name}" if parent else name)


@dataclass
class _PandasRule:
    """A deferred Arrow-vectorized custom validator (row-level keys only).

    ``input_cols`` holds the (dotted) path of the validated leaf value;
    ``context_cols`` — non-empty for two-argument validators — lists the
    additional top-level columns shipped to Python as a struct so the fn's
    context can resolve ``field()``/``sibling_field()`` lookups.
    """

    key: str
    column_name: str              # output column holding error-type string
    fn: Callable                  # pd.Series -> pd.Series[str|None]
    input_cols: list[str] = field(default_factory=list)
    context_cols: list[str] = field(default_factory=list)
    spark_type: T.DataType = field(default_factory=T.StringType)
    # array-item rules: the UDF takes the WHOLE array column and returns
    # array<string> (error type per element) — no explode, no shuffle
    elementwise: bool = False
    item_subpath: str = ""        # path inside each element ('' = the element)
    # nested array-item rules (a.$.b.$.c, arbitrarily deep): path from each
    # array level's element to the NEXT level's array; the UDF returns
    # arrays nested one level per entry+1 (array<string>, array<array<
    # string>>, …) and the nested lambdas pick entries by index per level
    between_subpaths: list[str] = field(default_factory=list)


_NUMERIC_TYPES = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)
_INTEGRAL_TYPES = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
_FRACTIONAL_TYPES = (T.FloatType, T.DoubleType)


def _type_matches(token: TypeToken, dtype: T.DataType) -> bool:
    if token is AnyType:
        return True
    if token is String:
        return isinstance(dtype, T.StringType)
    if token in (Number, Integer):
        return isinstance(dtype, _NUMERIC_TYPES)
    if token is Boolean:
        return isinstance(dtype, T.BooleanType)
    if token is DateType:
        return isinstance(dtype, (T.TimestampType, T.DateType, T.TimestampNTZType))
    if token is ArrayType:
        return isinstance(dtype, T.ArrayType)
    if token is ObjectType:
        return isinstance(dtype, T.StructType)
    if token is Binary:
        return isinstance(dtype, T.BinaryType)
    return False


def _token_name(token: Any) -> str:
    if isinstance(token, SimpleSchema):
        return "Object"
    if isinstance(token, TypeToken):
        if token is Binary:
            return "Uint8Array"  # parity: reference uses the ctor name
        return token.name
    return str(token)


def _date_str(value: Any) -> str:
    """YYYY-MM-DD payload (reference dateToDateString, utility/index.ts:11-17)."""
    if isinstance(value, datetime.datetime):
        value = value.astimezone(datetime.timezone.utc) if value.tzinfo else value
        return value.strftime("%Y-%m-%d")
    if isinstance(value, datetime.date):
        return value.strftime("%Y-%m-%d")
    return str(value)


def _stringify(value: Column, dtype: T.DataType) -> Column:
    if isinstance(dtype, T.StringType):
        return value
    if isinstance(dtype, T.BinaryType):
        return F.base64(value)
    if isinstance(dtype, (T.ArrayType, T.StructType, T.MapType)):
        return F.to_json(value)
    return value.cast("string")


class RuleCompiler:
    """Compile one SimpleSchema against one DataFrame schema."""

    def __init__(
        self,
        schema: SimpleSchema,
        df_schema: T.StructType,
        *,
        keys: Optional[list[str]] = None,
        ignore: Optional[list[str]] = None,
        extra_key_policy: str = "violation",  # violation | ignore | error
        modifier_op: Optional[str] = None,
    ) -> None:
        self.schema = schema
        self.df_schema = df_schema
        self.keys = [make_key_generic(k) for k in keys] if keys else None
        self.ignore = list(ignore or [])
        self.extra_key_policy = extra_key_policy
        self.modifier_op = modifier_op
        self.merged = schema.merged_schema()
        self.pandas_rules: list[_PandasRule] = []
        self._pandas_counter = 0
        # (generic, fn) → column name: the custom tail is compiled both for
        # the value-present and value-null branches; register one UDF only
        self._pandas_cache: dict[tuple[str, int], str] = {}
        # stack of (item_generic, index Column) while compiling inside
        # array-item lambdas — lets Python custom validators on item keys
        # resolve to elementwise pandas rules
        self._lambda_frames: list[tuple[str, Column]] = []

    # -------------------------------------------------------------- public

    def violations_column(self) -> Column:
        """The whole rule forest as one array<violation> Column.

        Assembled with ``concat`` of conditional singleton arrays rather than
        ``array_compact(flatten(...))``: higher-order functions are
        CodegenFallback expressions, and keeping them out of the row-level
        path lets the entire projection stay inside whole-stage codegen
        (HOFs remain only inside array-item subtrees, where they are the
        right tool).
        """
        arrays = self._compile_children(
            prefix="",
            value=None,
            name_prefix=None,
            dtype=self.df_schema,
            opt_gate=None,
            in_lambda=False,
        )
        arrays.extend(self._extra_key_violations())
        empty = F.array().cast(T.ArrayType(VIOLATION_SCHEMA))
        if not arrays:
            return empty
        combined = F.concat(*arrays) if len(arrays) > 1 else arrays[0]
        if self.ignore:
            ig = [F.lit(t) for t in self.ignore]
            combined = F.filter(
                combined, lambda v: ~v.getField("type").isin(*ig)
            )
        return combined

    # ----------------------------------------------------------- traversal

    def _should_emit(self, generic: str) -> bool:
        if self.keys is None:
            return True
        return any(
            generic == k or generic.startswith(f"{k}.") or k.startswith(f"{generic}.")
            for k in self.keys
        )

    def _emit_rules_for(self, generic: str) -> bool:
        if self.keys is None:
            return True
        return any(
            generic == k or generic.startswith(f"{k}.") for k in self.keys
        )

    def _direct_children(self, prefix: str) -> list[str]:
        """Immediate child generic keys of a prefix ('' = top level)."""
        out = []
        seen = set()
        p = f"{prefix}." if prefix else ""
        for k in self.merged:
            if not k.startswith(p):
                continue
            rest = k[len(p):]
            first = rest.split(".")[0]
            if first == "$":
                continue
            child = f"{p}{first}"
            if child not in seen and child in self.merged:
                seen.add(child)
                out.append(child)
        return out

    def _compile_children(
        self,
        prefix: str,
        value: Optional[Column],
        name_prefix: Optional[Column],
        dtype: Optional[T.StructType],
        opt_gate: Optional[Column],
        in_lambda: bool,
    ) -> list[Column]:
        arrays: list[Column] = []
        for child in self._direct_children(prefix):
            if not self._should_emit(child):
                continue
            leaf = child.split(".")[-1]
            if dtype is not None and leaf in dtype.fieldNames():
                child_dtype = dtype[leaf].dataType
                child_value = (
                    F.col(leaf) if value is None else value.getField(leaf)
                )
            else:
                child_dtype = T.NullType()
                child_value = F.lit(None)
            child_name = (
                F.lit(leaf)
                if name_prefix is None
                else F.concat(name_prefix, F.lit("." + leaf))
            )
            arrays.extend(
                self._compile_key(
                    child, child_value, child_name, child_dtype, opt_gate, in_lambda
                )
            )
        return arrays

    def _compile_key(
        self,
        generic: str,
        value: Column,
        name: Column,
        dtype: T.DataType,
        opt_gate: Optional[Column],
        in_lambda: bool,
    ) -> list[Column]:
        definition = self.merged[generic]
        if generic in self.schema._blackbox_keys or self.schema.key_is_in_blackbox(
            generic
        ):
            # blackbox/Any: the key itself may still have required/type rules
            # unless its type IS Any; content below is never validated
            pass

        resolved = self.schema.get_definition(generic) or {
            k: v for k, v in definition.items() if k != "type"
        }
        optional = resolved.get("optional", definition.get("optional", False))
        if callable(optional):
            optional = bool(optional())
        alternatives = self._resolved_alternatives(generic)

        arrays: list[Column] = []

        if self._emit_rules_for(generic):
            key_err = self._key_error(
                generic, value, name, dtype, alternatives, optional, opt_gate,
                in_lambda,
            )
            if key_err is not None:
                arrays.append(
                    F.when(key_err.isNotNull(), F.array(key_err)).otherwise(
                        F.array().cast(T.ArrayType(VIOLATION_SCHEMA))
                    )
                )

        # recursion — objects and arrays
        alt_types = [a.get("type") for a in alternatives]
        has_any = any(t is AnyType for t in alt_types)
        is_blackbox = any(a.get("blackbox") is True for a in alternatives)

        if not has_any and not is_blackbox:
            child_gate = opt_gate
            if optional:
                present = value.isNotNull()
                child_gate = present if child_gate is None else (child_gate & present)

            if any(t is ObjectType or isinstance(t, SimpleSchema) for t in alt_types):
                child_struct = dtype if isinstance(dtype, T.StructType) else None
                arrays.extend(
                    self._compile_children(
                        prefix=generic,
                        value=value,
                        name_prefix=name,
                        dtype=child_struct,
                        opt_gate=child_gate,
                        in_lambda=in_lambda,
                    )
                )

            if ArrayType in alt_types and isinstance(dtype, T.ArrayType):
                item_generic = f"{generic}.$"
                if item_generic in self.merged:
                    arrays.append(
                        self._compile_array_items(
                            item_generic, value, name, dtype.elementType
                        )
                    )
        return arrays

    def _compile_array_items(
        self,
        item_generic: str,
        arr: Column,
        arr_name: Column,
        item_dtype: T.DataType,
    ) -> Column:
        """Per-item violations, named with concrete indexes
        (validateField.ts:293-306)."""

        def per_item(x: Column, i: Column) -> Column:
            item_name = F.concat(arr_name, F.lit("."), i.cast("string"))
            self._lambda_frames.append((item_generic, i))
            try:
                item_arrays = self._compile_key(
                    item_generic,
                    x,
                    item_name,
                    item_dtype,
                    opt_gate=x.isNotNull(),
                    in_lambda=True,
                )
            finally:
                self._lambda_frames.pop()
            if not item_arrays:
                return F.array().cast(T.ArrayType(VIOLATION_SCHEMA))
            return F.array_compact(F.flatten(F.array(*item_arrays)))

        result = F.when(
            arr.isNotNull(), F.flatten(F.transform(arr, per_item))
        ).otherwise(F.array().cast(T.ArrayType(VIOLATION_SCHEMA)))
        return result

    # ------------------------------------------------------------ key rules

    def _resolved_alternatives(self, generic: str) -> list[dict]:
        definition = self.merged[generic]
        resolved = self.schema.get_definition(generic)
        if resolved is None:
            # subschema-contributed key: resolve manually
            outer = {k: v for k, v in definition.items() if k != "type"}
            return [{**outer, **alt} for alt in definition["type"].definitions]
        outer = {k: v for k, v in resolved.items() if k != "type"}
        return [{**outer, **alt} for alt in resolved["type"]]

    def _key_error(
        self,
        generic: str,
        value: Column,
        name: Column,
        dtype: T.DataType,
        alternatives: list[dict],
        optional: bool,
        opt_gate: Optional[Column],
        in_lambda: bool,
    ) -> Optional[Column]:
        chain: list[Column] = []

        # V1 required (requiredValidator.ts:13-61, doc mode: null==missing)
        if not optional:
            cond = value.isNull()
            if opt_gate is not None:
                cond = cond & opt_gate
            if self.modifier_op in ("$unset", "$rename"):
                cond = F.lit(True) if opt_gate is None else opt_gate
            chain.append(
                F.when(cond, violation(name, ErrorTypes.REQUIRED)).otherwise(
                    _null_violation()
                )
            )

        # value checks only when a value is present; custom validators run on
        # EVERY key visit, set or not (reference validateField.ts:192-226 —
        # typeValidator/allowedValues skip internally when !isSet, custom
        # fns receive isSet=false; conditionally-required depends on this)
        one_of = self._one_of_error(generic, value, name, dtype, alternatives, in_lambda)
        custom_only = self._one_of_error(
            generic, value, name, dtype, alternatives, in_lambda, custom_only=True
        )
        if one_of is not None:
            chain.append(
                F.when(value.isNotNull(), one_of).otherwise(
                    custom_only if custom_only is not None else _null_violation()
                )
            )
        elif custom_only is not None:
            chain.append(
                F.when(value.isNull(), custom_only).otherwise(_null_violation())
            )

        if not chain:
            return None
        return chain[0] if len(chain) == 1 else F.coalesce(*chain)

    def _one_of_error(
        self,
        generic: str,
        value: Column,
        name: Column,
        dtype: T.DataType,
        alternatives: list[dict],
        in_lambda: bool,
        custom_only: bool = False,
    ) -> Optional[Column]:
        if any(a.get("type") is AnyType for a in alternatives):
            return None  # Any short-circuits valid (validateField.ts:174-175)

        errs = [
            self._alternative_error(
                generic, value, name, dtype, alt, in_lambda, custom_only
            )
            for alt in alternatives
        ]
        errs = [e for e in errs if e is not None]
        if not errs:
            return None
        if len(errs) == 1:
            return errs[0]
        any_valid = reduce(lambda a, b: a | b, [e.isNull() for e in errs])
        return F.when(any_valid, _null_violation()).otherwise(errs[-1])

    def _alternative_error(
        self,
        generic: str,
        value: Column,
        name: Column,
        dtype: T.DataType,
        alt: dict,
        in_lambda: bool,
        custom_only: bool = False,
    ) -> Optional[Column]:
        chain: list[Column] = []
        type_err = None if custom_only else self._type_error(value, name, dtype, alt)
        if type_err is not None:
            chain.append(type_err)

        allowed = None if custom_only else alt.get("allowedValues")
        if allowed is not None:
            vals = sorted(allowed) if isinstance(allowed, set) else list(allowed)
            chain.append(
                F.when(
                    ~value.isin(*vals),
                    violation(
                        name,
                        ErrorTypes.VALUE_NOT_ALLOWED,
                        value=_stringify(value, dtype),
                    ),
                ).otherwise(_null_violation())
            )

        # ordered validator tail: custom, then schema-level, then global
        # validators (validateField.ts:192-226 / SimpleSchema.ts:825-827,
        # 1059-1061)
        custom = alt.get("custom")
        tail = ([custom] if custom is not None else []) + self.schema.all_validators()
        for fn in tail:
            chain.append(
                self._custom_error(generic, value, name, dtype, alt, fn, in_lambda)
            )

        if not chain:
            return None
        return chain[0] if len(chain) == 1 else F.coalesce(*chain)

    def _context_cols_for(self, custom: Callable) -> list[str]:
        """Columns shipped as the cross-field context struct for a
        two-argument Python validator; empty for value-only fns."""
        if not _wants_context(custom):
            return []
        declared = getattr(custom, "context_fields", None)
        if declared:
            return list(declared)
        # fn may read any field: ship all top-level data columns.
        # Declare fn.context_fields = [...] to keep the batch narrow.
        return [f.name for f in self.df_schema.fields]

    def _custom_error(
        self,
        generic: str,
        value: Column,
        name: Column,
        dtype: T.DataType,
        alt: dict,
        custom: Callable,
        in_lambda: bool,
    ) -> Column:
        if getattr(custom, "_is_spark_rule", False):
            ctx = RuleContext(key=generic, name=name, definition=alt)
            err_type = custom(value, ctx)
            return F.when(
                err_type.isNotNull(),
                violation(name, err_type, value=_stringify(value, dtype)),
            ).otherwise(_null_violation())

        if in_lambda:
            # Array-item Python validator (validateField.ts:293-306): one
            # Arrow-batched UDF over the WHOLE (outer) array column returns
            # an error-type per element, nested one array level per lambda
            # frame (array<string> for a.$.b, array<array<string>> for
            # a.$.b.$.c, and so on for arbitrary depth — matching the
            # reference's unbounded recursion,
            # getPositionsForAutoValue.ts:43-148) — and the lambda(s) pick
            # entries by index per level: no explode, no shuffle,
            # violations keep concrete-index names.
            frames = list(self._lambda_frames)
            outer_generic, _ = frames[0]
            array_path = outer_generic[: -len(".$")]
            between_subpaths = [
                nxt[0][len(prev[0]): -len(".$")].strip(".")
                for prev, nxt in zip(frames, frames[1:])
            ]
            item_subpath = generic[len(frames[-1][0]):].lstrip(".")
            cache_key = (generic, id(custom))
            if cache_key in self._pandas_cache:
                col_name = self._pandas_cache[cache_key]
            else:
                self._pandas_counter += 1
                col_name = (
                    f"__custom_{self._pandas_counter}_"
                    f"{generic.replace('.', '_').replace('$', 'I')}"
                )
                context_cols = self._context_cols_for(custom)
                self.pandas_rules.append(
                    _PandasRule(
                        key=generic,
                        column_name=col_name,
                        fn=custom,
                        input_cols=[array_path],
                        context_cols=context_cols,
                        elementwise=True,
                        item_subpath=item_subpath,
                        between_subpaths=between_subpaths,
                    )
                )
                self._pandas_cache[cache_key] = col_name
            err_type = F.col(col_name)
            for _, frame_idx in frames:
                err_type = F.get(err_type, frame_idx)
            return F.when(
                err_type.isNotNull(),
                violation(name, err_type, value=_stringify(value, dtype)),
            ).otherwise(_null_violation())
        # Arrow-vectorized deferred rule: the validator DataFrame pass adds a
        # column with the pandas UDF result before the violations projection.
        # The UDF input is the LEAF value (F.col resolves dotted struct
        # paths); two-argument validators additionally receive a per-row
        # context with field()/sibling_field() resolved from a shipped struct
        # of context columns (reference ValidatorContext, src/types.ts:230-240).
        cache_key = (generic, id(custom))
        if cache_key in self._pandas_cache:
            col_name = self._pandas_cache[cache_key]
        else:
            self._pandas_counter += 1
            col_name = f"__custom_{self._pandas_counter}_{generic.replace('.', '_')}"
            # absent column (NullType): ship a null literal, not F.col
            input_cols = [] if isinstance(dtype, T.NullType) else [generic]
            self.pandas_rules.append(
                _PandasRule(key=generic, column_name=col_name, fn=custom,
                            input_cols=input_cols,
                            context_cols=self._context_cols_for(custom))
            )
            self._pandas_cache[cache_key] = col_name
        err_type = F.col(col_name)
        return F.when(
            err_type.isNotNull(),
            violation(name, err_type, value=_stringify(value, dtype)),
        ).otherwise(_null_violation())

    # ------------------------------------------------------------ type rules

    def _type_error(
        self, value: Column, name: Column, dtype: T.DataType, alt: dict
    ) -> Optional[Column]:
        token = alt.get("type")
        if token is AnyType:
            return None
        if isinstance(token, SimpleSchema):
            token = ObjectType

        if isinstance(dtype, T.NullType):
            return None  # column absent: only required can fire

        if not isinstance(token, TypeToken):
            return None

        if not _type_matches(token, dtype):
            return violation(
                name,
                ErrorTypes.EXPECTED_TYPE,
                value=_stringify(value, dtype),
                dataType=_token_name(token),
            )

        if token is String:
            return self._string_checks(value, name, alt)
        if token in (Number, Integer):
            return self._number_checks(value, name, dtype, alt, token is Integer)
        if token is DateType:
            return self._date_checks(value, name, alt)
        if token is ArrayType:
            return self._array_checks(value, name, alt)
        return None  # Boolean/Object/Binary: schema-type match is enough

    def _string_checks(self, value: Column, name: Column, alt: dict) -> Optional[Column]:
        """checkStringValue.ts:8-49 — order: max, min, regEx (single then array)."""
        conds: list[Column] = []
        if alt.get("max") is not None:
            mx = alt["max"]
            conds.append(
                F.when(
                    F.length(value) > mx,
                    violation(name, ErrorTypes.MAX_STRING, value=value, max=str(mx)),
                ).otherwise(_null_violation())
            )
        if alt.get("min") is not None:
            mn = alt["min"]
            conds.append(
                F.when(
                    F.length(value) < mn,
                    violation(name, ErrorTypes.MIN_STRING, value=value, min=str(mn)),
                ).otherwise(_null_violation())
            )
        regex = alt.get("regEx")
        if regex is not None:
            patterns = regex if isinstance(regex, (list, tuple)) else [regex]
            skip_empty = alt.get("skipRegExCheckForEmptyStrings") is True
            for idx, pat in enumerate(patterns):
                fail = ~value.rlike(to_java_regex(pat))
                # skip-empty applies to the single-regex form only
                # (checkStringValue.ts:25)
                if skip_empty and not isinstance(regex, (list, tuple)):
                    fail = fail & (value != F.lit(""))
                conds.append(
                    F.when(
                        fail,
                        violation(
                            name,
                            ErrorTypes.FAILED_REGULAR_EXPRESSION,
                            value=value,
                            regExp=js_regex_repr(pat),
                        ),
                    ).otherwise(_null_violation())
                )
        if not conds:
            return None
        return conds[0] if len(conds) == 1 else F.coalesce(*conds)

    def _number_checks(
        self,
        value: Column,
        name: Column,
        dtype: T.DataType,
        alt: dict,
        expects_integer: bool,
    ) -> Optional[Column]:
        """checkNumberValue.ts:4-54 — NaN, max, min (exclusive variants),
        integer; min/max skipped under $inc."""
        conds: list[Column] = []
        data_type = "Integer" if expects_integer else "Number"
        is_fractional = isinstance(dtype, _FRACTIONAL_TYPES)
        if is_fractional:
            conds.append(
                F.when(
                    F.isnan(value),
                    violation(
                        name, ErrorTypes.EXPECTED_TYPE, value=value.cast("string"),
                        dataType=data_type,
                    ),
                ).otherwise(_null_violation())
            )
        skip_bounds = self.modifier_op == "$inc"
        if not skip_bounds and alt.get("max") is not None:
            mx = alt["max"]
            exclusive = alt.get("exclusiveMax") is True
            cond = (value >= mx) if exclusive else (value > mx)
            conds.append(
                F.when(
                    cond,
                    violation(
                        name,
                        ErrorTypes.MAX_NUMBER_EXCLUSIVE if exclusive else ErrorTypes.MAX_NUMBER,
                        value=value.cast("string"),
                        max=_num_str(mx),
                    ),
                ).otherwise(_null_violation())
            )
        if not skip_bounds and alt.get("min") is not None:
            mn = alt["min"]
            exclusive = alt.get("exclusiveMin") is True
            cond = (value <= mn) if exclusive else (value < mn)
            conds.append(
                F.when(
                    cond,
                    violation(
                        name,
                        ErrorTypes.MIN_NUMBER_EXCLUSIVE if exclusive else ErrorTypes.MIN_NUMBER,
                        value=value.cast("string"),
                        min=_num_str(mn),
                    ),
                ).otherwise(_null_violation())
            )
        if expects_integer and is_fractional:
            # Number.isInteger parity: 5.0 passes; NaN/Inf fail (NaN already
            # caught above; Infinity != floor handled by comparison with itself)
            not_int = (value != F.floor(value)) | (value == F.lit(float("inf"))) | (
                value == F.lit(float("-inf"))
            )
            conds.append(
                F.when(
                    not_int,
                    violation(
                        name, ErrorTypes.MUST_BE_INTEGER, value=value.cast("string")
                    ),
                ).otherwise(_null_violation())
            )
        if not conds:
            return None
        return conds[0] if len(conds) == 1 else F.coalesce(*conds)

    def _date_checks(self, value: Column, name: Column, alt: dict) -> Optional[Column]:
        """checkDateValue.ts:5-32 — min/max epoch compare; payload YYYY-MM-DD."""
        conds: list[Column] = []
        if alt.get("min") is not None:
            mn = alt["min"]
            conds.append(
                F.when(
                    value < F.lit(mn),
                    violation(
                        name, ErrorTypes.MIN_DATE, value=value.cast("string"),
                        min=_date_str(mn),
                    ),
                ).otherwise(_null_violation())
            )
        if alt.get("max") is not None:
            mx = alt["max"]
            conds.append(
                F.when(
                    value > F.lit(mx),
                    violation(
                        name, ErrorTypes.MAX_DATE, value=value.cast("string"),
                        max=_date_str(mx),
                    ),
                ).otherwise(_null_violation())
            )
        if not conds:
            return None
        return conds[0] if len(conds) == 1 else F.coalesce(*conds)

    def _array_checks(self, value: Column, name: Column, alt: dict) -> Optional[Column]:
        """checkArrayValue.ts:4-22 — minCount/maxCount; one error on the array
        key, not per item (test/SimpleSchema_max.tests.ts:27-30)."""
        conds: list[Column] = []
        if alt.get("minCount") is not None:
            mc = alt["minCount"]
            conds.append(
                F.when(
                    F.size(value) < mc,
                    violation(
                        name, ErrorTypes.MIN_COUNT, value=F.to_json(value),
                        minCount=str(mc),
                    ),
                ).otherwise(_null_violation())
            )
        if alt.get("maxCount") is not None:
            mc = alt["maxCount"]
            conds.append(
                F.when(
                    F.size(value) > mc,
                    violation(
                        name, ErrorTypes.MAX_COUNT, value=F.to_json(value),
                        maxCount=str(mc),
                    ),
                ).otherwise(_null_violation())
            )
        if not conds:
            return None
        return conds[0] if len(conds) == 1 else F.coalesce(*conds)

    # --------------------------------------------------------- extra keys

    def _extra_key_violations(self) -> list[Column]:
        """KEY_NOT_IN_SCHEMA for DataFrame columns the schema doesn't allow
        (allowsKey: SimpleSchema.ts:594-624; emission validateField.ts:262-279).

        With a fixed table schema, presence is per-row non-null; unknown
        columns that are entirely absent can't occur.
        """
        if self.extra_key_policy == "ignore":
            return []
        out: list[Column] = []
        for f in self.df_schema.fields:
            if not self.schema.allows_key(f.name):
                if self.extra_key_policy == "error":
                    raise ValueError(
                        f"column {f.name!r} is not allowed by the schema"
                    )
                out.append(
                    F.when(
                        F.col(f.name).isNotNull(),
                        F.array(
                            violation(
                                F.lit(f.name),
                                ErrorTypes.KEY_NOT_IN_SCHEMA,
                                value=_stringify(F.col(f.name), f.dataType),
                            )
                        ),
                    ).otherwise(F.array().cast(T.ArrayType(VIOLATION_SCHEMA)))
                )
        return out


def _num_str(v: Any) -> str:
    """Render numeric bound payloads the way JS does (10, not 10.0)."""
    if isinstance(v, float) and v.is_integer():
        return str(int(v))
    return str(v)


def compile_violations(
    schema: SimpleSchema,
    df_schema: T.StructType,
    **kwargs: Any,
) -> tuple[Column, list[_PandasRule]]:
    compiler = RuleCompiler(schema, df_schema, **kwargs)
    col = compiler.violations_column()
    return col, compiler.pandas_rules
