"""Error types, violation-row contract, and default error messages.

Reproduces the reference's error vocabulary and message templates:

- error-type constants: ``/root/reference/src/SimpleSchema.ts:1083-1101``
- ValidationError shape ``{name, type, value, ...extras}``:
  ``/root/reference/src/types.ts:175-181``
- default English message templates:
  ``/root/reference/src/defaultMessages.ts:5-28``

The violation row is modeled relationally as a Spark struct so a whole
validation run emits ONE ArrayType(violation) column per document row,
exploded into a violations table.  All ``value``/``min``/``max`` payload
fields are carried as strings so every rule shares one struct type and the
whole rule forest compiles to a single Catalyst projection.
"""

from __future__ import annotations

from typing import Any, Optional

from pyspark.sql import types as T

__all__ = [
    "ErrorTypes",
    "VIOLATION_SCHEMA",
    "VIOLATION_FIELDS",
    "default_error_message",
]


class ErrorTypes:
    """String constants for every violation type the engine can emit.

    Mirrors ``SimpleSchema.ErrorTypes`` (reference SimpleSchema.ts:1083-1101)
    plus engine-level additions for the distributed checks mandated by the
    north rule (uniqueness / referential / drift have no reference analog).
    """

    REQUIRED = "required"
    MIN_STRING = "minString"
    MAX_STRING = "maxString"
    MIN_NUMBER = "minNumber"
    MAX_NUMBER = "maxNumber"
    MIN_NUMBER_EXCLUSIVE = "minNumberExclusive"
    MAX_NUMBER_EXCLUSIVE = "maxNumberExclusive"
    MIN_DATE = "minDate"
    MAX_DATE = "maxDate"
    BAD_DATE = "badDate"
    MIN_COUNT = "minCount"
    MAX_COUNT = "maxCount"
    MUST_BE_INTEGER = "noDecimal"
    VALUE_NOT_ALLOWED = "notAllowed"
    EXPECTED_TYPE = "expectedType"
    FAILED_REGULAR_EXPRESSION = "regEx"
    KEY_NOT_IN_SCHEMA = "keyNotInSchema"

    # Engine-level (distributed) check types — no reference analog; required
    # by BASELINE.json north_rule (uniqueness, referential integrity, drift).
    DUPLICATE_KEY = "duplicateKey"
    BROKEN_REFERENCE = "brokenReference"
    DISTRIBUTION_DRIFT = "distributionDrift"
    #: dynamic JSON document mode only: the json_blob column failed to parse
    #: (the reference operates on live JS objects, so no analog exists)
    MALFORMED_JSON = "malformedJson"


#: Field order is part of the contract: violations arrays are built in
#: validator order and the first non-null per key wins (reference
#: doValidation.ts:115-124 one-error-per-key dedupe).
VIOLATION_FIELDS = [
    ("name", T.StringType()),       # keyPath, concrete indexes (a.0.b)
    ("type", T.StringType()),       # one of ErrorTypes
    ("value", T.StringType()),      # offending value, stringified
    ("dataType", T.StringType()),   # for expectedType
    ("min", T.StringType()),
    ("max", T.StringType()),
    ("regExp", T.StringType()),
    ("minCount", T.StringType()),
    ("maxCount", T.StringType()),
]

VIOLATION_SCHEMA = T.StructType(
    [T.StructField(n, t, True) for n, t in VIOLATION_FIELDS]
)


def _s(value: Any) -> str:
    return str(value)


# message templates keyed by error type; mirrors defaultMessages.ts:5-28.
_DEFAULT_MESSAGES = {
    ErrorTypes.BAD_DATE: lambda e, label: f"{label} is not a valid date",
    ErrorTypes.EXPECTED_TYPE: lambda e, label: (
        f"{label} must be of type {_s(e.get('dataType'))}"
    ),
    ErrorTypes.KEY_NOT_IN_SCHEMA: lambda e, label: (
        f"{e.get('name')} is not allowed by the schema"
    ),
    ErrorTypes.MAX_COUNT: lambda e, label: (
        f"You cannot specify more than {_s(e.get('maxCount'))} values"
    ),
    ErrorTypes.MAX_DATE: lambda e, label: (
        f"{label} cannot be after {_s(e.get('max'))}"
    ),
    ErrorTypes.MAX_NUMBER: lambda e, label: (
        f"{label} cannot exceed {_s(e.get('max'))}"
    ),
    ErrorTypes.MAX_NUMBER_EXCLUSIVE: lambda e, label: (
        f"{label} must be less than {_s(e.get('max'))}"
    ),
    ErrorTypes.MAX_STRING: lambda e, label: (
        f"{label} cannot exceed {_s(e.get('max'))} characters"
    ),
    ErrorTypes.MIN_COUNT: lambda e, label: (
        f"You must specify at least {_s(e.get('minCount'))} values"
    ),
    ErrorTypes.MIN_DATE: lambda e, label: (
        f"{label} must be on or after {_s(e.get('min'))}"
    ),
    ErrorTypes.MIN_NUMBER: lambda e, label: (
        f"{label} must be at least {_s(e.get('min'))}"
    ),
    ErrorTypes.MIN_NUMBER_EXCLUSIVE: lambda e, label: (
        f"{label} must be greater than {_s(e.get('min'))}"
    ),
    ErrorTypes.MIN_STRING: lambda e, label: (
        f"{label} must be at least {_s(e.get('min'))} characters"
    ),
    ErrorTypes.MUST_BE_INTEGER: lambda e, label: f"{label} must be an integer",
    ErrorTypes.VALUE_NOT_ALLOWED: lambda e, label: (
        f"{_s(e.get('value'))} is not an allowed value"
    ),
    ErrorTypes.FAILED_REGULAR_EXPRESSION: lambda e, label: (
        f"{label} failed regular expression validation"
    ),
    ErrorTypes.REQUIRED: lambda e, label: f"{label} is required",
}


def default_error_message(error: dict, label: Optional[str]) -> str:
    """Render the built-in English message for a violation row.

    ``error`` is a dict with at least ``name`` and ``type`` (the violation
    struct as a mapping).  Mirrors getDefaultErrorMessage
    (defaultMessages.ts:25-28): unknown types fall back to ``"<type> <name>"``.
    """
    fn = _DEFAULT_MESSAGES.get(error.get("type"))
    if fn is None:
        return f"{error.get('type')} {error.get('name')}"
    return fn(error, str(label))
