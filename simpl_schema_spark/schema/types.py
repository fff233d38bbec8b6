"""Type tokens of the schema definition language.

The reference uses JS constructors (String, Number, Boolean, Date, Array,
Object) plus two sentinels (``SimpleSchema.Integer`` = the string
``'SimpleSchema.Integer'``, ``SimpleSchema.Any`` = ``'___Any___'``; reference
SimpleSchema.ts:1103 and 777-783).  We model each as a small singleton token
so schema dicts stay declarative and hashable, and accept the natural Python
spellings (``str``, ``float``, ``int``, ``bool``, ``bytes``,
``datetime.datetime``, ``list``, ``dict``) as aliases.
"""

from __future__ import annotations

import datetime
import re
from typing import Any as TAny

__all__ = [
    "TypeToken", "String", "Number", "Integer", "Boolean", "DateType",
    "ArrayType", "ObjectType", "AnyType", "Binary", "normalize_type",
    "RegExPattern", "is_regex",
]

RegExPattern = type(re.compile(""))


def is_regex(value: TAny) -> bool:
    return isinstance(value, RegExPattern)


class TypeToken:
    """Singleton marker for a supported scalar/container type."""

    __slots__ = ("name",)
    _registry: dict[str, "TypeToken"] = {}

    def __new__(cls, name: str) -> "TypeToken":
        tok = cls._registry.get(name)
        if tok is None:
            tok = super().__new__(cls)
            tok.name = name
            cls._registry[name] = tok
        return tok

    def __repr__(self) -> str:  # pragma: no cover
        return f"<type {self.name}>"

    def __deepcopy__(self, memo):  # tokens are immutable singletons
        return self

    def __copy__(self):
        return self


String = TypeToken("String")
Number = TypeToken("Number")          # float64; NaN rejected
Integer = TypeToken("Integer")        # 'SimpleSchema.Integer': Number.isInteger
Boolean = TypeToken("Boolean")
DateType = TypeToken("Date")          # timestamp
ArrayType = TypeToken("Array")
ObjectType = TypeToken("Object")
AnyType = TypeToken("Any")            # '___Any___': anything passes
Binary = TypeToken("Binary")          # custom-class analog (Uint8Array in the
                                      # reference, test/SimpleSchema_type.tests.ts:13-23)

_ALIASES = {
    str: String,
    float: Number,
    int: Integer,
    bool: Boolean,
    bytes: Binary,
    bytearray: Binary,
    datetime.datetime: DateType,
    datetime.date: DateType,
    list: ArrayType,
    dict: ObjectType,
    "String": String,
    "Number": Number,
    "SimpleSchema.Integer": Integer,
    "Integer": Integer,
    "Boolean": Boolean,
    "Date": DateType,
    "Array": ArrayType,
    "Object": ObjectType,
    "___Any___": AnyType,
    "Any": AnyType,
    "Binary": Binary,
}


def normalize_type(t: TAny) -> TAny:
    """Map Python spellings / strings onto canonical tokens.

    SimpleSchema instances and regex patterns pass through untouched (they
    are handled by the group standardizer: a regex type is shorthand for
    ``{type: String, regEx: ...}``, reference SimpleSchemaGroup.ts:14-19).
    """
    if isinstance(t, TypeToken):
        return t
    try:
        hash(t)
    except TypeError:
        return t
    return _ALIASES.get(t, t)
