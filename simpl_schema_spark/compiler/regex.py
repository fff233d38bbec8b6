"""JS-regex → Java-regex dialect translation.

The reference stores ``regEx`` as JS RegExp and checks with ``re.test(value)``
(search semantics, reference checkStringValue.ts:23-33).  Spark's ``rlike``
is also search-semantics Java regex, so translation is mostly about flags and
the few incompatible escapes.  Schema authors hand us Python ``re.Pattern``
objects; we map Python flags onto Java inline flags.
"""

from __future__ import annotations

import re

__all__ = ["to_java_regex", "js_regex_repr"]

_FLAG_MAP = [
    (re.IGNORECASE, "i"),
    (re.MULTILINE, "m"),
    (re.DOTALL, "s"),
    (re.VERBOSE, "x"),
    (re.UNICODE, ""),  # Java regex is UTF-16 native; no flag needed
]


def _inline_flags(pattern: re.Pattern) -> str:
    flags = ""
    for py_flag, java_flag in _FLAG_MAP:
        if pattern.flags & py_flag and java_flag:
            flags += java_flag
    return flags


def to_java_regex(pattern: "re.Pattern | str") -> str:
    """Java-dialect pattern string usable with ``rlike`` (search semantics)."""
    if isinstance(pattern, str):
        return pattern
    src = pattern.pattern
    flags = _inline_flags(pattern)
    return f"(?{flags}){src}" if flags else src


def js_regex_repr(pattern: "re.Pattern | str") -> str:
    """JS-style ``/pattern/flags`` string for the violation ``regExp`` payload
    (parity with ``regEx.toString()``, reference checkStringValue.ts:31)."""
    if isinstance(pattern, str):
        return f"/{pattern}/"
    flags = ""
    if pattern.flags & re.IGNORECASE:
        flags += "i"
    if pattern.flags & re.MULTILINE:
        flags += "m"
    if pattern.flags & re.DOTALL:
        flags += "s"
    return f"/{pattern.pattern}/{flags}"
