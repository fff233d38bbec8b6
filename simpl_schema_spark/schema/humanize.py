"""Label auto-inflection, byte-parity with the reference's humanize.

Mirrors ``/root/reference/src/utility/humanize.ts`` (itself vendored from
jxson/string-humanize): underscore camelCase, collapse non-word runs to a
single space, capitalize first letter, uppercase standalone "id".
"""

from __future__ import annotations

import re

__all__ = ["humanize", "capitalize", "underscore"]


def capitalize(text: str | None = None) -> str:
    text = (text or "").strip()
    if text:
        text = text[0].upper() + text[1:].lower()
    text = re.sub(r"\bid\b", "ID", text)
    text = re.sub(r"\bId\b", "ID", text)
    return text


def underscore(text: str | None = None) -> str:
    text = str(text or "").strip()
    text = re.sub(r"([a-z\d])([A-Z]+)", r"\1_\2", text)
    text = re.sub(r"[-\s]+", "_", text).lower()
    return text


def _extname(text: str) -> str:
    index = text.rfind(".")
    return "" if index == -1 else text[index:]


def humanize(text: str | int | None = None) -> str:
    text = str(text if text is not None else "").strip()
    ext = _extname(text)
    if ext:
        text = text.replace(ext, "")
    text = underscore(text)
    text = re.sub(r"[\W_]+", " ", text)
    return capitalize(text)
