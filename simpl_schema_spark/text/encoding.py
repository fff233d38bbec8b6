"""Encoding repair -- ftfy-style mojibake fixing and control stripping.

Web crawls are full of UTF-8 text that was decoded as cp1252/latin-1
somewhere upstream ("mojibake": the curly-quote family rendered as
"a-circumflex, euro, ..." triples; accented letters as "A-tilde" pairs);
every public pipeline (C4, CCNet, Dolma) runs an encoding-repair pass
(usually ftfy).  This is the expression-level version: a curated table
of the highest-frequency artifacts applied as chained LITERAL
``F.replace`` calls -- pure JVM, fuses with the scan, and trivially
portable to any engine's ``replace`` (which is what makes it
oracle-checkable, unlike heuristic ftfy).

Not a general decoder: sequences outside the table pass through.  The
table covers the common punctuation family (curly quotes, dashes,
ellipsis, bullet), the western-European accented letters, and stray
C2-prefix artifacts before NBSP/symbols -- the artifacts that dominate
real crawls.

Apply :func:`fix_mojibake` BEFORE :func:`strip_control_chars`: the
right-double-quote artifact ends in a C1 control byte (U+009D) that
stripping first would destroy.

The table is written ENTIRELY in ``\\uXXXX`` escapes: several keys
contain invisible C1 controls and confusable lookalikes that editors,
formatters, or copy-paste can silently normalize -- and because the
DuckDB oracle is generated FROM this table, such corruption would
self-consistently pass the contract check.  ASCII escapes make the file
immune to that failure mode; the comments carry the human-readable
character names.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

__all__ = ["MOJIBAKE_MAP", "fix_mojibake", "strip_control_chars"]

#: mojibake sequence -> intended character, applied top-to-bottom.  ORDER
#: MATTERS: every three-char punctuation rule must run before any rule
#: that could shorten its prefix.
MOJIBAKE_MAP: dict[str, str] = {
    # LATIN SMALL LETTER A WITH CIRCUMFLEX EURO SIGN TRADE MARK SIGN -> RIGHT SINGLE QUOTATION MARK
    "\u00e2\u20ac\u2122": "\u2019",
    # LATIN SMALL LETTER A WITH CIRCUMFLEX EURO SIGN SMALL TILDE -> LEFT SINGLE QUOTATION MARK
    "\u00e2\u20ac\u02dc": "\u2018",
    # LATIN SMALL LETTER A WITH CIRCUMFLEX EURO SIGN LATIN SMALL LIGATURE OE -> LEFT DOUBLE QUOTATION MARK
    "\u00e2\u20ac\u0153": "\u201c",
    # LATIN SMALL LETTER A WITH CIRCUMFLEX EURO SIGN U+009D -> RIGHT DOUBLE QUOTATION MARK
    "\u00e2\u20ac\u009d": "\u201d",
    # LATIN SMALL LETTER A WITH CIRCUMFLEX EURO SIGN LEFT DOUBLE QUOTATION MARK -> EN DASH
    "\u00e2\u20ac\u201c": "\u2013",
    # LATIN SMALL LETTER A WITH CIRCUMFLEX EURO SIGN RIGHT DOUBLE QUOTATION MARK -> EM DASH
    "\u00e2\u20ac\u201d": "\u2014",
    # LATIN SMALL LETTER A WITH CIRCUMFLEX EURO SIGN BROKEN BAR -> HORIZONTAL ELLIPSIS
    "\u00e2\u20ac\u00a6": "\u2026",
    # LATIN SMALL LETTER A WITH CIRCUMFLEX EURO SIGN CENT SIGN -> BULLET
    "\u00e2\u20ac\u00a2": "\u2022",
    # LATIN CAPITAL LETTER A WITH TILDE COPYRIGHT SIGN -> LATIN SMALL LETTER E WITH ACUTE
    "\u00c3\u00a9": "\u00e9",
    # LATIN CAPITAL LETTER A WITH TILDE DIAERESIS -> LATIN SMALL LETTER E WITH GRAVE
    "\u00c3\u00a8": "\u00e8",
    # LATIN CAPITAL LETTER A WITH TILDE FEMININE ORDINAL INDICATOR -> LATIN SMALL LETTER E WITH CIRCUMFLEX
    "\u00c3\u00aa": "\u00ea",
    # LATIN CAPITAL LETTER A WITH TILDE INVERTED EXCLAMATION MARK -> LATIN SMALL LETTER A WITH ACUTE
    "\u00c3\u00a1": "\u00e1",
    # LATIN CAPITAL LETTER A WITH TILDE SUPERSCRIPT THREE -> LATIN SMALL LETTER O WITH ACUTE
    "\u00c3\u00b3": "\u00f3",
    # LATIN CAPITAL LETTER A WITH TILDE SOFT HYPHEN -> LATIN SMALL LETTER I WITH ACUTE
    "\u00c3\u00ad": "\u00ed",
    # LATIN CAPITAL LETTER A WITH TILDE MASCULINE ORDINAL INDICATOR -> LATIN SMALL LETTER U WITH ACUTE
    "\u00c3\u00ba": "\u00fa",
    # LATIN CAPITAL LETTER A WITH TILDE PLUS-MINUS SIGN -> LATIN SMALL LETTER N WITH TILDE
    "\u00c3\u00b1": "\u00f1",
    # LATIN CAPITAL LETTER A WITH TILDE VULGAR FRACTION ONE QUARTER -> LATIN SMALL LETTER U WITH DIAERESIS
    "\u00c3\u00bc": "\u00fc",
    # LATIN CAPITAL LETTER A WITH TILDE PILCROW SIGN -> LATIN SMALL LETTER O WITH DIAERESIS
    "\u00c3\u00b6": "\u00f6",
    # LATIN CAPITAL LETTER A WITH TILDE CURRENCY SIGN -> LATIN SMALL LETTER A WITH DIAERESIS
    "\u00c3\u00a4": "\u00e4",
    # LATIN CAPITAL LETTER A WITH TILDE LATIN CAPITAL LETTER Y WITH DIAERESIS -> LATIN SMALL LETTER SHARP S
    "\u00c3\u0178": "\u00df",
    # LATIN CAPITAL LETTER A WITH TILDE U+009F -> LATIN SMALL LETTER SHARP S
    "\u00c3\u009f": "\u00df",
    # LATIN CAPITAL LETTER A WITH TILDE SECTION SIGN -> LATIN SMALL LETTER C WITH CEDILLA
    "\u00c3\u00a7": "\u00e7",
    # LATIN CAPITAL LETTER A WITH CIRCUMFLEX NO-BREAK SPACE -> NO-BREAK SPACE
    "\u00c2\u00a0": "\u00a0",
    # LATIN CAPITAL LETTER A WITH CIRCUMFLEX POUND SIGN -> POUND SIGN
    "\u00c2\u00a3": "\u00a3",
    # LATIN CAPITAL LETTER A WITH CIRCUMFLEX DEGREE SIGN -> DEGREE SIGN
    "\u00c2\u00b0": "\u00b0",
    # LATIN CAPITAL LETTER A WITH CIRCUMFLEX LEFT-POINTING DOUBLE ANGLE QUOTATION MARK -> LEFT-POINTING DOUBLE ANGLE QUOTATION MARK
    "\u00c2\u00ab": "\u00ab",
    # LATIN CAPITAL LETTER A WITH CIRCUMFLEX RIGHT-POINTING DOUBLE ANGLE QUOTATION MARK -> RIGHT-POINTING DOUBLE ANGLE QUOTATION MARK
    "\u00c2\u00bb": "\u00bb",
}

#: C0 controls except tab/newline/CR, DEL, and the C1 range -- the
#: characters an extraction should never emit
_CONTROL_RE = "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f-\\x9f]"


def fix_mojibake(
    text: Column, mapping: "dict[str, str] | None" = None
) -> Column:
    """``text`` with each table entry literal-replaced, in table order."""
    out = text
    for bad, good in (mapping or MOJIBAKE_MAP).items():
        out = F.replace(out, F.lit(bad), F.lit(good))
    return out


def strip_control_chars(text: Column) -> Column:
    """``text`` with C0 (except tab/newline/CR), DEL, and C1 controls
    removed.  Run AFTER :func:`fix_mojibake` (see module docstring)."""
    return F.regexp_replace(text, _CONTROL_RE, "")
