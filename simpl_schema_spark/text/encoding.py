"""Encoding repair — ftfy-style mojibake fixing and control stripping.

Web crawls are full of UTF-8 text that was decoded as cp1252/latin-1
somewhere upstream ("mojibake": ``â€™`` for ``’``,
``Ã©`` for ``é``); every public pipeline (C4, CCNet,
Dolma) runs an encoding-repair pass (usually ftfy).  This is the
expression-level version: a curated table of the highest-frequency
artifacts applied as chained LITERAL ``F.replace`` calls — pure JVM,
fuses with the scan, and trivially portable to any engine's ``replace``
(which is what makes it oracle-checkable, unlike heuristic ftfy).

Not a general decoder: sequences outside the table pass through.  The
table covers the common punctuation family (curly quotes, dashes,
ellipsis), the western-European accented letters, and stray ``Â``
before NBSP/symbols — the artifacts that dominate real crawls.

Apply :func:`fix_mojibake` BEFORE :func:`strip_control_chars`: the
right-double-quote artifact ends in a C1 control byte that stripping
first would destroy.

All table strings are written as explicit ``\\uXXXX`` escapes — several
contain C1 controls and lookalike characters that are unreadable (and
editor-hostile) as literals.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

__all__ = ["MOJIBAKE_MAP", "fix_mojibake", "strip_control_chars"]

#: mojibake sequence → intended character, applied top-to-bottom.  ORDER
#: MATTERS: every three-char "â€?" punctuation rule must run
#: before any rule could shorten its prefix.
MOJIBAKE_MAP: dict[str, str] = {
    # UTF-8 E2 80 xx (general punctuation) read back as cp1252; the
    # cp1252-undefined byte 0x9D usually surfaces as a latin-1 C1 control
    "â€™": "’",  # a-circ,euro,tm   -> right single quote
    "â€˜": "‘",  # a-circ,euro,tilde-> left single quote
    "â€œ": "“",  # a-circ,euro,oe   -> left double quote
    "â€": "”",  # a-circ,euro,C1-9D-> right double quote
    "â€“": "–",  # a-circ,euro,endash-> en dash
    "â€”": "—",  # a-circ,euro,emdash-> em dash
    "â€¦": "…",  # a-circ,euro,brokenbar-> ellipsis
    "â€¢": "•",  # a-circ,euro,cent -> bullet
    # UTF-8 C3 xx (latin-1 letters) read back as cp1252/latin-1
    "Ã©": "é",  # e-acute
    "Ã¨": "è",  # e-grave
    "Ãª": "ê",  # e-circumflex
    "Ã¡": "á",  # a-acute
    "Ã³": "ó",  # o-acute
    "Ã­": "í",  # i-acute
    "Ãº": "ú",  # u-acute
    "Ã±": "ñ",  # n-tilde
    "Ã¼": "ü",  # u-umlaut
    "Ã¶": "ö",  # o-umlaut
    "Ã¤": "ä",  # a-umlaut
    "ÃŸ": "ß",  # sharp-s (cp1252: 9F -> Y-umlaut)
    "Ã": "ß",  # sharp-s (latin-1 fallback: C1 control)
    "Ã§": "ç",  # c-cedilla
    # stray A-circumflex (UTF-8 C2 prefix read as cp1252) before
    # NBSP / symbols
    "Â ": " ",  # nbsp
    "Â£": "£",  # pound
    "Â°": "°",  # degree
    "Â«": "«",  # left guillemet
    "Â»": "»",  # right guillemet
}

#: C0 controls except \t\n\r, DEL, and the C1 range — the characters an
#: extraction should never emit
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
