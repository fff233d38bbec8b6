"""PII detection and redaction — web-corpus compliance primitives.

Training-data pipelines scrub personally identifiable information before
a corpus ships (emails, IP addresses, phone numbers are the standard
regex-detectable classes — cf. the public C4/Dolma/RedPajama pipelines).
Everything here is pure JVM ``regexp_count`` / ``regexp_replace`` over
one column: fuses with the parquet scan into whole-stage codegen, no
Python, no shuffle — the per-row cost is the regex automaton, so the
operator scales embarrassingly with input splits at 100 TB.

Patterns deliberately use only syntax with identical semantics in Java
regex (Spark) and RE2 (DuckDB/Go — no lookarounds, no backrefs), so
results are portable across engines and the driver's DuckDB oracle can
replay them bit-for-bit.

- :func:`pii_counts` — per-document match counts per PII class, counted
  independently on the ORIGINAL text (overlap between classes is counted
  by both — detection, not span accounting).
- :func:`redact_pii` — typed-placeholder replacement (``<EMAIL>`` …),
  applied in a fixed class order (email → ipv4 → phone) so a redaction
  never creates a later-class match.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["PII_PATTERNS", "pii_counts", "redact_pii"]

#: class name → (pattern, placeholder).  Ordered: redaction applies
#: top-to-bottom.  RE2-compatible (no lookarounds) AND Java-compatible.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    # local part + dotted domain with a >=2-alpha TLD; greedy-leftmost in
    # both engines, trailing sentence '.' self-excludes (no letter after)
    "email": (
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
        "<EMAIL>",
    ),
    # dotted-quad with word boundaries; \b is ASCII in RE2 and our corpora
    # are ASCII-digit — fine in both engines
    "ipv4": (
        r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
        "<IP>",
    ),
    # international-ish: +CC then 3-3-4 groups with space/dash separators
    "phone": (
        r"\+[0-9]{1,2}[ -][0-9]{3}[ -][0-9]{3}[ -]?[0-9]{4}",
        "<PHONE>",
    ),
}


def pii_counts(
    df: DataFrame,
    text_col: str = "text",
    patterns: "dict[str, tuple[str, str]] | None" = None,
) -> DataFrame:
    """``df`` plus one ``n_<class>`` long column per PII class.

    Counts are computed per class on the original text (a string that two
    patterns both match is counted by both).  NULL text → NULL counts.
    """
    pats = patterns or PII_PATTERNS
    out = df
    for name, (pat, _) in pats.items():
        out = out.withColumn(
            f"n_{name}",
            F.regexp_count(F.col(text_col), F.lit(pat)).cast("long"),
        )
    return out


def redact_pii(
    text: Column,
    patterns: "dict[str, tuple[str, str]] | None" = None,
) -> Column:
    """``text`` with every PII match replaced by its class placeholder.

    Classes apply in dict order; each ``regexp_replace`` replaces ALL
    occurrences.  NULL text stays NULL.
    """
    out = text
    for _, (pat, repl) in (patterns or PII_PATTERNS).items():
        out = F.regexp_replace(out, pat, repl)
    return out
