"""Repetition metrics — the Gopher-style quality-filter family.

Web text that a crawler should drop is often REPEATED text: boilerplate
navigation repeated per line, a phrase stuttered by a broken template,
or one n-gram covering half the document (cf. the repetition filters in
the Gopher / MassiveText data-quality literature — duplicate-line
fraction and top-n-gram coverage are the two workhorses).

Pure per-row expressions: array ops over the document's own lines and
token bigrams — no explode, no shuffle; the metrics fuse with the scan
like the rest of :mod:`.analysis`.  Top-bigram coverage sorts the bigram
array and takes the longest equal-adjacent run in ONE ``F.aggregate``
pass — O(L log L) per document.  (The first implementation compared
every distinct bigram against the full list; because common-subexpression
elimination does not reach inside HOF lambdas, that re-built the bigram
array per distinct element — O(d·L) string work per row, measured minutes
per task on skewed rows.)  The token stream is additionally CAPPED at
``max_tokens`` — repetition is a prefix property for quality filtering
and the cap bounds worst-case CPU on megabyte documents.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .analysis import word_tokens

__all__ = [
    "duplicate_line_fraction",
    "top_bigram_coverage",
    "repetition_metrics",
]


def _lines(text: Column) -> Column:
    return F.filter(
        F.transform(F.split(text, "\n"), lambda l: F.trim(l)),
        lambda l: l != "",
    )


def duplicate_line_fraction(text: Column) -> Column:
    """Fraction of non-empty lines that are repeats of an earlier line
    (0.0 for documents with ≤1 line)."""
    lines = _lines(text)
    n = F.size(lines)
    return F.when(
        n > 1,
        (n - F.size(F.array_distinct(lines))) / n.cast("double"),
    ).otherwise(F.lit(0.0))


def top_bigram_coverage(text: Column, *, max_tokens: int = 2000) -> Column:
    """Fraction of (capped) token bigrams covered by the single most
    frequent bigram — near 1.0 for stuttered/templated text, small for
    natural prose.  0.0 for documents with <2 tokens.

    Convenience composition; hot paths stage the capped token array and
    call :func:`top_bigram_coverage_from_tokens` — the bigram lambda
    references the token array twice per position and CSE does not
    enter HOF lambdas, so an inlined tokenizer re-runs O(n) times."""
    return top_bigram_coverage_from_tokens(
        F.slice(word_tokens(text), 1, max_tokens)
    )


def top_bigram_coverage_from_tokens(toks: Column) -> Column:
    """:func:`top_bigram_coverage` over an already-built (ideally
    staged-column, pre-capped) token array."""
    n = F.size(toks)
    grams = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.concat(
                F.element_at(toks, i), F.lit(" "), F.element_at(toks, i + 1)
            ),
        ),
    )
    # max multiplicity = longest equal-adjacent run of the SORTED array,
    # one linear aggregate pass (state: previous element, current run,
    # best run).  Bigrams are never empty strings, so "" is a safe
    # never-matches initial `prev`.
    top = F.aggregate(
        F.array_sort(grams),
        F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
        ),
        lambda acc, g: F.struct(
            g.alias("prev"),
            F.when(g == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc["best"],
                F.when(g == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    return F.when(
        n >= 2, top / (n - 1).cast("double")
    ).otherwise(F.lit(0.0))


def repetition_metrics(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    max_tokens: int = 2000,
) -> DataFrame:
    """``(doc_id, dup_line_frac, top_bigram_cov)`` per non-null-text doc."""
    t = F.col(text_col)
    # capped token array staged as its own projection: the bigram lambda
    # references it 2x per position (the winnow trap, BENCH/ROUND5.md)
    return (
        df.where(t.isNotNull())
        .select(
            F.col(id_col).alias("doc_id"),
            duplicate_line_fraction(t).alias("dup_line_frac"),
            F.slice(word_tokens(t), 1, max_tokens).alias("__toks"),
        )
        .select(
            "doc_id",
            "dup_line_frac",
            top_bigram_coverage_from_tokens(F.col("__toks")).alias(
                "top_bigram_cov"
            ),
        )
    )
