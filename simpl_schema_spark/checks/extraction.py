"""Extraction QA: verify stored text matches a fresh extraction.

The north rule pins "byte-identical extracted text per url" — the
crawl-pipeline invariant that the ``text`` column IS what the extractor
produces from the ``html`` payload.  This check re-extracts and reports
violation-style rows for every mismatch, so an ingest bug (encoding
drift, extractor version skew, truncation) surfaces as ordinary
violation output instead of silently corrupting training data.

Pure expression comparison — decode + regex + equality fused with the
scan; zero shuffle (the output is a filter of the input).
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["extraction_mismatches"]


def extraction_mismatches(
    df: DataFrame,
    *,
    html_col: str = "html",
    text_col: str = "text",
    id_cols: tuple = ("url",),
    extractor: Optional[Callable[[Column], Column]] = None,
    value_prefix: int = 64,
) -> DataFrame:
    """Violation rows ``(id…, name, type, value)`` where
    ``extractor(html) != text`` (byte-for-byte, with NULL text expected to
    extract as the empty string).

    ``extractor`` defaults to :func:`..datagen.extract_text` (the
    ``<p>…</p>`` inverse of the synthetic corpus); production callers pass
    their own (e.g. :func:`..text.html.html_to_text` composed with
    ``cast``).  ``value`` carries the first ``value_prefix`` chars of the
    fresh extraction for triage.
    """
    if extractor is None:
        from ..datagen import extract_text as extractor  # type: ignore[assignment]

    extracted = extractor(F.col(html_col))
    expected = F.coalesce(F.col(text_col), F.lit(""))
    html_null = F.col(html_col).isNull()
    # NULL html is a distinct condition, not byte drift: nothing to
    # extract.  With text present it's a missing payload (reported as
    # its own type); with text also NULL there is nothing to check.
    return (
        df.withColumn("__ex", extracted)
        .where(
            F.when(html_null, F.col(text_col).isNotNull()).otherwise(
                ~F.col("__ex").eqNullSafe(expected)
            )
        )
        .select(
            *[F.col(c) for c in id_cols],
            F.lit(text_col).alias("name"),
            F.when(html_null, F.lit("missingHtmlPayload"))
            .otherwise(F.lit("extractionMismatch"))
            .alias("type"),
            F.substring(F.col("__ex"), 1, value_prefix).alias("value"),
        )
    )
