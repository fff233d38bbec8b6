"""Deterministic Common-Crawl-style documents generator + text extraction.

BASELINE.json input_hint: ``(url string, warc_ts timestamp, html binary,
text string, lang string)``; per-row invariant: byte-identical extracted text
per url.

Everything is a Spark expression over ``spark.range(n)`` — no driver-side
data, no UDFs — so the generator itself scales to any row count across any
number of executors (each partition generates its slice independently) and is
bit-reproducible (pure functions of the row id, no RNG state).

Dirtiness is injected in deterministic residue-class buckets so tests can
assert exact counts:

- ``i % 97 == 13`` → NULL text; ``== 14`` → empty text; ``== 15`` →
  JS-whitespace-padded text (exercises trim parity incl. NBSP/BOM)
- ``i % 23 == 7`` → lang 'xx' (not in allowedValues); ``i % 29 == 11`` →
  NULL lang; ``i % 31 == 30`` → 'EN' (wrong case)
- ``i % 101 == 42`` → url duplicates the previous row's url (uniqueness check)
- host skew: 30% of rows land on host0 (salting/AQE skew evidence), the rest
  spread over ``n_hosts``
- ``i % 89 == 88`` → warc_ts outside the schema's min/max window
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

__all__ = ["generate_documents", "extract_text", "WORDS", "documents_schema"]

WORDS = [
    "data", "query", "table", "row", "scan", "join", "hash", "sort", "spark",
    "batch", "stream", "merge", "filter", "agg", "window", "column", "value",
    "key", "part", "order", "line", "customer", "small", "big", "fast",
    "slow", "the", "a",
]

_EPOCH_2024 = 1704067200  # 2024-01-01T00:00:00Z


def _words_for(i: Column, n_words: Column) -> Column:
    """Deterministic pseudo-text: hash-indexed words joined by spaces."""
    lit_words = F.array(*[F.lit(w) for w in WORDS])
    return F.array_join(
        F.transform(
            F.sequence(F.lit(0), n_words - 1),
            lambda j: F.element_at(lit_words, (F.pmod(F.xxhash64(i, j), F.lit(len(WORDS))) + 1).cast("int")),
        ),
        " ",
    )


def generate_documents(
    spark: SparkSession,
    n_rows: int,
    *,
    n_hosts: int = 500,
    skew_host_fraction: float = 0.3,
    partitions: int | None = None,
) -> DataFrame:
    """The documents table of the north rule, deterministically dirty."""
    df = spark.range(0, n_rows, 1, partitions or spark.sparkContext.defaultParallelism)
    i = F.col("id")

    # --- url with skewed hosts + injected duplicates ------------------------
    skew_cut = int(skew_host_fraction * 100)
    host = F.when(F.pmod(i, 100) < skew_cut, F.lit(0)).otherwise(
        F.pmod(F.xxhash64(i), F.lit(n_hosts))
    )
    base_id = F.when((F.pmod(i, 101) == 42) & (i > 0), i - 1).otherwise(i)
    base_host = F.when(F.pmod(base_id, 100) < skew_cut, F.lit(0)).otherwise(
        F.pmod(F.xxhash64(base_id), F.lit(n_hosts))
    )
    url = F.concat(
        F.lit("https://host"),
        base_host.cast("string"),
        F.lit(".example/p/"),
        base_id.cast("string"),
    )

    # --- warc_ts with an out-of-window bucket --------------------------------
    in_window = F.timestamp_seconds(
        F.lit(_EPOCH_2024) + F.pmod(i * 37, F.lit(365 * 24 * 3600))
    )
    out_window = F.timestamp_seconds(F.lit(_EPOCH_2024) - F.lit(10 * 365 * 24 * 3600))
    warc_ts = F.when(F.pmod(i, 89) == 88, out_window).otherwise(in_window)

    # --- text with dirtiness buckets -----------------------------------------
    n_words = (F.pmod(F.xxhash64(i * 31 + 7), F.lit(110)) + 10).cast("int")
    clean_text = _words_for(i, n_words)
    text = (
        F.when(F.pmod(i, 97) == 13, F.lit(None).cast("string"))
        .when(F.pmod(i, 97) == 14, F.lit(""))
        .when(
            F.pmod(i, 97) == 15,
            F.concat(F.lit("   "), clean_text, F.lit("\t ﻿")),
        )
        .otherwise(clean_text)
    )

    # --- html wraps text; extraction is byte-exact ---------------------------
    html = F.encode(
        F.concat(
            F.lit("<html><head><title>Doc "),
            i.cast("string"),
            F.lit("</title></head><body><p>"),
            F.coalesce(text, F.lit("")),
            F.lit("</p></body></html>"),
        ),
        "UTF-8",
    )

    # --- lang with invalid / null / wrong-case buckets ------------------------
    langs = F.array(F.lit("en"), F.lit("de"), F.lit("fr"), F.lit("es"), F.lit("zh"))
    lang = (
        F.when(F.pmod(i, 23) == 7, F.lit("xx"))
        .when(F.pmod(i, 29) == 11, F.lit(None).cast("string"))
        .when(F.pmod(i, 31) == 30, F.lit("EN"))
        .otherwise(F.element_at(langs, (F.pmod(i, 5) + 1).cast("int")))
    )

    return df.select(
        url.alias("url"),
        warc_ts.alias("warc_ts"),
        html.alias("html"),
        text.alias("text"),
        lang.alias("lang"),
    )


def extract_text(html: Column) -> Column:
    """Byte-identical text extraction from the html payload.

    The north-rule invariant: ``extract_text(html) == text`` for every row
    where text is non-null (NULL text renders as an empty ``<p></p>``).
    Pure JVM expression — decode + anchored regex, no Python.
    """
    return F.regexp_extract(
        F.decode(html, "UTF-8"), "(?s)<p>(.*)</p>", 1
    )


def documents_schema():
    """The validation schema for the documents table (FIXTURES.md F1)."""
    import datetime
    import re

    from .schema import SimpleSchema

    return SimpleSchema(
        {
            "url": {
                "type": str,
                "regEx": re.compile(r"^https?://[^\s]+$"),
                "max": 2048,
            },
            "warc_ts": {
                "type": SimpleSchema.Date,
                "min": datetime.datetime(2024, 1, 1, tzinfo=datetime.timezone.utc),
                "max": datetime.datetime(2025, 1, 1, tzinfo=datetime.timezone.utc),
            },
            "html": {"type": SimpleSchema.Binary},
            "text": {"type": str, "optional": True},
            "lang": {
                "type": str,
                "optional": True,
                "allowedValues": ["en", "de", "fr", "es", "zh"],
            },
        }
    )
