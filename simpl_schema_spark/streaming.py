"""Structured Streaming validation (SURVEY §2.8 sinks + streaming surface).

The violation projection is STATELESS, so the exact same compiled rule
forest runs on a streaming DataFrame unchanged — validation of a document
stream is `readStream → with_violations → writeStream`.  Stateful additions
(windowed violation-rate monitoring with watermarks for late events) are the
streaming analog of the drift checks.
"""

from __future__ import annotations

from typing import Iterable, Optional

from pyspark.sql import DataFrame, functions as F

from .schema.schema import SimpleSchema
from .validate import with_violations

__all__ = ["validate_stream", "streaming_violation_counts"]


def validate_stream(
    stream_df: DataFrame,
    schema: SimpleSchema,
    **kwargs,
) -> DataFrame:
    """Streaming DF + violations column. Stateless: no watermark needed."""
    return with_violations(stream_df, schema, **kwargs)


def streaming_violation_counts(
    stream_df: DataFrame,
    schema: SimpleSchema,
    *,
    ts_col: str = "warc_ts",
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
    **kwargs,
) -> DataFrame:
    """Windowed violation counts by error type with late-data watermarking.

    Output per (window, type): violation count — the streaming health
    signal a validation pipeline alerts on.  Watermark bounds state so the
    aggregation runs indefinitely at constant memory.
    """
    validated = with_violations(stream_df, schema, **kwargs)
    exploded = (
        validated.withWatermark(ts_col, watermark)
        .select(F.col(ts_col), F.explode("violations").alias("v"))
        .select(ts_col, F.col("v.type").alias("violation_type"))
    )
    return exploded.groupBy(
        F.window(F.col(ts_col), window_duration).alias("window"),
        "violation_type",
    ).agg(F.count(F.lit(1)).alias("violation_count"))
