"""Gap-based event sessionization over a (user, timestamp) event stream.

Classic web-analytics sessionization: order each user's events by time and
start a new session whenever the inter-event gap exceeds ``gap``; emit a
per-event session index (for event-level enrichment) and per-session
rollups (counts, duration, span).

Scale shape
-----------
One shuffle, keyed by the user column: ``Window.partitionBy(user)`` sorts
each user's events inside their partition — there is NO global-order
window anywhere (an unpartitioned Window is the classic single-task
collapse; see PLANS.md).  Per-user event counts are human/bot-bounded in
web data; for adversarial hot keys the caller pre-caps with
``dedup.keep_best``-style top-n per user or filters bot UAs upstream —
the operator itself never buffers more than one user's events per task
window frame (lag/sum frames are streaming, not materialized).

The microsecond arithmetic uses ``unix_micros`` so an external engine
replays the boundary decisions exactly (DuckDB: ``epoch_us``).  Boundary
semantics: an inter-event gap STRICTLY GREATER than ``gap_us`` opens a
new session; equal-to-gap stays in-session.  Ties on the timestamp are
broken by the id column so session indices are deterministic.

For streaming input, Spark's native ``F.session_window`` (groupBy user +
session_window(ts, gap)) is the watermark-aware equivalent of
:func:`session_stats`; its merge rule (new session at diff >= gap) is
one microsecond stricter than the batch rule here — documented so the
two are never mixed in one corpus.
"""

from __future__ import annotations

import datetime

from pyspark.sql import Column, DataFrame, Window, functions as F
from pyspark.sql.types import TimestampNTZType

__all__ = ["sessionize", "session_stats", "epoch_micros"]


def epoch_micros(df: DataFrame, ts_col: str) -> Column:
    """Microseconds since 1970-01-01 for either timestamp flavor.

    TIMESTAMP_NTZ has no instant, so ``unix_micros`` rejects it; the
    wall-clock difference from an NTZ epoch literal via ``timestamp_diff``
    equals DuckDB's ``epoch_us`` on the same naive value.  TIMESTAMP
    (instant semantics) uses ``unix_micros`` directly.

    Caveat: Spark's ``TimestampDiff`` coerces NTZ operands through the
    SESSION-timezone cast (observed on 4.1: ``cast(ts as timestamp)`` in
    the plan), so for NTZ inputs the session timezone must be a
    fixed-offset zone (``spark.sql.session.timeZone=UTC``, this repo's
    standard) — under a DST-shifting zone, wall-clocks inside a spring-
    forward gap would corrupt the difference.
    """
    c = F.col(ts_col)
    if isinstance(df.schema[ts_col].dataType, TimestampNTZType):
        epoch = F.lit(datetime.datetime(1970, 1, 1)).cast("timestamp_ntz")
        return F.timestamp_diff("MICROSECOND", epoch, c)
    return F.unix_micros(c)


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    *,
    gap_minutes: float = 30.0,
) -> DataFrame:
    """Input columns + ``session_idx`` (0-based per user, time-ordered).

    A session break happens when the gap to the previous event of the SAME
    user exceeds ``gap_minutes``.  The first event of each user is session
    0.  Deterministic under timestamp ties via the ``id_col`` tie-break.
    """
    gap_us = int(gap_minutes * 60_000_000)
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    us = epoch_micros(df, ts_col)
    prev = F.lag(us).over(w)
    is_break = F.when(
        prev.isNull() | ((us - prev) <= gap_us), F.lit(0)
    ).otherwise(F.lit(1))
    # running sum of breaks = 0-based session index; the sum window frame
    # is an explicit ROWS unbounded-preceding..current over the SAME
    # (user, ts, id) order, so Spark evaluates both in one sort pass.
    # ROWS (not the default RANGE) because RANGE makes PEER rows —
    # duplicate (ts, id) pairs for one user — share the running sum,
    # diverging from the oracle's ROWS frame; (ts_col, id_col) should be
    # unique per user, and with ROWS the index is well-defined even when
    # they are not.
    w_sum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn(
        "session_idx", F.sum(is_break).over(w_sum).cast("long")
    )


def session_stats(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    *,
    gap_minutes: float = 30.0,
) -> DataFrame:
    """Per-session rollup: one row per (user, session_idx) with event
    count, micro-exact duration, and the session's time span.  Same single
    user-keyed shuffle as :func:`sessionize`; the rollup groups by the
    partition key plus a derived column, so AQE coalesces it onto the
    existing exchange."""
    s = sessionize(
        df, user_col, ts_col, id_col, gap_minutes=gap_minutes
    )
    us = epoch_micros(df, ts_col)
    return (
        s.groupBy(user_col, "session_idx")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            (F.max(us) - F.min(us)).alias("duration_us"),
            F.min(id_col).alias("first_event_id"),
        )
    )
