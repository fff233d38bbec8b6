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
from .validation import with_violations

__all__ = [
    "validate_stream",
    "streaming_violation_counts",
    "stream_dedup_exact",
    "streaming_category_counts",
    "psi_per_window",
    "streaming_pii_rates",
    "streaming_sessions",
]


def stream_dedup_exact(
    stream_df: DataFrame,
    *,
    text_col: str = "text",
    ts_col: str = "warc_ts",
    watermark: str = "10 minutes",
    fp_col: str = "__fp",
) -> DataFrame:
    """Streaming exact dedup for crawl ingestion: keep the first arrival of
    each (normalized) content fingerprint.

    ``dropDuplicatesWithinWatermark`` on a 64-bit fingerprint — NOT the
    text — so the dedup state store holds one long per distinct document
    inside the watermark horizon, and late re-crawls beyond the horizon age
    out instead of growing state forever (the batch analog is
    ``dedup/exact.dedup_exact``; the horizon bound is what makes the
    streaming form viable at crawl scale).
    """
    from .text.analysis import fingerprint

    keyed = stream_df.withWatermark(ts_col, watermark).withColumn(
        fp_col, fingerprint(F.col(text_col))
    )
    return keyed.dropDuplicatesWithinWatermark([fp_col]).drop(fp_col)


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


def streaming_category_counts(
    stream_df: DataFrame,
    col: str,
    *,
    ts_col: str = "warc_ts",
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Windowed per-category counts — the STREAMING half of drift
    monitoring.  Watermark bounds the aggregation state; output per
    ``(window, category)``: count.  Feed the result to
    :func:`psi_per_window` inside ``foreachBatch`` (Spark forbids a second
    streaming aggregation in the same query)."""
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(
            F.window(F.col(ts_col), window_duration).alias("window"),
            F.col(col).alias("category"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def psi_per_window(
    window_counts: DataFrame,
    baseline_counts: DataFrame,
    *,
    epsilon: float = 1e-4,
) -> DataFrame:
    """Per-window PSI of windowed category counts vs a static baseline
    profile — the ``foreachBatch`` half of streaming drift monitoring.

    ``window_counts``: ``(window, category, cnt)`` (the output of
    :func:`streaming_category_counts`); ``baseline_counts``:
    ``(category, cnt)`` (the frozen profile,
    :func:`.checks.categorical_counts` of the baseline corpus).  Same
    smoothing and statistic as :func:`.checks.categorical_drift_psi`, per
    window.  Scale shape: the baseline (and the per-batch window list) is
    tiny and broadcast; the only non-trivial input is the already-reduced
    count table.  Returns ``(window, psi, n_current, n_categories)``.
    """
    base = baseline_counts.select(
        F.col("category"), F.col("cnt").alias("base_cnt")
    )
    # every (window × baseline-category) cell exists even when the window
    # saw zero of that category — absence IS drift signal
    grid = window_counts.select("window").distinct().crossJoin(
        F.broadcast(base)
    )
    # NULL-SAFE category equality: a NULL category is a real bucket (e.g.
    # missing lang) and must line up across the two sides — plain join
    # keys would leave both null rows unmatched and double-count the
    # bucket as drift
    j = (
        grid.alias("g")
        .join(
            window_counts.alias("c"),
            (F.col("g.window") == F.col("c.window"))
            & F.col("g.category").eqNullSafe(F.col("c.category")),
            "full_outer",
        )
        .select(
            F.coalesce(F.col("g.window"), F.col("c.window")).alias("window"),
            F.coalesce(F.col("c.cnt"), F.lit(0)).alias("obs"),
            F.coalesce(F.col("g.base_cnt"), F.lit(0)).alias("base_cnt"),
        )
    )
    # per-window totals via window sums — one pass over the (tiny,
    # already-reduced) count table instead of a totals join that would
    # evaluate the grid join twice; the shared psi_term keeps the
    # smoothing/statistic identical to the batch checks
    from pyspark.sql import Window as W

    from .checks.drift import psi_term

    w = W.partitionBy("window")
    j2 = j.withColumn("n_cur", F.sum("obs").over(w)).withColumn(
        "n_base", F.sum("base_cnt").over(w)
    )
    term = psi_term(
        F.col("obs"), F.col("base_cnt"), F.col("n_cur"), F.col("n_base"),
        epsilon,
    )
    return j2.groupBy("window").agg(
        F.sum(term).alias("psi"),
        F.sum("obs").alias("n_current"),
        F.count(F.lit(1)).alias("n_categories"),
    )


def streaming_pii_rates(
    stream_df: DataFrame,
    text_col: str = "text",
    *,
    ts_col: str = "warc_ts",
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Windowed PII incidence over a document stream — the live-ingest
    side of :mod:`.text.pii` (a crawl whose email rate jumps 100x is a
    parser bug or a leaked dump; both need an alert, not a batch job).

    Output per window: ``n_docs``, one ``docs_<class>`` column per PII
    class (documents containing at least one match — rates are
    ``docs_x / n_docs``), and ``matches_<class>`` totals.  The per-row
    regex work is stateless map-side expression; only the tiny per-window
    counters are stateful, watermark-bounded.
    """
    from .text.pii import PII_PATTERNS

    flagged = stream_df.withWatermark(ts_col, watermark)
    aggs = [F.count(F.lit(1)).alias("n_docs")]
    for name, (pat, _) in PII_PATTERNS.items():
        n = F.regexp_count(F.col(text_col), F.lit(pat))
        aggs.append(
            F.sum(F.when(n > 0, 1).otherwise(0)).alias(f"docs_{name}")
        )
        aggs.append(F.sum(F.coalesce(n, F.lit(0))).alias(f"matches_{name}"))
    return flagged.groupBy(
        F.window(F.col(ts_col), window_duration).alias("window")
    ).agg(*aggs)


def stateful_host_violation_tracker(
    stream_df: DataFrame,
    schema: SimpleSchema,
    *,
    url_col: str = "url",
    threshold: int = 10,
    timeout_ms: int = 3_600_000,
    **kwargs,
) -> DataFrame:
    """Custom stateful operator: running per-host violation totals with
    alerting — `applyInPandasWithState` (the brief's "custom stateful
    operators" surface).

    State per host: (n_docs, n_violations). Emits one row per host per
    micro-batch once its cumulative violation count crosses ``threshold``.
    State expires after ``timeout_ms`` of inactivity so the map stays
    bounded on an open-ended crawl stream.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql import functions as F, types as T

    validated = with_violations(stream_df, schema, **kwargs)
    per_doc = validated.select(
        F.regexp_extract(F.col(url_col), r"^https?://([^/]+)", 1).alias("host"),
        F.size("violations").alias("n_violations"),
    )

    out_schema = "host string, n_docs bigint, n_violations bigint"
    state_schema = "n_docs bigint, n_violations bigint"

    def track(key, pdf_iter, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        n_docs, n_viol = state.get if state.exists else (0, 0)
        for pdf in pdf_iter:
            n_docs += len(pdf)
            n_viol += int(pdf["n_violations"].sum())
        state.update((n_docs, n_viol))
        state.setTimeoutDuration(timeout_ms)
        if n_viol >= threshold:
            yield pd.DataFrame(
                {"host": [key[0]], "n_docs": [n_docs], "n_violations": [n_viol]}
            )

    return per_doc.groupBy("host").applyInPandasWithState(
        track,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def streaming_sessions(
    stream_df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    *,
    gap_minutes: int = 30,
    timeout_ms: int = 3_600_000,
) -> DataFrame:
    """Streaming gap-based sessionization — the stateful-stream analog of
    :func:`.sessions.session_stats`, via ``applyInPandasWithState``.

    State per user: the OPEN session ``(start_us, end_us, n_events)``.
    Each micro-batch folds the user's events (sorted by event time) into
    it; an inactivity gap > ``gap_minutes`` CLOSES the running session —
    emitted with ``closed_by='gap'`` — and starts a new one.  A user
    idle for ``timeout_ms`` of processing time has their open session
    emitted with ``closed_by='timeout'`` and state removed, so the state
    map stays bounded on an open-ended stream.

    Cross-batch ordering caveat (documented, not a bug): events are
    sorted WITHIN each batch; an event arriving in a later batch with an
    event time inside the open session extends/backfills it (start/end
    clamp, count increments), but one older than an already-gap-closed
    session cannot reopen it — the same horizon trade-off as a
    watermark.  Batch :mod:`.sessions` is the exact-replay path.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = int(gap_minutes) * 60_000_000
    # null-timestamp rows carry no ordering information and pandas would
    # otherwise fold NaT into a garbage int64 — drop them scan-side
    # group on the user column in its NATIVE type: a hard cast to long
    # would turn non-numeric user ids into NULL after the null filter,
    # silently merging all such users into one shared session state
    ev = stream_df.where(
        F.col(user_col).isNotNull() & F.col(ts_col).isNotNull()
    ).select(
        F.col(user_col).alias("user_id"),
        F.col(ts_col).alias("__ts"),
    )
    user_type = ev.schema["user_id"].dataType.simpleString()
    out_schema = (
        f"user_id {user_type}, session_start_us bigint, "
        "session_end_us bigint, n_events bigint, closed_by string"
    )
    state_schema = "start_us bigint, end_us bigint, n_events bigint"

    def _row(key, cur, why):
        return {
            "user_id": [key[0]],
            "session_start_us": [cur[0]],
            "session_end_us": [cur[1]],
            "n_events": [cur[2]],
            "closed_by": [why],
        }

    def fold(key, pdf_iter, state: GroupState):
        if state.hasTimedOut:
            if state.exists:
                cur = list(state.get)
                yield pd.DataFrame(_row(key, cur, "timeout"))
            state.remove()
            return
        ts: list = []
        for pdf in pdf_iter:
            col = pdf["__ts"].astype("datetime64[us]").astype("int64")
            ts.extend(int(t) for t in col)
        ts.sort()
        cur = list(state.get) if state.exists else None
        closed = []
        for t in ts:
            if cur is None:
                cur = [t, t, 1]
            elif t - cur[1] > gap_us:
                closed.append(_row(key, cur, "gap"))
                cur = [t, t, 1]
            else:
                cur[0] = min(cur[0], t)   # late backfill inside session
                cur[1] = max(cur[1], t)
                cur[2] += 1
        if cur is not None:
            state.update(tuple(cur))
            state.setTimeoutDuration(timeout_ms)
        for r in closed:
            yield pd.DataFrame(r)

    return ev.groupBy("user_id").applyInPandasWithState(
        fold,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
