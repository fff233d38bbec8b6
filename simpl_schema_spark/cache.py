"""Persist-lifecycle helper for multi-stage operators.

Operators like the dedup candidate generators persist intermediates (shingle
sets, signatures, candidate metadata) because several downstream stages of a
single action consume them — without an eager ``count()`` those stages race
to populate the cache and recompute the pipeline (measured 3x wall).  But a
long-lived session composing many operators then accumulates cached
partitions until eviction pressure.

:func:`materialize_and_release` closes the loop: the operator's (small,
final) result is persisted and eagerly materialized, after which every
intermediate cache is dropped.  Callers get a warm, reusable DataFrame and
the session holds only result-sized state per operator invocation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = [
    "materialize_and_release",
    "lazy_result",
    "track",
    "release_tracked",
]

#: persisted intermediates whose lifetime outlives their operator call
#: (e.g. the prefix-sum grid a lazy join-back still reads from) — drained
#: by :func:`release_tracked` between pipeline stages
_TRACKED: "list[DataFrame]" = []


def materialize_and_release(result: DataFrame, *intermediates: DataFrame) -> DataFrame:
    """Persist + eagerly materialize ``result``, then unpersist the
    ``intermediates`` (non-blocking).  Returns the persisted result."""
    out = result.persist()
    out.count()
    for df in intermediates:
        df.unpersist(blocking=False)
    return out


def lazy_result(result: DataFrame, *intermediates: DataFrame) -> DataFrame:
    """Persist ``result`` LAZILY and register it plus the
    still-referenced ``intermediates`` for deferred release — the
    caller's first action materializes everything, one fewer eager job
    than :func:`materialize_and_release`.

    Safe when the result is consumed by a single downstream action, or
    when recomputing it from the (still-cached) intermediates is
    result-sized work — the typical shape of the dedup operators' final
    pair tables, whose expensive inputs are already eagerly cached."""
    out = track(result.persist())
    for df in intermediates:
        track(df)
    return out


def track(df: DataFrame) -> DataFrame:
    """Register a persisted DataFrame for deferred release.

    Some operators must return a LAZY plan that still reads a persisted
    intermediate (releasing it inline would force a full recompute at the
    caller's action).  They register it here instead of leaking it; long
    pipelines call :func:`release_tracked` between stages to bound
    executor storage.
    """
    _TRACKED.append(df)
    return df


def release_tracked() -> int:
    """Unpersist every tracked intermediate (non-blocking).  Call after
    the consuming action has materialized — typically between pipeline
    stages.  Returns how many were released."""
    n = len(_TRACKED)
    while _TRACKED:
        _TRACKED.pop().unpersist(blocking=False)
    return n
