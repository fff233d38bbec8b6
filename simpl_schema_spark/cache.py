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

__all__ = ["materialize_and_release"]


def materialize_and_release(result: DataFrame, *intermediates: DataFrame) -> DataFrame:
    """Persist + eagerly materialize ``result``, then unpersist the
    ``intermediates`` (non-blocking).  Returns the persisted result."""
    out = result.persist()
    out.count()
    for df in intermediates:
        df.unpersist(blocking=False)
    return out
