"""Exact corpus-global ranking — percentile quality filtering at scale.

"Keep the top X% by quality score" is the canonical training-data filter
(quality classifiers in C4/RefinedWeb/Dolma all end in a percentile
threshold).  The naive Spark spelling —
``percent_rank().over(Window.orderBy(score))`` — is a GLOBAL ordered
window: one task sorts the entire corpus.  The exact distributed form
only needs per-distinct-score counts plus a prefix sum over the
(much smaller) distinct-score grid:

    n_below(row) = Σ count(s)  for all distinct scores s < row.score
    percent_rank = n_below / (n - 1)        (SQL PERCENT_RANK, ties share)

so it composes from one hash aggregation, :func:`.packing.
exclusive_prefix_sum` over the score grid, and a join back that AQE
broadcasts whenever the grid is small.  No global single-task anything.

Outputs are exact integers (``n_below``, ``n_total``) — engine-portable,
hash-comparable — with the float percent-rank derivable by the caller.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .cache import track
from .packing import exclusive_prefix_sum

__all__ = ["exact_rank_counts", "percentile_filter"]


def exact_rank_counts(
    df: DataFrame,
    score_col: str,
) -> DataFrame:
    """``df`` plus ``n_below`` (rows with a strictly smaller score —
    ties share, matching SQL ``PERCENT_RANK``/``RANK`` semantics) and
    ``n_total``.  NULL-score rows are excluded (they have no rank)."""
    base = df.where(F.col(score_col).isNotNull())
    grid = base.groupBy(score_col).agg(F.count(F.lit(1)).alias("__c"))
    pre = exclusive_prefix_sum(
        grid, order_col=score_col, value_col="__c", out_col="n_below"
    )
    # the persisted score grid feeds two lazy branches (totals + join)
    # that only materialize at the caller's action — tracked so
    # cache.release_tracked() can drop it afterwards instead of leaking
    track(pre)
    totals = pre.agg(F.sum("__c").alias("n_total"))
    return (
        base.join(pre.select(score_col, "n_below"), score_col)
        .crossJoin(F.broadcast(totals))
    )


def percentile_filter(
    df: DataFrame,
    score_col: str,
    *,
    min_percentile: float,
) -> DataFrame:
    """Rows whose exact percent-rank by ``score_col`` is at least
    ``min_percentile`` (in [0, 1]; ties share rank, so slightly more
    than ``(1-min_percentile)`` of rows can survive).  Single-score
    corpora (n_total == 1) rank 0.0, as in SQL."""
    if not 0.0 <= min_percentile <= 1.0:
        raise ValueError(
            f"min_percentile must be in [0, 1], got {min_percentile}"
        )
    ranked = exact_rank_counts(df, score_col)
    # n_below / (n_total - 1) >= p  ⟺  n_below >= p * (n_total - 1),
    # compared in exact-int vs double — no float rank column needed
    return ranked.where(
        (F.col("n_total") > 1)
        & (F.col("n_below") >= min_percentile * (F.col("n_total") - 1))
        | ((F.col("n_total") == 1) & F.lit(min_percentile <= 0.0))
    )
