"""SemDeDup-style semantic deduplication (Abbas et al. 2023,
"SemDeDup: Data-efficient learning at web-scale through semantic
deduplication").

The trick that makes embedding dedup tractable at 10^9+ documents:
cluster the embedding space first (k-means), then compare pairs ONLY
within each cluster — the O(N²) global pairwise search becomes
Σ O(|cluster|²), which the operator controls by scaling ``k`` with the
corpus (k ≈ N / target_cluster_size keeps every self-join bucket
bounded, the same discipline as the LSH band buckets in
:mod:`..dedup.minhash`).

Shape: one distributed k-means (:func:`.kmeans.kmeans_assign` — two
shuffles per iteration, k·d-sized reduces), one id-keyed join to carry
vectors onto the assignments, one cluster-keyed self-join for the
within-cluster pairs (AQE handles small clusters via broadcast and
skewed ones via split), and a scan-side cosine filter.  Pairs above
``threshold`` feed the usual survivor machinery
(:func:`~..dedup.components.dedup_groups_from_pairs` /
:func:`~..dedup.keepbest.keep_best`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .ann import cosine
from .kmeans import kmeans_assign

__all__ = ["semantic_dedup_pairs"]


def semantic_dedup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    *,
    k: int = 8,
    iterations: int = 2,
    threshold: float = 0.95,
) -> DataFrame:
    """Within-cluster near-duplicate pairs
    ``(id_a, id_b, cluster, cos)`` with ``cos >= threshold`` and
    ``id_a < id_b``."""
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    from ..cache import track

    # kmeans_assign returns a PERSISTED (materialized) result; the pair
    # plan below stays lazy, so register it for deferred release rather
    # than leaking one corpus-sized cache per call (the packing.py
    # lesson from round 4's review) — pipelines drop it via
    # cache.release_tracked() after their action.
    assign = track(
        kmeans_assign(df, id_col, vec_col, k=k, iterations=iterations)
    ).select("id", "cluster")
    vecs = df.where(
        F.col(id_col).isNotNull() & F.col(vec_col).isNotNull()
    ).select(
        F.col(id_col).alias("id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    )
    av = assign.join(vecs, "id")
    a = av.select(
        F.col("id").alias("id_a"), F.col("cluster"), F.col("v").alias("va")
    )
    b = av.select(
        F.col("id").alias("id_b"),
        F.col("cluster").alias("__cb"),
        F.col("v").alias("vb"),
    )
    pairs = a.join(
        b, (a["cluster"] == b["__cb"]) & (a["id_a"] < b["id_b"])
    )
    cos = cosine(F.col("va"), F.col("vb"))
    return (
        pairs.select(
            "id_a", "id_b", "cluster", F.round(cos, 6).alias("cos")
        )
        .where(F.col("cos") >= F.lit(threshold))
    )
