"""SemDeDup-style semantic deduplication (Abbas et al. 2023,
"SemDeDup: Data-efficient learning at web-scale through semantic
deduplication").

The trick that makes embedding dedup tractable at 10^9+ documents:
cluster the embedding space first (k-means), then compare pairs ONLY
within each cluster — the O(N²) global pairwise search becomes
Σ O(|cluster|²), which the operator controls by scaling ``k`` with the
corpus (k ≈ N / target_cluster_size keeps every per-cluster pair block
bounded, the same discipline as the LSH band buckets in
:mod:`..dedup.minhash`).

Shape: one distributed k-means fit (:mod:`.kmeans` — scan-side
assignment against literal centroids, one k·d-sized reduce per update),
then ONE cluster-keyed shuffle into an Arrow-batched ``applyInPandas``
that enumerates each cluster's pairs and computes the dot products /
norms with vectorized numpy.  Each vector crosses the wire exactly once
(the previous cluster-keyed self-join shipped every vector once per
PAIR, and the cosine ran as interpreted higher-order-function folds —
measured 8.1 s of an 11 s query at sf0.1; the numpy form is the
guide-§4.2 "dense linear algebra in native code" case).  Python emits
only integer/scalar pair rows; the division, HALF_UP rounding and
threshold cut stay JVM expressions so their semantics are untouched.

Float discipline (the oracle replays the exact IEEE sequence): products
are elementwise IEEE doubles, and both the dot and the squared norms
are SEQUENTIAL left folds from 0.0 — ``np.add.accumulate`` over a
zero-prepended product row reproduces ``F.aggregate``'s
``((0.0+p0)+p1)+…`` bit-for-bit, so ``dot``/``denom`` equal the old
expression-fold values exactly.

Pairs above ``threshold`` feed the usual survivor machinery
(:func:`~..dedup.components.dedup_groups_from_pairs` /
:func:`~..dedup.keepbest.keep_best`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .kmeans import _fit_assign, _points

__all__ = ["semantic_dedup_pairs"]

from .ann import group_dot_pairs_pdf


def _cluster_pairs(pdf):
    """All (id_a < id_b) pairs within one cluster with the sequential
    dot product and norm-product denominator."""
    return group_dot_pairs_pdf(pdf, extra_cols={"cluster": "cid"})


def semantic_dedup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    *,
    k: "int | None" = None,
    iterations: int = 2,
    threshold: float = 0.95,
    target_cluster_size: int = 1000,
    k_min: int = 8,
) -> DataFrame:
    """Within-cluster near-duplicate pairs
    ``(id_a, id_b, cluster, cos)`` with ``cos >= threshold`` and
    ``id_a < id_b``.

    ``k=None`` (the default) DERIVES the cluster count from the corpus:
    ``k = max(k_min, ceil(n / target_cluster_size))`` via one cheap
    count.  The Σ|cluster|² bound that makes SemDeDup tractable only
    holds when k scales with N — a fixed k at 10^9 vectors degenerates
    to (N/k)²-sized self-join blocks, so a constant default is a scale
    trap; pass an explicit ``k`` to pin it (the contract query does)."""
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    if target_cluster_size < 1:
        raise ValueError(
            f"target_cluster_size must be >= 1, got {target_cluster_size}"
        )
    from ..cache import track

    # the scan-side assignment (kmeans._fit_assign inlines the k
    # centroids as literals) already carries each row's VECTOR, so the
    # pair stage consumes it directly — no (id, cluster) materialization
    # and no id-keyed re-join of the corpus.  The points table is
    # persisted (the fit's update pass and the pair pass both read it)
    # and registered for deferred release rather than leaking one
    # corpus-sized cache per call (the packing.py lesson from round 4's
    # review) — pipelines drop it via cache.release_tracked() after
    # their action.
    pts = track(_points(df, id_col, vec_col).persist())
    if k is None:
        # one count over the (persisted) points table — also materializes
        # the cache the fit and pair passes reuse
        n = pts.count()
        k = max(k_min, -(-n // target_cluster_size))
    av = _fit_assign(pts, k=k, iterations=iterations).select(
        "id", "cid", "v"
    )
    id_type = av.schema["id"].dataType.simpleString()
    pair_schema = (
        f"id_a {id_type}, id_b {id_type}, cluster int, "
        "dot double, denom double"
    )
    pairs = av.groupBy("cid").applyInPandas(_cluster_pairs, pair_schema)
    # division, HALF_UP rounding and the threshold cut stay JVM-side:
    # bit-identical to the old expression form (denom>0 guard included)
    cos = F.when(
        F.col("denom") > 0, F.col("dot") / F.col("denom")
    ).otherwise(F.lit(0.0))
    return (
        pairs.select(
            "id_a", "id_b", "cluster", F.round(cos, 6).alias("cos")
        )
        .where(F.col("cos") >= F.lit(threshold))
    )
