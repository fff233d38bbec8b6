"""Distributed Lloyd's k-means over embedding columns.

Embedding-space clustering is the workhorse of corpus curation at scale
— topic bucketing, cluster-balanced sampling (DCLM/SemDeDup-style), and
IVF index training (:mod:`.ivf` trains on a driver-side sample; this is
the full-corpus distributed variant for when the sample isn't enough).

Shape per iteration: assignment is a crossJoin against the BROADCAST
k-row centroid table (k × N intermediate rows, scan-fused arithmetic,
argmin via one ``min(struct(dist, cid))`` hash aggregation — no window
over the corpus); the centroid update posexplodes assigned vectors to
(cid, dim) rows and re-averages — both aggregations are map-side
combinable, so each iteration is two shuffles whose reduce side is
k·d-sized.  Centroids (k rows) are persisted per iteration; nothing
row-count-sized ever reaches the driver.

Determinism/portability: initial centroids are the k vectors with the
globally smallest ``hash_key(id)`` (the repo's engine-portable md5
selection — TakeOrdered, no global sort), distances are sequential
left-fold sums (identical FP sequence cross-engine), argmin ties break
to the smallest centroid id, and updated centroid coordinates are
ROUNDED (default 9 dp) so accumulation-order float noise can never flip
a later assignment between engines.  Empty clusters simply vanish
(matching the plain-SQL replay).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..sampling import hash_key

__all__ = ["kmeans_assign"]


def kmeans_assign(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    *,
    k: int = 8,
    iterations: int = 2,
    round_decimals: int = 9,
) -> DataFrame:
    """``(id, cluster, dist)`` after ``iterations`` assignment passes
    (so ``iterations - 1`` centroid updates).  ``dist`` is the squared
    L2 distance to the final centroid, rounded to 6 dp."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")

    pts = (
        df.where(F.col(id_col).isNotNull() & F.col(vec_col).isNotNull())
        .select(
            F.col(id_col).alias("id"),
            F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
        )
        .persist()
    )
    pts.count()

    # deterministic init: k globally-smallest md5-hash ids (TakeOrdered —
    # k rows cross the wire, no global sort); cid = rank among those k
    init = pts.select(hash_key(F.col("id")).alias("hk"), "id", "v").orderBy(
        "hk", "id"
    ).limit(k)
    w = Window.orderBy("hk", "id")  # k-row frame: the window is fine here
    cents = init.select(
        (F.row_number().over(w) - 1).cast("int").alias("cid"),
        F.col("v").alias("c"),
    ).persist()
    cents.count()

    dist = F.aggregate(
        F.zip_with(F.col("v"), F.col("c"), lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    assigned = None
    for it in range(iterations):
        assigned = (
            pts.crossJoin(F.broadcast(cents))
            .select("id", "v", "cid", dist.alias("d"))
            .groupBy("id")
            .agg(
                F.min(F.struct(F.col("d").alias("d"), F.col("cid").alias("cid"))).alias("m"),
                F.first("v").alias("v"),  # constant within the group
            )
            .select("id", "v", F.col("m.cid").alias("cid"), F.col("m.d").alias("d"))
        )
        if it == iterations - 1:
            break
        means = (
            assigned.select("cid", F.posexplode("v").alias("pos", "x"))
            .groupBy("cid", "pos")
            .agg(F.avg("x").alias("m"))
        )
        new_cents = (
            means.groupBy("cid")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select(
                "cid",
                F.transform(
                    "pm", lambda s: F.round(s["m"], round_decimals)
                ).alias("c"),
            )
            .persist()
        )
        new_cents.count()
        cents.unpersist(blocking=False)
        cents = new_cents

    out = assigned.select(
        "id", F.col("cid").alias("cluster"), F.round("d", 6).alias("dist")
    )
    from ..cache import materialize_and_release

    return materialize_and_release(out, pts, cents)
