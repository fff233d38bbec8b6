"""Distributed Lloyd's k-means over embedding columns.

Embedding-space clustering is the workhorse of corpus curation at scale
— topic bucketing, cluster-balanced sampling (DCLM/SemDeDup-style), and
IVF index training (:mod:`.ivf` trains on a driver-side sample; this is
the full-corpus distributed variant for when the sample isn't enough).

Shape per iteration: the k centroids are k·d doubles — they are pulled
to the driver (k rows, never anything corpus-sized) and inlined as
LITERAL arrays, so assignment is a pure scan-side projection: k
fold-distances + one ``array_min`` argmin per row, fused into
whole-stage codegen with ZERO shuffle and no k×N exploded intermediate.
(The previous shape — crossJoin against a broadcast k-row table +
``groupBy(id).min(struct)`` — shuffled the full corpus, vectors
included, once per iteration; the rewrite removes that exchange
entirely.)  The centroid update posexplodes assigned vectors to
(cid, dim) rows and re-averages — map-side combinable, reduce side
k·d-sized — and is the only shuffle left per iteration.

Determinism/portability: initial centroids are the k vectors with the
globally smallest ``hash_key(id)`` (the repo's engine-portable md5
selection — TakeOrdered, no global sort), distances are sequential
left-fold sums (identical FP sequence cross-engine; literal centroid
doubles round-trip the driver exactly, so the sequence is unchanged),
argmin ties break to the smallest centroid id (``array_min`` over
(dist, cid) structs ≡ the old ``min(struct)``), and updated centroid
coordinates are ROUNDED (default 9 dp) so accumulation-order float
noise can never flip a later assignment between engines.  Empty
clusters simply vanish (matching the plain-SQL replay); surviving
clusters keep their original cid.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..sampling import hash_key

__all__ = ["kmeans_assign"]


def _points(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """Null-filtered ``(id, v double[])`` projection shared by
    :func:`kmeans_assign` and the SemDeDup caller."""
    return df.where(
        F.col(id_col).isNotNull() & F.col(vec_col).isNotNull()
    ).select(
        F.col(id_col).alias("id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    )


def _argmin_udf(cents: list[tuple[int, list[float]]]):
    """Arrow-batched nearest-centroid assignment:
    ``v → struct(cid int, d double)``.

    Dense distance arithmetic in vectorized numpy (guide §4.2) with the
    EXACT FP sequence of the expression form it replaces
    (``aggregate(zip_with(v, c, (a-b)*(a-b)), 0.0, acc+x)`` then
    ``min(struct(d, cid))``): per-element double subtract/multiply, a
    sequential left-fold double sum from 0.0 (``np.add.accumulate``
    with a zero prepend), and argmin ties breaking to the smallest cid
    (``np.argmin`` returns the first minimum; NaN distances are mapped
    to +inf for the argmin only, matching Spark's NaN-sorts-last
    ordering, while the reported ``d`` keeps the raw value)."""
    import numpy as np
    import pandas as pd

    from pyspark.sql import types as T

    cids = np.array([cid for cid, _c in cents], dtype=np.int32)
    cmat = np.array([c for _cid, c in cents], dtype=np.float64)

    # NOTE: no type hints — Series→DataFrame(struct) is declared via the
    # explicit returnType; hinted signatures trip the eval-type inference
    def _assign(vs):
        mat = np.stack(vs.to_numpy()).astype(np.float64)
        diff = mat[:, None, :] - cmat[None, :, :]
        prods = diff * diff
        z = np.zeros(prods.shape[:2] + (1,), dtype=np.float64)
        dists = np.add.accumulate(
            np.concatenate([z, prods], axis=2), axis=2
        )[:, :, -1]
        pick = np.argmin(
            np.where(np.isnan(dists), np.inf, dists), axis=1
        )
        rows = np.arange(len(mat))
        return pd.DataFrame(
            {"cid": cids[pick], "d": dists[rows, pick]}
        )

    return F.pandas_udf(
        _assign,
        T.StructType(
            [
                T.StructField("cid", T.IntegerType()),
                T.StructField("d", T.DoubleType()),
            ]
        ),
    )


def _fit_assign(
    pts: DataFrame,
    *,
    k: int,
    iterations: int,
    round_decimals: int = 9,
) -> DataFrame:
    """Lazy ``(id, v, cid, d)`` after ``iterations`` assignment passes over
    a (persisted) ``(id, v)`` points table.  Driver state is k·d doubles;
    per-update cost is one k·d-sized aggregation job."""
    # deterministic init: k globally-smallest md5-hash ids (TakeOrdered —
    # k rows cross the wire, no global sort); cid = rank among those k
    init_rows = (
        pts.select(hash_key(F.col("id")).alias("hk"), "id", "v")
        .orderBy("hk", "id")
        .limit(k)
        .collect()
    )
    init_rows.sort(key=lambda r: (r["hk"], r["id"]))
    cents: list[tuple[int, list[float]]] = [
        (i, list(r["v"])) for i, r in enumerate(init_rows)
    ]

    for it in range(iterations):
        m = _argmin_udf(cents)(F.col("v"))
        assigned = pts.select(
            "id", "v", m["cid"].alias("cid"), m["d"].alias("d")
        )
        if it == iterations - 1:
            return assigned
        # centroid update: (cid, pos)-keyed re-average — map-side
        # combinable, k·d rows on the reduce side and on the driver
        mean_rows = (
            assigned.select("cid", F.posexplode("v").alias("pos", "x"))
            .groupBy("cid", "pos")
            .agg(F.round(F.avg("x"), round_decimals).alias("m"))
            .collect()
        )
        by_cid: dict[int, dict[int, float]] = {}
        for r in mean_rows:
            by_cid.setdefault(r["cid"], {})[r["pos"]] = r["m"]
        # empty clusters vanish; survivors keep their original cid
        cents = [
            (cid, [coords[p] for p in sorted(coords)])
            for cid, coords in sorted(by_cid.items())
        ]
    raise AssertionError("unreachable")


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

    pts = _points(df, id_col, vec_col).persist()
    assigned = _fit_assign(
        pts, k=k, iterations=iterations, round_decimals=round_decimals
    )
    out = assigned.select(
        "id", F.col("cid").alias("cluster"), F.round("d", 6).alias("dist")
    )
    from ..cache import lazy_result

    return lazy_result(out, pts)
