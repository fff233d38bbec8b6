"""IVF (inverted-file) approximate nearest-neighbor search.

The scale path for embedding similarity beyond hyperplane LSH (sim/ann.py):

1. **train**: k-means centroids on a driver-side SAMPLE (centroids are tiny
   — k × dim floats; Lloyd iterations in numpy, seed-fixed)
2. **index**: every corpus vector gets its nearest-centroid id via ONE
   Arrow-batched pandas UDF (numpy matmul per batch — the vectorized path
   for dense linear algebra); at scale, repartition/bucket the indexed table
   by ``cluster_id`` so each probe touches only co-located partitions
3. **search**: queries probe their ``nprobe`` nearest centroid cells; the
   corpus is filtered to probed cells BEFORE any join (partition pruning at
   scale), then exact cosine + per-query top-k aggregation (no global sort)

``nprobe = n_centroids`` degenerates to exact brute force — the oracle gate:
IVF with full probing must equal the brute-force top-k bit-for-bit.  Recall
at ``nprobe < n_centroids`` is the tested approximation knob.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from pyspark.sql import Column, DataFrame, functions as F, types as T

from .ann import cosine, topk_per_query

__all__ = [
    "train_centroids",
    "with_cluster_id",
    "ivf_topk",
    "write_ivf_index",
    "read_ivf_index",
]


def train_centroids(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    n_centroids: int = 16,
    sample_size: int = 10_000,
    iters: int = 10,
    seed: int = 42,
) -> np.ndarray:
    """Seed-fixed Lloyd k-means on a driver-side sample → (k, dim) array.

    The sample is capped (`sample_size` rows via limit on a deterministic
    hash order) — bounded memory (TakeOrderedAndProject), but the hash
    ORDERING means each training call still SCANS the full corpus once to
    rank rows.  That's the deliberate price of a deterministic sample;
    train once and persist the result with :func:`write_ivf_index` rather
    than re-training per query batch.
    """
    rows = (
        df.select(F.col(vec_col).alias("v"))
        .where(F.col(vec_col).isNotNull())
        .orderBy(F.xxhash64(F.col(vec_col).cast("array<float>").cast("string"), F.lit(seed)))
        .limit(sample_size)
        .collect()
    )
    x = np.array([r.v for r in rows], dtype=np.float64)
    if len(x) < n_centroids:
        raise ValueError(f"sample ({len(x)}) smaller than n_centroids ({n_centroids})")
    # normalize so euclidean k-means ≈ spherical (cosine) clustering
    x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    rng = np.random.RandomState(seed)
    cent = x[rng.choice(len(x), n_centroids, replace=False)]
    for _ in range(iters):
        d = x @ cent.T                                  # cosine similarity
        assign = d.argmax(axis=1)
        for c in range(n_centroids):
            members = x[assign == c]
            if len(members):
                m = members.mean(axis=0)
                cent[c] = m / max(np.linalg.norm(m), 1e-12)
    return cent


def _nearest_udf(centroids: np.ndarray, top: int):
    """pandas UDF: vectors → top `top` centroid ids by cosine (numpy matmul
    over the whole Arrow batch)."""
    cent = centroids.astype(np.float64)

    def _assign(vs):
        import pandas as pd

        mat = np.array(
            [np.zeros(cent.shape[1]) if v is None else np.asarray(v, dtype=np.float64)
             for v in vs]
        )
        norms = np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        sims = (mat / norms) @ cent.T
        idx = np.argsort(-sims, axis=1)[:, :top]
        return pd.Series(list(idx.astype("int32")))

    return F.pandas_udf(_assign, T.ArrayType(T.IntegerType()))


def with_cluster_id(
    df: DataFrame,
    centroids: np.ndarray,
    *,
    vec_col: str = "embedding",
    out_col: str = "cluster_id",
) -> DataFrame:
    """Corpus indexing: nearest centroid per vector. At scale, follow with
    ``.repartition(out_col)`` / bucketed write so probes prune partitions."""
    udf = _nearest_udf(centroids, 1)
    return df.withColumn(out_col, udf(F.col(vec_col)).getItem(0))


def write_ivf_index(
    df: DataFrame,
    centroids: np.ndarray,
    path: str,
    *,
    vec_col: str = "embedding",
) -> None:
    """Materialize the IVF index partitioned BY CLUSTER: the production
    shape — the index is written once, and every probe-limited search then
    reads only its probed cells' directories (partition pruning at the
    source, verified in TestIVFIndexIO).  Centroids ride alongside as a
    tiny JSON file so a reader needs only the path."""
    import json

    indexed = with_cluster_id(df, centroids, vec_col=vec_col)
    indexed.write.mode("overwrite").partitionBy("cluster_id").parquet(
        f"{path}/cells"
    )
    from ..fsutil import write_text

    write_text(
        df.sparkSession, f"{path}/centroids.json",
        json.dumps(centroids.tolist()),
    )


def read_ivf_index(spark, path: str):
    """→ ``(indexed DataFrame, centroids ndarray)`` from
    :func:`write_ivf_index` output."""
    import json

    from ..fsutil import read_text

    centroids = np.array(json.loads(read_text(spark, f"{path}/centroids.json")))
    return spark.read.parquet(f"{path}/cells"), centroids


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: np.ndarray,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "vec_id",
    k: int = 10,
    nprobe: int = 4,
    exclude_self: bool = True,
    indexed: Optional[DataFrame] = None,
) -> DataFrame:
    """IVF top-k: ``(query_id, neighbor_id, score, rank)``.

    ``indexed`` (corpus + cluster_id) may be passed pre-built — the
    production shape, where the index is written once and reused.
    """
    if indexed is None:
        indexed = with_cluster_id(corpus, centroids, vec_col=vec_col)
    c = indexed.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        "cluster_id",
    )
    probe_udf = _nearest_udf(centroids, nprobe)
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        F.explode(probe_udf(F.col(vec_col))).alias("cluster_id"),
    )
    if nprobe < len(centroids):
        # STATIC probed-cell filter: the broadcast join alone cannot prune
        # a cluster_id-partitioned index at the source; collecting the
        # (≤ n_centroids-sized) probe set driver-side turns the scan into
        # `PartitionFilters: [cluster_id IN (...)]` — only probed cell
        # directories are read (TestIVFIndexIO asserts this on the plan)
        cells = [r.cluster_id for r in q.select("cluster_id").distinct().collect()]
        c = c.where(F.col("cluster_id").isin(cells))
    # corpus filtered to probed cells BEFORE scoring; query side broadcast
    scored = c.join(F.broadcast(q), "cluster_id").select(
        "query_id",
        "neighbor_id",
        cosine(F.col("q_vec"), F.col("c_vec")).alias("score"),
    )
    if exclude_self:
        scored = scored.where(F.col("query_id") != F.col("neighbor_id"))
    # bounded two-stage per-query top-k (see ann.topk_per_query): stage-1
    # state is bounded by one input partition, stage-2 by k × #partitions —
    # never by the probed-cell candidate count
    return topk_per_query(scored, k)
