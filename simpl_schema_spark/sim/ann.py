"""Similarity search over embedding columns (array<float>).

Two paths per the driver brief:

- :func:`cosine_topk_bruteforce` — exact baseline: broadcast the (small)
  query set, one pass over the corpus, per-query top-k via window-free
  aggregation (min-heap shaped ``slice(sort_array(...))`` per query after a
  groupBy). Corpus is scanned once; no corpus-side shuffle of vectors, only
  of (query_id, score, id) triples, which are tiny.
- :func:`lsh_topk` / :func:`embedding_near_duplicates` — scale path: random
  hyperplane LSH (sign bits of dot products with fixed seeded pseudo-random
  planes) buckets vectors so only same-bucket pairs are scored. Hyperplanes
  are generated deterministically from a seed — reproducible across runs and
  executors.

All dot products are ``F.zip_with`` + ``F.aggregate`` JVM expressions.
"""

from __future__ import annotations

import math
from typing import Optional

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, functions as F, types as T

__all__ = [
    "dot",
    "l2_norm",
    "cosine",
    "topk_per_query",
    "cosine_topk_bruteforce",
    "random_hyperplane_signature",
    "hyperplane_signature_udf",
    "embedding_near_duplicates",
]


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, dot(a, b) / denom).otherwise(F.lit(0.0))


def topk_per_query(scored: DataFrame, k: int) -> DataFrame:
    """Bounded two-stage per-query top-k over ``(query_id, neighbor_id, score)``.

    A single ``groupBy(query_id).agg(slice(sort_array(collect_list(...))))``
    buffers EVERY scored candidate for a query on one reducer — O(corpus) state
    at 10^12 rows.  Instead:

    1. **partial top-k** per ``(query_id, spark_partition_id())``: each group
       lives entirely inside one map task, so its aggregation state is bounded
       by one input partition (itself bounded by
       ``spark.sql.files.maxPartitionBytes``), and only the sliced ``k``
       structs per (query, partition) survive into stage 2;
    2. **final merge** per ``query_id``: flattens ≤ k × #partitions structs —
       bounded regardless of corpus size — and slices the global top k.

    Ordering matches the SQL oracle (``row_number() over (order by score
    desc, neighbor_id)``): sort ascending on ``(-score, neighbor_id)`` so
    score ties break by ascending neighbor id deterministically.
    """
    key = F.struct(
        F.negate(F.col("score")).alias("nscore"), F.col("neighbor_id")
    )
    partial = scored.groupBy(
        "query_id", F.spark_partition_id().alias("_pid")
    ).agg(F.slice(F.sort_array(F.collect_list(key)), 1, k).alias("partial"))
    return (
        partial.groupBy("query_id")
        .agg(
            F.slice(
                F.sort_array(F.flatten(F.collect_list("partial"))), 1, k
            ).alias("top")
        )
        .select("query_id", F.posexplode("top").alias("rank0", "t"))
        .select(
            "query_id",
            F.col("t.neighbor_id").alias("neighbor_id"),
            F.negate(F.col("t.nscore")).alias("score"),
            (F.col("rank0") + 1).alias("rank"),
        )
    )


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "vec_id",
    k: int = 10,
    exclude_self: bool = True,
) -> DataFrame:
    """Exact cosine top-k: ``(query_id, neighbor_id, score, rank)``.

    The query side is broadcast (must be small — thousands, not millions);
    the corpus is scanned exactly once with no shuffle of the vectors.
    """
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    scored = c.join(F.broadcast(q), how="cross").select(
        "query_id",
        "neighbor_id",
        cosine(F.col("q_vec"), F.col("c_vec")).alias("score"),
    )
    if exclude_self:
        scored = scored.where(F.col("query_id") != F.col("neighbor_id"))
    # bounded two-stage per-query top-k (no O(corpus) reducer buffer)
    return topk_per_query(scored, k)


#: rows per pair-enumeration block — bounds the Python-side pair buffer
#: (block × group_size × dim doubles) independent of group size
_PAIR_BLOCK = 4096


def seq_fold_rows(prods):
    """Sequential left-fold DOUBLE sum per row, starting from 0.0 — the
    exact FP sequence of ``F.aggregate(…, lit(0.0), acc + v)`` (the
    zero-prepend reproduces the fold's ``0.0 + p0`` first step, signed
    zeros included).  ``prods`` keeps its input dtype: products of
    float32 vectors are single-precision exactly as Spark's
    ``float * float`` multiply, then promote to double in the running
    sum just like the fold's ``double + float``."""
    import numpy as np

    z = np.zeros((prods.shape[0], 1), dtype=np.float64)
    return np.add.accumulate(
        np.hstack([z, prods.astype(np.float64)]), axis=1
    )[:, -1]


def group_dot_pairs_pdf(pdf, *, extra_cols: Optional[dict] = None):
    """All ``id_a < id_b`` pairs within one group of ``(id, v)`` rows,
    with the SEQUENTIAL-fold dot product and the norm-product
    denominator — vectorized numpy inside ``applyInPandas`` (guide-§4.2
    dense-linear-algebra case), emitting only scalar pair rows; callers
    divide/round/threshold JVM-side so those semantics are untouched.

    ``extra_cols`` maps output name → group-constant source column,
    copied onto every pair row.  The pair buffer is blocked
    (``_PAIR_BLOCK`` anchor rows at a time) so Python memory stays
    bounded for large groups."""
    import numpy as np
    import pandas as pd

    extra_cols = extra_cols or {}
    m = len(pdf)
    cols = ["id_a", "id_b", *extra_cols, "dot", "denom"]
    if m < 2:
        return pd.DataFrame({c: [] for c in cols})
    # mat keeps the column's element dtype (float32 stays float32): the
    # elementwise products must run in the INPUT precision to match the
    # expression fold's `x * y`; seq_fold_rows promotes to double after
    pdf = pdf.sort_values("id", kind="mergesort")
    ids = pdf["id"].to_numpy()
    mat = np.stack(pdf["v"].to_numpy())
    extras = {name: pdf[src].iloc[0] for name, src in extra_cols.items()}
    norms = np.sqrt(seq_fold_rows(mat * mat))
    out = []
    for lo in range(0, m - 1, _PAIR_BLOCK):
        hi = min(lo + _PAIR_BLOCK, m - 1)
        counts = m - 1 - np.arange(lo, hi)
        ia = np.repeat(np.arange(lo, hi), counts)
        ib = np.concatenate([np.arange(i + 1, m) for i in range(lo, hi)])
        block = {"id_a": ids[ia], "id_b": ids[ib]}
        block.update({name: v for name, v in extras.items()})
        block["dot"] = seq_fold_rows(mat[ia] * mat[ib])
        block["denom"] = norms[ia] * norms[ib]
        out.append(pd.DataFrame(block))
    return pd.concat(out, ignore_index=True)


def _hyperplanes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    """Deterministic pseudo-random unit hyperplanes (driver-side, tiny)."""
    import random

    rng = random.Random(seed)
    planes = []
    for _ in range(n_planes):
        v = [rng.gauss(0.0, 1.0) for _ in range(dim)]
        norm = math.sqrt(sum(x * x for x in v)) or 1.0
        planes.append([x / norm for x in v])
    return planes


def random_hyperplane_signature(
    vec: Column, dim: int, *, n_planes: int = 16, seed: int = 42
) -> Column:
    """n_planes sign bits packed into a bigint (cosine-LSH signature) —
    pure-expression form (n_planes chained zip_with/aggregate dots).

    Prefer :func:`hyperplane_signature_udf` in hot paths: dense linear
    algebra is the one place Arrow-batched numpy beats JVM expressions
    (one matmul per batch vs n_planes interpreted fold chains — measured
    ~3x at dim=64/n_planes=16; signatures are bit-identical on the test
    corpus, see TestANN)."""
    planes = _hyperplanes(dim, n_planes, seed)
    acc = F.lit(0).cast("long")
    for b, plane in enumerate(planes):
        plane_col = F.array(*[F.lit(float(x)) for x in plane])
        bit = F.when(dot(vec, plane_col) > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        acc = acc.bitwiseOR(F.shiftleft(bit, b))
    return acc


def hyperplane_signature_udf(dim: int, *, n_planes: int = 16, seed: int = 42):
    """Arrow-batched signature: one numpy matmul per batch over the same
    seeded hyperplanes as :func:`random_hyperplane_signature`."""
    planes = np.array(_hyperplanes(dim, n_planes, seed))

    def _sig(vs: pd.Series) -> pd.Series:
        mat = np.array(
            [
                np.zeros(planes.shape[1]) if v is None else np.asarray(v, float)
                for v in vs
            ]
        )
        bits = (mat @ planes.T) > 0
        out = np.zeros(len(vs), dtype=np.int64)
        for b in range(planes.shape[0]):
            out |= bits[:, b].astype(np.int64) << b
        return pd.Series(out)

    return F.pandas_udf(_sig, T.LongType())


def embedding_near_duplicates(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int,
    threshold: float = 0.95,
    n_planes: int = 16,
    bands: int = 4,
    seed: int = 42,
    max_bucket_size: int = 1000,
) -> DataFrame:
    """Embedding-cosine near-dup pairs ``(id_a, id_b, cosine)`` ≥ threshold.

    Cosine-LSH bucketing: vectors agreeing on one band of sign bits are
    candidates; exact cosine verifies. High-cosine pairs agree on most sign
    bits, so banding retains them with high probability.
    """
    chunk = n_planes // bands
    mask = (1 << chunk) - 1
    sig_udf = hyperplane_signature_udf(dim, n_planes=n_planes, seed=seed)
    sigs = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        # Arrow matmul signature (same seeded planes as the expression
        # form; ~3x faster — see hyperplane_signature_udf docstring)
        sig_udf(F.col(vec_col)).alias("sig"),
        # consumed by sequential stages (bucket sizes → pair join sides):
        # lazy persist so the signature matmul runs once per vector, with
        # the first consuming stage populating the cache (see ngram.py)
    ).persist()
    chunks = F.array(
        *[
            F.struct(
                F.lit(c).alias("chunk_idx"),
                F.shiftright(F.col("sig"), c * chunk).bitwiseAND(F.lit(mask)).alias("chunk_val"),
            )
            for c in range(bands)
        ]
    )
    exploded = sigs.select(
        "id",
        F.col("vec").alias("v"),
        F.explode(chunks).alias("c"),
    ).select("id", "v", "c.chunk_idx", "c.chunk_val")
    # hot chunks filtered out BEFORE the pair stage (bounded per-group
    # state — same count-pass + semi-join discipline as bounded_buckets);
    # the pair stage itself is an Arrow-batched applyInPandas per bucket:
    # each vector crosses the wire once per band instead of once per
    # PAIR, and the dot/norm folds run as vectorized numpy with the
    # exact sequential-fold FP sequence (the interpreted
    # higher-order-function cosine was the dominant cost of this
    # operator — guide §4.2)
    sizes = exploded.groupBy("chunk_idx", "chunk_val").agg(
        F.count(F.lit(1)).alias("__n")
    )
    keep = sizes.where(
        (F.col("__n") >= 2) & (F.col("__n") <= max_bucket_size)
    ).select("chunk_idx", "chunk_val")
    bounded = exploded.join(keep, ["chunk_idx", "chunk_val"], "inner")
    id_type = sigs.schema["id"].dataType.simpleString()
    raw_pairs = bounded.groupBy("chunk_idx", "chunk_val").applyInPandas(
        group_dot_pairs_pdf,
        f"id_a {id_type}, id_b {id_type}, dot double, denom double",
    )
    # division stays JVM-side — bit-identical to the expression form's
    # cosine() (denom>0 guard included); duplicate candidates from
    # different bands compute identical doubles, so distinct() dedupes
    cos = F.when(
        F.col("denom") > 0, F.col("dot") / F.col("denom")
    ).otherwise(F.lit(0.0))
    pairs = (
        raw_pairs.select("id_a", "id_b", cos.alias("cosine"))
        .where(F.col("cosine") >= threshold)
        .distinct()
    )
    # materialize the (small) pair result, then drop the signature cache
    from ..cache import lazy_result

    return lazy_result(pairs, sigs)
