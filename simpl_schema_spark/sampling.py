"""Deterministic sampling for training-data pipelines.

Random sampling is wrong for a resumable 10^12-row pipeline: re-runs must
select the SAME rows (idempotent partitions, reproducible ablations), and
the selection must be stable under repartitioning.  Both operators key the
decision on a content hash, not on RNG state:

- :func:`hash_sample` — keep a row iff the md5 of its key falls below the
  rate threshold.  Pure projection: fuses with the scan, prunes BEFORE any
  downstream shuffle, and two pipelines sampling the same key space select
  identical rows.  md5 (not xxhash64) so any engine — including the DuckDB
  oracle — reproduces the selection bit-for-bit.
- :func:`stratified_sample` — exactly ``n`` rows per stratum (e.g. per
  language), chosen by hash order so the per-stratum sample is also
  deterministic.  Two-stage bounded top-n (the repo's ann/exact-dup
  shape), NOT a per-stratum window: a window ``partitionBy(stratum)``
  funnels EVERY row of a stratum through one task's sort, and with
  low-cardinality strata (lang='en' is half a web corpus) that one task
  is a serial bottleneck at scale.  Stage 1 slices the n smallest-hash
  rows per (stratum, input partition) — state bounded by one input
  partition; stage 2 merges ≤ n × #partitions candidates per stratum.

At 100 TB prefer ``hash_sample`` (shuffle-free) whenever proportional
sampling is acceptable; reach for ``stratified_sample`` only when exact
per-stratum counts matter (eval set construction, per-language caps).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = [
    "hash_key",
    "hash_sample",
    "mixture_rates",
    "mixture_sample",
    "stratified_sample",
]

#: 16^8 — the sample decision reads the first 8 hex chars of the md5
_SPACE = 1 << 32


def hash_key(key: Column) -> Column:
    """First 8 md5 hex chars of the stringified key as a uniform uint32.
    md5-on-string is portable across engines (same value in DuckDB SQL:
    ``('0x' || substring(md5(k), 1, 8))::ubigint``)."""
    return F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10).cast(
        "long"
    )


def hash_sample(
    df: DataFrame, key_col: str, rate: float
) -> DataFrame:
    """Deterministic ~``rate`` sample keyed on ``key_col``'s content."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    threshold = int(rate * _SPACE)
    return df.where(hash_key(F.col(key_col)) < F.lit(threshold))


def mixture_rates(
    df: DataFrame,
    group_col: str,
    weights: dict[str, float],
    *,
    scale: float = 1.0,
) -> DataFrame:
    """Per-group acceptance rates that resample the corpus to a target
    mixture (``(group, n, rate)``).

    ``weights`` are target PROPORTIONS (normalized internally).  Without
    replacement no group can be upsampled, so the achievable corpus size
    is ``T = min_g(n_g / p_g)`` — the binding group is kept whole and
    every other group is downsampled to match the mixture at size ``T``
    (``scale`` < 1 shrinks the output below that feasibility bound).
    Groups absent from ``weights`` (or weighted 0) get no row here and
    are dropped by :func:`mixture_sample`.

    Scale shape: ONE map-side-combined count per group (result rows =
    group cardinality — languages/domains, not documents) and a 1-row
    min() cross-joined back; everything stays lazy/distributed, nothing
    collects.
    """
    if not weights:
        raise ValueError("weights must be a non-empty mapping")
    if any(w < 0 for w in weights.values()):
        raise ValueError("weights must be >= 0")
    total_w = float(sum(weights.values()))
    if total_w <= 0:
        raise ValueError("weights must sum to > 0")
    if not 0.0 < scale <= 1.0:
        raise ValueError(f"scale must be in (0, 1], got {scale}")
    wmap = F.create_map(
        *[
            F.lit(x)
            for kv in weights.items()
            if kv[1] > 0
            for x in kv
        ]
    )
    counts = (
        df.groupBy(F.col(group_col).alias("group"))
        .agg(F.count(F.lit(1)).alias("n"))
        # share lookup mirrors the oracle SQL verbatim (w / W both
        # literals) so the IEEE double sequence matches cross-engine
        .withColumn("__p", wmap[F.col("group")] / F.lit(total_w))
        .where(F.col("__p").isNotNull())
    )
    # consumed twice (feasibility min + rate projection): without
    # staging, BOTH branches re-scan the corpus for the group counts.
    # LAZY persist — the feasibility-min stage populates the cache first
    counts = counts.persist()
    t = counts.select(
        F.min(F.col("n") / F.col("__p")).alias("__t")
    )
    from .cache import lazy_result

    rates = (
        counts.crossJoin(t)  # 1-row total: broadcast by AQE
        .select(
            "group",
            "n",
            F.least(
                F.lit(1.0),
                (F.col("__p") * F.col("__t") * F.lit(float(scale)))
                / F.col("n"),
            ).alias("rate"),
        )
    )
    return lazy_result(rates, counts)


def mixture_sample(
    df: DataFrame,
    group_col: str,
    key_col: str,
    weights: dict[str, float],
    *,
    scale: float = 1.0,
) -> DataFrame:
    """Deterministic resample of ``df`` to the target group mixture
    (DoReMi/DCLM-style domain reweighting, downsample-only).

    Each row is kept iff ``hash_key(key_col)`` falls under its group's
    acceptance threshold from :func:`mixture_rates` — content-keyed like
    :func:`hash_sample`, so re-runs and resumed partitions select the
    SAME rows and the realized mixture concentrates around the target
    (binomial per group).  Rows whose group is not in ``weights`` are
    dropped.  The rate table is group-cardinality-sized: the join
    broadcasts (AQE), and the filter evaluates scan-side.
    """
    rates = mixture_rates(df, group_col, weights, scale=scale).select(
        F.col("group").alias("__g"),
        F.floor(F.col("rate") * F.lit(float(_SPACE))).alias("__thr"),
    )
    return (
        df.join(rates, F.col(group_col) == F.col("__g"), "inner")
        .where(hash_key(F.col(key_col)) < F.col("__thr"))
        .drop("__g", "__thr")
    )


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    key_col: str,
    n: int,
) -> DataFrame:
    """Exactly ``min(n, |stratum|)`` rows per stratum, deterministic by
    hash order (ties broken by the key itself for full determinism).

    Selected set is identical to ``row_number() over (partition by stratum
    order by hash_key(key), key) <= n`` but computed with the two-stage
    bounded top-n shape — no single-task per-stratum sort, and the stage-2
    shuffle moves only ≤ n rows per (stratum, input partition) instead of
    the full table.  Sorting compares only ``(hash, key)`` via an explicit
    ``array_sort`` comparator, so rows may contain non-orderable columns
    (maps) without breaking the sort.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    # NULL keys sort first (the window version's asc-nulls-first default),
    # carried as an EXPLICIT leading flag — xxhash/md5 outputs range over
    # the full integer space, so no sentinel hash value can encode
    # null-ness without colliding with a real key's hash
    item = F.struct(
        F.col(key_col).isNotNull().cast("int").alias("nn"),
        hash_key(F.col(key_col)).alias("hk"),
        F.col(key_col).alias("k"),
        F.struct(*[F.col(c) for c in df.columns]).alias("row"),
    )

    def _cmp(a, b):
        return (
            F.when(a["nn"] < b["nn"], F.lit(-1))
            .when(a["nn"] > b["nn"], F.lit(1))
            .when(a["hk"] < b["hk"], F.lit(-1))
            .when(a["hk"] > b["hk"], F.lit(1))
            .when(a["k"] < b["k"], F.lit(-1))
            .when(a["k"] > b["k"], F.lit(1))
            .otherwise(F.lit(0))
        )

    partial = df.groupBy(
        F.col(stratum_col).alias("__stratum"),
        F.spark_partition_id().alias("__pid"),
    ).agg(
        F.slice(F.array_sort(F.collect_list(item), _cmp), 1, n).alias("__cand")
    )
    merged = partial.groupBy("__stratum").agg(
        F.slice(
            F.array_sort(F.flatten(F.collect_list("__cand")), _cmp), 1, n
        ).alias("__top")
    )
    return merged.select(F.explode("__top").alias("__e")).select("__e.row.*")
