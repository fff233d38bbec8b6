"""Corpus-level line deduplication — C4-style boilerplate removal.

Web pages repeat LINES across documents (navigation, cookie banners,
copyright footers) far more than whole documents repeat; the C4 pipeline
famously removes any line occurring ≥ N times in the corpus, and the
CCNet/RefinedWeb lineage keeps the same shape.  This is a corpus-global
operator, not per-row: line frequencies need one aggregation over the
whole dataset.

Shape at 100 TB:

1. ``posexplode`` the lines (no shuffle — rides the scan),
2. count DISTINCT documents per normalized line via a two-level hash
   aggregation (map-side partial on (line, doc) then (line)),
3. anti-join each line against the hot set — AQE broadcasts it at
   runtime when the counted set is genuinely small (the safe default;
   ``hint_broadcast=True`` forces it for known-tiny boilerplate sets),
4. reassemble documents with ``groupBy(doc).agg(sort-by-position +
   concat_ws)`` — state per reducer is one document's own lines.

Two line shuffles + one (usually broadcast) join total.  Deterministic →
oracle-checkable against SQL ``unnest with ordinality`` + ``string_agg``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["line_document_frequencies", "remove_common_lines"]


def line_document_frequencies(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``(line, n_docs)`` for every distinct non-empty trimmed line —
    the corpus boilerplate profile."""
    lines = df.where(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("__id"),
        F.explode(F.split(F.col(text_col), "\n")).alias("__raw"),
    )
    return (
        lines.select("__id", F.trim(F.col("__raw")).alias("line"))
        .where(F.col("line") != "")
        .groupBy("line")
        .agg(F.count_distinct(F.col("__id")).alias("n_docs"))
    )


def remove_common_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    min_df: int = 2,
    hint_broadcast: bool = False,
) -> DataFrame:
    """Documents with corpus-common lines removed (C4 line dedup).

    A line is removed from every document when its TRIMMED form occurs in
    at least ``min_df`` distinct documents; lines whose trimmed form is
    empty are never counted and never removed (they carry layout, not
    content).  NULL-text documents are excluded from the result (nothing
    to clean).  Returns ``id_col · text`` (surviving lines joined with
    ``\\n``, original order and whitespace preserved; empty string when
    everything was boilerplate) ``· n_removed``.

    The hot-set join is AQE-decided by default: at web scale the "lines
    in ≥ min_df distinct docs" set is NOT reliably small (every
    syndicated sentence qualifies at ``min_df=2``), and a forced
    broadcast of a billion-row hot set OOMs the driver.  Both sides
    already hash-partition on the line key, and AQE converts to a
    broadcast join at runtime whenever the counted hot set is genuinely
    under the threshold.  Pass ``hint_broadcast=True`` only when the
    caller KNOWS the threshold yields a tiny boilerplate set.
    """
    if min_df < 2:
        raise ValueError(f"min_df must be >= 2, got {min_df}")
    base = df.where(F.col(text_col).isNotNull())
    lines = base.select(
        F.col(id_col).alias("__id"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("__pos", "__raw"),
    ).withColumn("__key", F.trim(F.col("__raw")))
    # consumed twice (hot profile + reassembly join): stage the exploded
    # lines once instead of re-running scan+split+explode.  LAZY persist
    # — the hot-profile stage populates the cache, the join reuses it
    lines = lines.persist()
    hot = (
        lines.where(F.col("__key") != "")
        .groupBy("__key")
        .agg(F.count_distinct(F.col("__id")).alias("__n"))
        .where(F.col("__n") >= min_df)
        .select("__key")
    )
    if hint_broadcast:
        hot = F.broadcast(hot)
    flagged = lines.join(
        hot.withColumnRenamed("__key", "__hot"),
        F.col("__key") == F.col("__hot"),
        "left",
    )
    from ..cache import lazy_result

    result = (
        flagged.groupBy(F.col("__id").alias(id_col))
        .agg(
            F.concat_ws(
                "\n",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("__hot").isNull(),
                                F.struct(
                                    F.col("__pos").alias("p"),
                                    F.col("__raw").alias("l"),
                                ),
                            )
                        )
                    ),
                    lambda s: s["l"],
                ),
            ).alias("text"),
            F.count(F.when(F.col("__hot").isNotNull(), 1)).alias("n_removed"),
        )
    )
    return lazy_result(result, lines)
