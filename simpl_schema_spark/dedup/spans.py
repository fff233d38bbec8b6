"""Exact duplicate-SPAN removal — substring-level corpus dedup.

Whole-document dedup (exact / MinHash / SimHash) misses the dominant
duplication mode of web corpora: long VERBATIM passages embedded in
otherwise-distinct pages (quoted articles, licence blocks, templated
product blurbs).  The published treatment is suffix-array exact
substring dedup (Lee et al. 2022, "Deduplicating Training Data Makes
Language Models Better"; same stage in SlimPajama/RefinedWeb): remove
every maximal duplicated run of at least ``k`` tokens.

A corpus-wide suffix array is the wrong shape for Spark; the
Spark-native equivalent uses anchor k-grams, exploiting the identity::

    token t lies inside a duplicated run of >= k tokens
        <=>  some k-gram window covering t occurs elsewhere in the corpus

so the union of hot-anchor windows [i, i+k-1] IS the token set of all
maximal duplicated runs — no suffix structure needed.

Shape at 100 TB (all per-doc or per-key aggregations, no global order):

1. tokenize once, stage the token arrays (one scan; the array column is
   reused by both the anchor build and the reassembly — persisted at
   test scale, recompute-or-checkpoint at cluster scale),
2. anchor k-grams by position via ``posexplode(transform(sequence))``
   over the STAGED array column (a materialized column reference, so
   the lambda does not re-evaluate the tokenizer per element — the
   CSE-inside-HOF trap),
3. hot set = anchors hashed + counted (two-level hash agg, map-side
   partial); the hot-anchor join is AQE-decided, never force-broadcast
   (at min_count=2 the hot set scales with the corpus),
4. maximal spans per doc = gaps-and-islands over hot anchor positions
   (window PARTITIONED BY doc — per-doc state only),
5. reassembly = token table left-joined against exploded span indices,
   ``collect_list`` + sort per doc (state: one document's own tokens).

Determinism: pure string/window algebra end-to-end -> replayable in
ANSI SQL; the driver contract gates it hash-exact against DuckDB
(anchor identity there uses the gram string itself; here xxhash64 of
the gram — identical flagging absent 64-bit collisions).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

__all__ = ["duplicate_spans", "remove_duplicate_spans"]

#: gram-token separator: unit separator, cannot appear in \s+-split tokens
_SEP = "\x1f"


def _tokens(text: Column) -> Column:
    """Whitespace tokens of the ORIGINAL text (no normalization: exact
    substring dedup is exact — case and punctuation count)."""
    return F.filter(F.split(text, r"\s+"), lambda t: t != "")


def _staged_tokens(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc_id, __toks) for every document with at least one token."""
    return (
        df.where(F.col(text_col).isNotNull())
        .select(
            F.col(id_col).alias("doc_id"),
            _tokens(F.col(text_col)).alias("__toks"),
        )
        .where(F.size("__toks") > 0)
    )


def _spans_from_staged(staged: DataFrame, k: int, min_count: int) -> DataFrame:
    """(doc_id, __sid, __start, __end) maximal hot spans from a staged
    (doc_id, __toks) frame; inclusive 0-based token indices."""
    n = F.size("__toks")
    grams = F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(0), n - k),
            lambda j: F.xxhash64(
                F.array_join(F.slice("__toks", j + 1, k), _SEP)
            ),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    anchors = staged.select("doc_id", F.posexplode(grams).alias("__i", "__g"))
    hot = (
        anchors.groupBy("__g")
        .agg(F.count(F.lit(1)).alias("__n"))
        .where(F.col("__n") >= min_count)
        .select("__g")
    )
    # inner join: AQE broadcasts iff the counted hot set is small
    hits = anchors.join(hot, "__g").select("doc_id", "__i")
    w = Window.partitionBy("doc_id").orderBy("__i")
    # islands: anchors i, j (i < j) cover overlapping-or-touching windows
    # iff j - i <= k; a larger gap starts a new maximal span
    return (
        hits.withColumn("__prev", F.lag("__i").over(w))
        .withColumn(
            "__new",
            F.when(
                F.col("__prev").isNull()
                | (F.col("__i") - F.col("__prev") > k),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .withColumn("__sid", F.sum("__new").over(w))
        .groupBy("doc_id", "__sid")
        .agg(
            F.min("__i").alias("__start"),
            (F.max("__i") + F.lit(k - 1)).alias("__end"),
        )
    )


def duplicate_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    k: int = 25,
    min_count: int = 2,
) -> DataFrame:
    """Maximal duplicated token runs per document.

    A k-gram (window of ``k`` consecutive whitespace tokens) is HOT when
    it occurs at least ``min_count`` times across the whole corpus —
    occurrences within one document count, so self-repeating documents
    are caught too.  Overlapping/adjacent hot windows merge into maximal
    spans.  Returns one row per span:
    ``id_col · span_id · start · end`` (inclusive token indices, 0-based
    over the document's whitespace tokens).
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    if min_count < 2:
        raise ValueError(f"min_count must be >= 2, got {min_count}")
    staged = _staged_tokens(df, id_col, text_col)
    spans = _spans_from_staged(staged, k, min_count)
    return spans.select(
        F.col("doc_id").alias(id_col),
        F.col("__sid").alias("span_id"),
        F.col("__start").alias("start"),
        F.col("__end").alias("end"),
    )


def remove_duplicate_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    k: int = 25,
    min_count: int = 2,
) -> DataFrame:
    """Documents with every duplicated run of ``>= k`` tokens removed.

    Removal drops ALL occurrences of a duplicated run (the C4-style
    variant; Lee et al. keep one occurrence — keep-one needs a global
    occurrence order and is deliberately not what this operator does).
    Output is token-normalized: surviving tokens joined with single
    spaces (span boundaries make original inter-token whitespace
    ambiguous).  One row per document with at least one token:
    ``id_col · text_deduped · n_tokens · n_dup_tokens · n_spans``
    (``text_deduped`` is the empty string when the whole document was
    duplicated material).
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    if min_count < 2:
        raise ValueError(f"min_count must be >= 2, got {min_count}")
    staged = _staged_tokens(df, id_col, text_col)
    # both the anchor build and the reassembly read the token arrays:
    # stage them once (recompute is a second full tokenize otherwise).
    # LAZY persist: the anchor chain's first stage populates the cache
    # and the reassembly join reuses it (block-level get-or-compute
    # locking serializes a concurrent cold read) — no eager count job
    staged = staged.persist()
    spans = _spans_from_staged(staged, k, min_count)
    # Reassembly by GAP SLICING: collapse each document's (disjoint,
    # sorted) spans to one array row, left-join it onto the staged
    # tokens (doc-keyed, span-table-sized), and keep the tokens BETWEEN
    # spans via slice() over the gap boundaries — O(n + #spans) per doc
    # with the token arrays never leaving their scan partition.  (The
    # previous shape posexploded every corpus token into a (doc, idx)
    # shuffle join against exploded removed indices and re-collected
    # documents with a sort aggregation — two corpus-token-sized
    # exchanges doing what a per-row expression can.)
    spans_per_doc = spans.groupBy("doc_id").agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("__start").alias("s"), F.col("__end").alias("e")
                )
            )
        ).alias("__sp")
    )
    joined = staged.join(spans_per_doc, "doc_id", "left")
    n = F.size("__toks")
    sp = F.coalesce(
        F.col("__sp"), F.array().cast("array<struct<s:int,e:int>>")
    )
    # gap g runs from (previous span end + 1) to (next span start - 1);
    # the leading gap starts at 0 and the trailing one ends at n-1.
    # Spans are maximal and disjoint, so gaps are well-ordered; empty
    # gaps produce zero-length slices.
    gap_starts = F.concat(
        F.array(F.lit(0)), F.transform(sp, lambda s: s["e"] + 1)
    )
    gap_ends = F.concat(
        F.transform(sp, lambda s: s["s"] - 1), F.array(n - 1)
    )
    kept = F.flatten(
        F.zip_with(
            gap_starts,
            gap_ends,
            lambda a, b: F.slice(
                "__toks", a + 1, F.greatest(b - a + 1, F.lit(0))
            ),
        )
    )
    from ..cache import lazy_result

    result = joined.select(
        F.col("doc_id").alias(id_col),
        F.array_join(kept, " ").alias("text_deduped"),
        n.cast("long").alias("n_tokens"),
        F.aggregate(
            sp,
            F.lit(0),
            lambda acc, s: acc + (s["e"] - s["s"] + F.lit(1)),
        ).cast("long").alias("n_dup_tokens"),
        F.size(sp).cast("long").alias("n_spans"),
    )
    return lazy_result(result, staged)
