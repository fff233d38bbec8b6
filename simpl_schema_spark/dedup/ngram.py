"""n-gram Jaccard near-duplicate detection with inverted-index candidates.

Exact Jaccard over word n-gram shingle sets, scalable shape:

1. explode (id, shingle) — linear
2. drop ultra-common shingles (document frequency > ``max_shingle_df``):
   boilerplate n-grams would otherwise create quadratic candidate blow-up
   while contributing almost no discriminative signal
3. group by shingle → id lists → within-bucket pairs (bounded)
4. exact verify: jaccard = |A∩B| / |A∪B| on the full shingle sets
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .buckets import bounded_buckets
from .minhash import shingles

__all__ = ["ngram_jaccard_pairs", "jaccard"]


def jaccard(a: Column, b: Column) -> Column:
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    k: int = 3,
    threshold: float = 0.6,
    max_shingle_df: int = 100,
) -> DataFrame:
    """Exact-Jaccard near-dup pairs ``(id_a, id_b, jaccard)`` ≥ threshold.

    Shingles are hashed to 64-bit longs up front: the inverted-index shuffle
    and both verify-join payloads ship 8 bytes per shingle instead of the
    full n-gram string, and set intersection compares longs.  Jaccard over
    the hashed sets equals Jaccard over the string sets up to 64-bit
    collisions (negligible for per-document set sizes).
    """
    sets = (
        df.where(F.col(text_col).isNotNull())
        .select(
            F.col(id_col).alias("id"),
            F.array_distinct(
                F.transform(shingles(F.col(text_col), k), lambda s: F.xxhash64(s))
            ).alias("sh"),
        )
        .where(F.size("sh") > 0)
    )
    # consumed three times (inverted index + both verify sides): persist so
    # the shingle pipeline runs once
    sets = sets.persist()
    inverted = sets.select("id", F.explode("sh").alias("g"))
    # hot shingles (boilerplate) are counted out BEFORE collect_list so no
    # reducer ever buffers an unbounded id list
    buckets = bounded_buckets(
        inverted, ["g"], F.col("id"),
        max_bucket_size=max_shingle_df, members_alias="ids",
    )
    pairs = (
        buckets.select(
            F.explode(
                F.flatten(
                    F.transform(
                        F.col("ids"),
                        lambda a: F.filter(
                            F.transform(
                                F.col("ids"),
                                lambda b: F.when(
                                    a < b, F.struct(a.alias("id_a"), b.alias("id_b"))
                                ),
                            ),
                            lambda s: s.isNotNull(),
                        ),
                    )
                )
            ).alias("p")
        )
        .select("p.id_a", "p.id_b")
        .distinct()
    )
    a = sets.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = sets.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .select("id_a", "id_b", jaccard(F.col("sh_a"), F.col("sh_b")).alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )
