"""n-gram Jaccard near-duplicate detection with inverted-index candidates.

Exact Jaccard over word n-gram shingle sets, scalable shape:

1. shingle + hash: word k-grams → distinct 64-bit hashes (8 bytes/shingle in
   every shuffle; Jaccard over hashes equals Jaccard over strings up to
   64-bit collisions — negligible at per-document set sizes)
2. document frequency per shingle; shingles with df > ``max_shingle_df``
   (boilerplate) are DROPPED from the index before pair generation, so
   every surviving shingle key is ≤ cap
3. per-shingle SELF-JOIN of the live index (per-key output ≤ C(cap, 2),
   both sides share one exchange, nothing is ever buffered into an array)
   → per-pair CO-OCCURRENCE COUNT ``c`` (groupBy, not distinct — same shuffle)
4. count-only exact Jaccard: ``c`` equals |A∩B| whenever neither doc lost a
   shingle to the hot-cap (a dropped common shingle is dropped for BOTH), so
   for min(dropped_A, dropped_B) == 0 pairs — the overwhelming majority —
   jaccard = c / (|A|+|B|−c) EXACTLY from three integers, no array join
5. the remaining pairs (both docs boilerplate-heavy) verify against the full
   hashed shingle sets

Versus verifying every candidate with an array join: the candidate stream
carries only integers until step 5, which typically sees a few pairs per
million candidates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..text.analysis import normalized_text, word_tokens
from .minhash import shingles_from_tokens

__all__ = ["ngram_jaccard_pairs", "jaccard"]


def jaccard(a: Column, b: Column) -> Column:
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


# shared Arrow-batched within-bucket pair enumeration — moved to
# buckets.bucket_pairs so the MinHash/SimHash candidate generators use
# the same vectorized form; kept importable under the old private name
from .buckets import bucket_pairs as _bucket_pairs  # noqa: E402


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    k: int = 3,
    threshold: float = 0.6,
    max_shingle_df: int = 100,
) -> DataFrame:
    """Exact-Jaccard near-dup pairs ``(id_a, id_b, jaccard)`` ≥ threshold."""
    # toks staged as its own projection FIRST: shingles' gram lambda
    # references the token array per position, and CSE does not enter
    # HOF lambdas — inlined, the tokenizer regexes re-run O(n) times per
    # document (the winnow trap, BENCH/ROUND5.md).  The staged shingle
    # pipeline is then referenced once (hash+distinct consumes `g` in a
    # single expression) so IT fuses safely.
    sets = (
        df.where(F.col(text_col).isNotNull())
        .select(
            F.col(id_col).alias("id"),
            word_tokens(normalized_text(F.col(text_col))).alias("__toks"),
        )
        .select(
            "id",
            F.array_distinct(
                F.transform(
                    shingles_from_tokens(F.col("__toks"), k),
                    lambda s: F.xxhash64(s),
                )
            ).alias("sh"),
        )
        # no size()>0 filter here: a filter on the projected array risks
        # re-evaluating the fused shingle pipeline for the predicate; empty
        # sets simply produce no inverted-index rows downstream
    )
    # multi-consumer: persist LAZILY — the candidate pipeline's stages run
    # one at a time (AQE materializes query stages in dependency order)
    # and the block manager's per-block get-or-compute locking serializes
    # any stragglers, so the first stage populates the cache and the rest
    # reuse it; the old eager count() was one whole extra job per call
    sets = sets.persist()

    # each inverted row carries its doc's SET SIZE so pairs get
    # (n_a, n_b) straight from the bucket join — no join against the
    # (candidate-count-sized) pair table later
    inverted = sets.select(
        "id", F.size("sh").alias("n"), F.explode("sh").alias("g")
    )
    g_counts = inverted.groupBy("g").agg(F.count(F.lit(1)).alias("df"))
    hot = g_counts.where(F.col("df") > max_shingle_df).select("g")
    # drop hot shingles BEFORE pair enumeration: every surviving shingle
    # key has df ≤ cap, so the self-join below is per-key bounded
    live = inverted.join(hot, "g", "left_anti")
    # co-occurrence count per pair via a per-shingle SELF-JOIN of the
    # live index: per-key output is ≤ C(cap, 2) by the hot filter, the
    # two sides share one exchange (identical subtree → ReusedExchange),
    # and — unlike the former collect_list + Arrow enumeration — no
    # reducer ever materializes a bucket array and no Python stage runs
    # (guide §2.3/§4: keep bounded pair generation inside codegen).
    # groupBy instead of distinct — same shuffle; n_a/n_b are
    # functionally dependent on the ids: extra group keys, same groups.
    # SIZE-RATIO prune before the pair shuffle: |A∩B| ≤ min(n_a, n_b) and
    # |A∪B| ≥ max(n_a, n_b), so J ≤ least/greatest — a pair failing
    # ``least/(n_a+n_b-least) >= threshold`` can never reach the
    # threshold, on the count-exact path (j_count is increasing in c and
    # IEEE division is monotone, so j_count ≤ this bound in floats too)
    # or the slow verify path (true intersection ≤ least, union ≥
    # greatest, and correctly-rounded division preserves the real-number
    # ordering).  At high thresholds this drops almost every enumerated
    # candidate (sizes must match within (1-t)/t) before any shuffle.
    n_least = F.least("n_a", "n_b")
    j_bound = n_least / (F.col("n_a") + F.col("n_b") - n_least)
    pair_c = (
        live.select("g", F.col("id").alias("id_a"), F.col("n").alias("n_a"))
        .join(
            live.select(
                "g", F.col("id").alias("id_b"), F.col("n").alias("n_b")
            ),
            "g",
        )
        .where((F.col("id_a") < F.col("id_b")) & (j_bound >= threshold))
        .groupBy("id_a", "id_b", "n_a", "n_b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # hot-cap drop counts per doc: ONLY docs that lost shingles appear —
    # usually a tiny boilerplate-heavy set (often empty), so the two
    # left joins below broadcast and the pair table never re-shuffles.
    # (The previous shape equi-joined the full per-doc meta table onto
    # every candidate pair TWICE — two candidate-count-sized joins.)
    drops = (
        inverted.join(hot, "g", "inner")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_drop"))
    )
    cand = (
        pair_c.join(
            drops.select(
                F.col("id").alias("id_a"), F.col("n_drop").alias("d_a")
            ),
            "id_a",
            "left",
        )
        .join(
            drops.select(
                F.col("id").alias("id_b"), F.col("n_drop").alias("d_b")
            ),
            "id_b",
            "left",
        )
        .select(
            "id_a", "id_b", "n_a", "n_b", "c",
            F.coalesce("d_a", F.lit(0)).alias("d_a"),
            F.coalesce("d_b", F.lit(0)).alias("d_b"),
        )
    )
    # neither side lost shingles → c == |A∩B|, Jaccard exact from counts
    count_exact = F.least("d_a", "d_b") == 0
    j_count = F.col("c") / (F.col("n_a") + F.col("n_b") - F.col("c"))
    # keep only pairs that can still produce output — threshold-passing
    # count-exact pairs plus every drop-affected pair (their true
    # Jaccard needs the slow verify) — BEFORE persisting, so the cache
    # holds ~output-sized rows instead of every candidate
    cand = cand.where(
        (count_exact & (j_count >= threshold)) | ~count_exact
    ).persist()
    cand.count()
    fast = cand.where(count_exact).select(
        "id_a", "id_b", j_count.alias("jaccard")
    )
    # both sides boilerplate-heavy: exact verify on the full hashed sets
    slow_pairs = cand.where(~count_exact).select("id_a", "id_b")
    a = sets.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = sets.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    slow = (
        slow_pairs.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a", "id_b", jaccard(F.col("sh_a"), F.col("sh_b")).alias("jaccard")
        )
        .where(F.col("jaccard") >= threshold)
    )
    # materialize the (small) pair result, then drop the intermediate caches
    # so composed pipelines don't accumulate cached partitions
    from ..cache import lazy_result

    return lazy_result(fast.unionByName(slow), sets, cand)
