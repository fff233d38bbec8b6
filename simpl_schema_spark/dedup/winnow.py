"""Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
"Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD 2003).

Rolling-hash fingerprint selection for copy detection and near-dup
localization: hash every POSITIONAL word k-gram of the normalized text,
slide a window of ``w`` consecutive k-gram hashes, and keep the minimum
hash of each window.  The distinct selected hashes are the document's
fingerprint set, with the winnowing guarantee: any shared token run of
length >= ``w + k - 1`` between two documents contributes at least one
COMMON fingerprint, while the expected selected density is only
``2 / (w + 1)`` of all k-grams — an order-of-magnitude smaller inverted
index than the full shingle set :mod:`~simpl_schema_spark.dedup.ngram`
carries, at the price of a guarantee on long matches instead of exact
Jaccard.

Scale shape
-----------
The entire selection is scan-side: tokens -> positional k-gram hashes ->
per-window minima -> ``array_distinct``, one fused whole-stage-codegen
projection with ZERO shuffle; only the (id, fingerprint) integer pairs
ever reach an exchange.  The per-window min is O(w) via
``array_min(slice(...))`` inside a ``transform`` lambda — the O(m)
ascending-minima deque is not expressible as a Spark HOF, and with the
usual w <= 16 the O(m*w) expression stays cheap and fused (lambda
re-evaluation economics per BENCH/ROUND4.md: keep per-element work
bounded by a small constant).

Pair generation reuses the bounded-bucket inverted-index idiom
(dedup/ngram.py steps 2-4): document frequency per fingerprint first, hot
fingerprints (boilerplate) dropped BEFORE any ``collect_list``, so no
reducer buffers an unbounded posting list at 100 TB.

``hash_family='md5'`` switches the k-gram hash to the engine-portable
:func:`~simpl_schema_spark.dedup.minhash.md5_long60` (first 15 md5 hex
chars as a 60-bit bigint) so an external engine (the DuckDB oracle) can
reproduce fingerprints bit-exactly; the default ``'xxhash64'`` stays on
the JVM-codegen hash for production scans.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..text.analysis import normalized_text, word_tokens
from .minhash import md5_long60

__all__ = ["positional_kgram_hashes", "winnow", "winnow_fingerprints",
           "fingerprint_overlap_pairs"]


def positional_kgram_hashes(
    text: Column, k: int = 5, *, hash_family: str = "xxhash64"
) -> Column:
    """Hashes of ALL positional word k-grams of normalized text (NOT
    distinct — winnowing needs the positional sequence).  Texts shorter
    than k tokens hash the whole token run as one gram (mirroring
    :func:`~simpl_schema_spark.dedup.minhash.shingles`); empty text is an
    empty array."""
    toks = word_tokens(normalized_text(text))
    return _kgram_hashes_from_tokens(toks, k, hash_family=hash_family)


def _kgram_hashes_from_tokens(
    toks: Column, k: int, *, hash_family: str
) -> Column:
    """:func:`positional_kgram_hashes` over an already-built token array.

    Callers on a hot path MUST pass ``toks`` as a staged column
    reference, not a raw expression: the gram lambda references the
    token array once per position, and CSE does not enter HOF lambdas
    (BENCH/ROUND4.md) — an inlined tokenizer expression re-runs its
    regexes O(n) times per document."""
    if hash_family == "md5":
        hash_one = md5_long60
    elif hash_family == "xxhash64":
        # wrapped: xxhash64 is varargs, which HOF lambdas reject directly
        def hash_one(g):
            return F.xxhash64(g)
    else:
        raise ValueError(
            f"hash_family must be 'xxhash64' or 'md5', got {hash_family!r}"
        )
    n = F.size(toks)
    grams = (
        F.when(
            n >= k,
            F.transform(
                F.sequence(F.lit(0), n - k),
                lambda j: F.array_join(F.slice(toks, j + 1, k), " "),
            ),
        )
        .when(n > 0, F.array(F.array_join(toks, " ")))
        .otherwise(F.array().cast("array<string>"))
    )
    return F.transform(grams, hash_one)


def winnow(hashes: Column, w: int = 4) -> Column:
    """Distinct per-window minima of a positional hash sequence — the
    winnowed fingerprint set.  Fewer than w hashes -> the global min (the
    whole document is one window).

    ``hashes`` MUST be a staged column reference on any hot path — the
    window lambda references it O(m) times and CSE does not enter HOF
    lambdas, so an inlined hash-building expression re-evaluates per
    window (see winnow_fingerprints for the staged composition)."""
    m = F.size(hashes)
    selected = (
        F.when(
            m >= w,
            F.transform(
                F.sequence(F.lit(0), m - w),
                lambda j: F.array_min(F.slice(hashes, j + 1, w)),
            ),
        )
        .when(m > 0, F.array(F.array_min(hashes)))
        .otherwise(F.array().cast("array<bigint>"))
    )
    return F.array_distinct(selected)


def winnow_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    k: int = 5,
    w: int = 4,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """Exploded ``(id, fp)`` fingerprint table, one row per distinct
    selected hash per document.  One scan, zero shuffle — the output is
    exchange-ready 16-byte rows."""
    # STAGE each array as a named column before the next HOF consumes
    # it: the gram lambda references the token array O(n) times and the
    # window lambda references the hash array O(m) times, and CSE does
    # not enter HOF lambdas (BENCH/ROUND4.md) — inlined, tokenization
    # re-runs per gram and the whole O(m·k) hashing re-runs PER WINDOW,
    # turning the scan into O(m²·k) per document (measured 15x+ at
    # sf0.1).  As separate multi-referenced projection outputs,
    # Catalyst's CollapseProject keeps each materialized once per row.
    toks = word_tokens(normalized_text(F.col(text_col)))
    hashes = _kgram_hashes_from_tokens(
        F.col("__toks"), k, hash_family=hash_family
    )
    return (
        df.where(F.col(text_col).isNotNull())
        .select(F.col(id_col).alias("id"), toks.alias("__toks"))
        .select("id", hashes.alias("__h"))
        .select("id", F.explode(winnow(F.col("__h"), w)).alias("fp"))
    )


def fingerprint_overlap_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    k: int = 5,
    w: int = 4,
    min_common: int = 2,
    max_fp_df: int = 100,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """Candidate near-dup/copy pairs ``(id_a, id_b, n_common)`` sharing at
    least ``min_common`` fingerprints.

    Bounded inverted index: fingerprints appearing in more than
    ``max_fp_df`` documents are boilerplate and dropped BEFORE pair
    generation, so every posting list is <= max_fp_df by construction
    and the self-join's per-key pair output is bounded — the
    100-TB-safe shape shared with :func:`~.ngram.ngram_jaccard_pairs`.
    By the winnowing guarantee a dropped-for-both hot fingerprint never
    hides a LONG unique match (those contribute other, rarer
    fingerprints); ``n_common`` undercounts only boilerplate overlap,
    which is the point.
    """
    fps = winnow_fingerprints(
        df, id_col, text_col, k=k, w=w, hash_family=hash_family
    )
    # single upstream scan feeds two consumers (df-counts and the index);
    # fingerprint rows are two ints — cheap to persist, expensive to
    # recompute (the whole winnow projection).  LAZY persist: the
    # df-count pass is the first stage of the caller's action and
    # populates the cache for the join sides — no eager count job
    fps = fps.persist()

    counts = fps.groupBy("fp").agg(F.count(F.lit(1)).alias("df"))
    hot = counts.where(F.col("df") > max_fp_df).select("fp")
    live = fps.join(hot, "fp", "left_anti")
    # pair enumeration via a per-fingerprint SELF-JOIN of the live index
    # (posting lists hold DISTINCT ids): per-key output is ≤ C(cap, 2)
    # by the hot filter, rows stream through codegen with no
    # collect_list buffer and no Python stage, and the two sides share
    # one exchange (same shape as ngram/minhash/simhash)
    pairs = (
        live.select("fp", F.col("id").alias("id_a"))
        .join(live.select("fp", F.col("id").alias("id_b")), "fp")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
        .where(F.col("n_common") >= min_common)
    )
    from ..cache import lazy_result

    return lazy_result(pairs, fps)
