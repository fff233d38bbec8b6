"""MinHash + LSH near-duplicate detection, expression-only.

Pipeline (classic shingle → minhash → band → bucket-join):

1. shingle: word k-grams of the normalized text (``array_distinct``)
2. signature: P permutations approximated by P seeded xxhash64 functions,
   ``sig[p] = min over shingles of h_p(shingle)`` — all inside one
   ``F.transform``/``F.array_min`` projection, no UDF, no shuffle
3. LSH: split the signature into B bands of R rows (P = B·R); band hash =
   one 64-bit hash per band → explode to (band_idx, band_hash, id)
4. candidates: self-join on (band_idx, band_hash) — ONE shuffle on the band
   key; hot buckets (boilerplate pages) are capped by ``max_bucket_size``
   to bound the quadratic pair blow-up, with the cap logged as a stat
5. verify: estimated Jaccard = fraction of agreeing signature positions
   (zip_with on the two signatures), filter ≥ threshold

Scale: the only quadratic step (4) is bounded per bucket; everything else is
linear scans. At 10^12 docs use P=128, B=32, R=4 (≥0.8 Jaccard at ~97%
recall) and raise max_bucket_size monitoring the dropped-bucket count.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, functions as F, types as T

from ..text.analysis import normalized_text, word_tokens
from .buckets import bounded_pair_join

__all__ = [
    "shingles",
    "shingles_from_tokens",
    "md5_permutation_family",
    "minhash_signature",
    "minhash_signature_udf",
    "lsh_candidate_pairs",
    "minhash_near_duplicates",
]

#: Mersenne prime 2^61-1 — modulus of the portable multiply-add family
MERSENNE61 = (1 << 61) - 1


def md5_permutation_family(num_perm: int, seed: int = 7):
    """Deterministic ``(a_p, b_p)`` coefficients for the PORTABLE
    multiply-add permutation family ``v_p = (a_p·h + b_p) mod 2^61-1``.

    Derived from a seeded PRNG so any engine (the DuckDB oracle included)
    regenerates the identical family from ``(num_perm, seed)``.  ``a_p``
    stays under 2^30 so ``a_p·h`` (h < 2^60) fits Spark's decimal(30,0)
    exactly — the ANSI-safe stand-in for the wrapping 64-bit arithmetic
    the textbook family would need (COVERAGE.md backlog item, closed by
    this modular variant).
    """
    import random

    rng = random.Random(f"simpl-minhash-{num_perm}-{seed}")
    a = [rng.randrange(1, 1 << 30) for _ in range(num_perm)]
    b = [rng.randrange(0, MERSENNE61) for _ in range(num_perm)]
    return a, b


def md5_long60(col: Column) -> Column:
    """Portable 60-bit hash: first 15 hex chars of md5 as a bigint.
    DuckDB spells it ``('0x' || substring(md5(x), 1, 15))::ubigint``;
    15 hex digits keep the value under 2^60, inside a signed long."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def md5_long64(col: Column) -> Column:
    """Portable FULL-64-bit hash as a signed bigint: first 16 hex chars
    of md5 assembled from two 8-hex-char halves (each < 2^32, an exact
    long cast) with ``shiftleft``/``bitwiseOR`` — the JVM ``<<`` wraps
    the sign bit for itself, replacing the previous decimal(20,0)
    two's-complement subtraction (software decimal per token was the
    measurable cost of the md5 SimHash token-hash stage).  Bit pattern
    unchanged, matching DuckDB's
    ``('0x' || substring(md5(x), 1, 16))::ubigint`` — bitwise consumers
    (simhash) see identical bits either way."""
    h = F.md5(col)
    hi = F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
    lo = F.conv(F.substring(h, 9, 8), 16, 10).cast("long")
    return F.shiftleft(hi, 32).bitwiseOR(lo)

# XXH64 primes — public algorithm constants (xxHash spec); used to
# replicate Spark's XxHash64 on longs bit-exactly in numpy
_XP1 = np.uint64(0x9E3779B185EBCA87)
_XP2 = np.uint64(0xC2B2AE3D27D4EB4F)
_XP3 = np.uint64(0x165667B19E3779F9)
_XP4 = np.uint64(0x85EBCA77C2B2AE63)
_XP5 = np.uint64(0x27D4EB2F165667C5)


def _rotl64(x, r):
    r = np.uint64(r)
    return (x << r) | (x >> (np.uint64(64) - r))


def _xxh64_int(v, seed):
    """Vectorized XXH64 of one 4-byte int (zero-extended) — Spark hashes
    IntegerType inputs through this 4-byte path, e.g. the permutation
    indices produced by ``F.sequence`` (int32), NOT the long path."""
    h = seed + _XP5 + np.uint64(4)
    h = h ^ ((v & np.uint64(0xFFFFFFFF)) * _XP1)
    h = _rotl64(h, 23) * _XP2 + _XP3
    h ^= h >> np.uint64(33)
    h *= _XP2
    h ^= h >> np.uint64(29)
    h *= _XP3
    h ^= h >> np.uint64(32)
    return h


def _xxh64_long(v, seed):
    """Vectorized XXH64 of one 8-byte long — bit-identical to Spark's
    ``xxhash64`` applied to a single bigint with the given seed (and, via
    seed chaining, to multi-argument ``xxhash64``)."""
    h = seed + _XP5 + np.uint64(8)
    k1 = _rotl64(v * _XP2, 31) * _XP1
    h = h ^ k1
    h = _rotl64(h, 27) * _XP1 + _XP4
    h ^= h >> np.uint64(33)
    h *= _XP2
    h ^= h >> np.uint64(29)
    h *= _XP3
    h ^= h >> np.uint64(32)
    return h


def shingles(text: Column, k: int = 3) -> Column:
    """Distinct word k-gram shingles of normalized text.

    Convenience composition for one-off use; HOT paths must stage the
    token array first and call :func:`shingles_from_tokens` — the gram
    lambda references the token array per position and CSE does not
    enter HOF lambdas (BENCH/ROUND4-5.md), so an inlined tokenizer
    re-runs its regexes O(n) times per document."""
    return shingles_from_tokens(word_tokens(normalized_text(text)), k)


def shingles_from_tokens(toks: Column, k: int = 3) -> Column:
    """:func:`shingles` over an already-built (ideally staged-column)
    token array."""
    n = F.size(toks)
    grams = F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(0), n - k),
            lambda j: F.array_join(F.slice(toks, j + 1, k), " "),
        ),
    ).otherwise(F.when(n > 0, F.array(F.array_join(toks, " "))).otherwise(F.array()))
    return F.array_distinct(grams)


def minhash_signature(
    shingle_col: Column,
    num_perm: int = 64,
    seed: int = 7,
    *,
    hash_family: str = "xxhash64",
) -> Column:
    """P-element minhash signature (array<bigint>); NULL-safe on empty sets.

    Shape: hash each shingle string ONCE (xxhash64), then derive the P
    permutation values by rehashing the resulting LONG with each permutation
    index (``xxhash64(h, p)`` — two-word input, far cheaper than re-hashing
    the string), accumulated as a single ``F.aggregate`` pass keeping the
    elementwise minimum.  (A multiply-add family would be cheaper still but
    Spark 4's ANSI mode forbids wrapping 64-bit arithmetic.)

    This also FIXES a latent round-1 seeding bug: the old per-permutation
    ``transform(col, lambda s, p=p: xxhash64(s, lit(p)))`` declared a
    two-parameter lambda, which Spark's ``transform`` binds as
    ``(element, array_index)`` — the index silently overwrote the captured
    permutation seed, collapsing all P positions to ONE permutation.
    Signatures are now genuinely P independent permutations (Jaccard
    estimates take graded values instead of only 0/1).

    ``hash_family='md5'`` switches to the ENGINE-PORTABLE variant: shingle
    hash = :func:`md5_long60`, permutations = the multiply-add family from
    :func:`md5_permutation_family` in exact decimal arithmetic.  Same
    statistical properties; a DuckDB oracle reproduces it bit-for-bit
    (xxhash64 has no DuckDB equivalent).  Default stays xxhash64 — it is
    ~2x cheaper and the right choice when no cross-engine parity is
    needed.
    """
    max_long = (1 << 63) - 1
    if hash_family == "md5":
        a, b = md5_permutation_family(num_perm, seed)
        a_arr = F.array(*[F.lit(x).cast("long") for x in a])
        b_arr = F.array(*[F.lit(x).cast("long") for x in b])
        m = F.lit(MERSENNE61).cast("long")
        idx = F.sequence(F.lit(1), F.lit(num_perm))
        hashes = F.transform(shingle_col, md5_long60)

        def perm_val(h, i):
            # (a·h + b) mod M, M = 2^61-1, in EXACT long arithmetic via
            # the Mersenne fold 2^61 ≡ 1 (mod M).  With a < 2^30 and
            # h < 2^60, split h = h_hi·2^30 + h_lo (each < 2^30):
            #   a·h ≡ a·h_lo + fold(a·h_hi · 2^30)          (mod M)
            #   fold(x·2^30) = (x >> 31) + ((x & (2^31-1)) << 30)
            # every intermediate stays under 2^63 (a·h_lo < 2^60,
            # fold < 2^61+2^29, b < 2^61 → sum < 7·2^60), so nothing
            # overflows under ANSI.  Mathematically identical to the
            # previous decimal(30,0) formulation — and ~5x cheaper (long
            # mul/shift/add vs software decimal multiply + modulo).
            ai = F.element_at(a_arr, i)
            x = ai * F.shiftright(h, 30)
            fold = F.shiftright(x, 31) + F.shiftleft(
                x.bitwiseAND(F.lit((1 << 31) - 1)), 30
            )
            lo = ai * h.bitwiseAND(F.lit((1 << 30) - 1))
            return (lo + fold + F.element_at(b_arr, i)) % m

        sig = F.aggregate(
            hashes,
            F.array_repeat(F.lit(max_long).cast("long"), num_perm),
            lambda acc, h: F.zip_with(
                acc,
                F.transform(idx, lambda i: perm_val(h, i)),
                lambda cur, v: F.least(cur, v),
            ),
        )
        return F.when(F.size(shingle_col) > 0, sig)
    if hash_family != "xxhash64":
        raise ValueError(
            f"hash_family must be 'xxhash64' or 'md5', got {hash_family!r}"
        )
    perm_idx = F.sequence(F.lit(seed), F.lit(seed + num_perm - 1))
    hashes = F.transform(shingle_col, lambda s: F.xxhash64(s))
    sig = F.aggregate(
        hashes,
        F.array_repeat(F.lit(max_long).cast("long"), num_perm),
        lambda acc, h: F.zip_with(
            acc,
            F.transform(perm_idx, lambda p: F.xxhash64(h, p)),
            lambda cur, v: F.least(cur, v),
        ),
    )
    return F.when(F.size(shingle_col) > 0, sig)


def minhash_signature_udf(num_perm: int = 64, seed: int = 7):
    """Arrow-batched minhash signature over a column of SHINGLE HASHES
    (``array<bigint>``, from ``transform(sh, xxhash64)``) — bit-identical
    to :func:`minhash_signature` (the numpy XXH64 replica chains the same
    seeds as Spark's two-argument ``xxhash64(h, p)``, int32 second arg).

    MEASURED NEGATIVE RESULT, kept for the record: at sf0.1 this is ~4x
    SLOWER than the expression form (16s vs 3.5s end-to-end) — the JVM
    fold is whole-stage-codegen-fused over cached arrays, while this path
    pays Arrow serialization of the full hash arrays plus per-row numpy
    dispatch.  Contrast with the hyperplane-signature swap (sim/ann.py),
    where one dense matmul per BATCH wins: Arrow+numpy pays off only when
    the per-batch work collapses into one large vectorized op, not when it
    stays per-row.  :func:`minhash_near_duplicates` uses the expression
    form."""
    perms = np.arange(seed, seed + num_perm, dtype=np.int64).view(np.uint64)

    def _sig(hs: pd.Series) -> pd.Series:
        out = []
        for h in hs:
            if h is None or len(h) == 0:
                out.append(None)
                continue
            hv = np.asarray(h, dtype=np.int64).view(np.uint64)
            # xxhash64(h, p) with p int32: xxh64_int(p, xxh64_long(h, 42))
            t = _xxh64_long(hv, np.uint64(42))
            m = _xxh64_int(perms[None, :], t[:, None])
            # SIGNED min — Spark's F.least compares longs as signed
            out.append(m.view(np.int64).min(axis=0))
        return pd.Series(out, dtype=object)

    return F.pandas_udf(_sig, T.ArrayType(T.LongType()))


def _minhash_sigs_arrow(
    hashed: DataFrame,
    num_perm: int,
    seed: int,
    hash_family: str,
) -> DataFrame:
    """``(id, sig array<bigint>)`` from ``(id, hs array<bigint>)`` shingle
    HASHES — whole-batch vectorized signatures, bit-identical to
    :func:`minhash_signature`'s fold for both families.

    The expression fold evaluates its permutation lambdas INTERPRETED
    (higher-order functions never enter whole-stage codegen), which makes
    the P×|shingles| permutation sweep the signature stage's dominant
    cost (~2 s of the md5-family contract query at sf0.1).  Here each
    Arrow batch computes one (P, total_shingles) permutation sweep as
    flat numpy vector ops and collapses it to per-document minima with
    ``np.minimum.reduceat`` — the same whole-batch-segment shape that
    made :func:`..simhash._simhash_arrow` win, and the opposite of the
    per-row :func:`minhash_signature_udf` dispatch that LOST (its
    negative result stands; the per-row Python loop was the problem,
    not Arrow).

    Exactness: md5 family = ``(a_p·h + b_p) mod 2^61-1`` in uint64 via
    the same Mersenne fold (every intermediate < 2^63, nothing wraps);
    xxhash64 family = the numpy XXH64 replica already verified
    bit-identical to Spark's two-argument ``xxhash64(h, p)`` (TestANN).
    Empty hash arrays yield no row, matching the NULL-signature filter.
    """
    import numpy as np
    import pyarrow as pa

    if hash_family == "md5":
        a_co, b_co = md5_permutation_family(num_perm, seed)
        a_np = np.array(a_co, dtype=np.uint64)
        b_np = np.array(b_co, dtype=np.uint64)
        m_np = np.uint64(MERSENNE61)
        mask30 = np.uint64((1 << 30) - 1)
        mask31 = np.uint64((1 << 31) - 1)

        def perm_row(h, p):
            x = a_np[p] * (h >> np.uint64(30))
            fold = (x >> np.uint64(31)) + ((x & mask31) << np.uint64(30))
            return (a_np[p] * (h & mask30) + fold + b_np[p]) % m_np

    else:
        perms = np.arange(seed, seed + num_perm, dtype=np.int64).view(
            np.uint64
        )

        def perm_row(h, p):
            return _xxh64_int(perms[p], _xxh64_long(h, np.uint64(42)))

    def gen(batches):
        for batch in batches:
            col = batch.column(1)
            if isinstance(col, pa.ChunkedArray):  # pragma: no cover
                col = col.combine_chunks()
            ids = batch.column(0)
            offs = col.offsets.to_numpy()
            vals = (
                col.values.to_numpy(zero_copy_only=False)
                .astype(np.int64)
                .view(np.uint64)
            )
            lengths = offs[1:] - offs[:-1]
            keep = lengths > 0
            if not keep.any():
                continue
            starts = offs[:-1][keep]
            n_rows = int(keep.sum())
            mins = np.empty((num_perm, n_rows), dtype=np.int64)
            for p in range(num_perm):
                v = perm_row(vals, p)
                # SIGNED minimum — F.least compares longs as signed
                # (md5-family values are < 2^61, where the orders agree)
                mins[p] = np.minimum.reduceat(v.view(np.int64), starts)
            sig = pa.ListArray.from_arrays(
                pa.array(
                    np.arange(n_rows + 1, dtype=np.int64) * num_perm,
                    type=pa.int32(),
                ),
                pa.array(mins.T.ravel()),
            )
            yield pa.RecordBatch.from_arrays(
                [ids.filter(pa.array(keep)), sig], names=["id", "sig"]
            )

    id_type = hashed.schema["id"].dataType.simpleString()
    return hashed.mapInArrow(gen, f"id {id_type}, sig array<bigint>")


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    sig_col: str = "sig",
    *,
    bands: int = 16,
    rows_per_band: int = 4,
    max_bucket_size: int = 200,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """Candidate id pairs sharing ≥1 LSH band. Output: (id_a, id_b) distinct,
    id_a < id_b.  ``hash_family='md5'`` buckets on the portable
    :func:`md5_long60` of the band's value string (``'<band>_<v1>_..._<vR>'``)
    so an external oracle reproduces the exact bucketing."""

    def band_hash(b: int) -> Column:
        band_vals = F.slice(F.col(sig_col), b * rows_per_band + 1, rows_per_band)
        if hash_family == "md5":
            return md5_long60(
                F.concat_ws(
                    "_",
                    F.lit(str(b)),
                    F.array_join(
                        F.transform(band_vals, lambda v: v.cast("string")), "_"
                    ),
                )
            )
        return F.xxhash64(band_vals, F.lit(b))

    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_idx"),
                band_hash(b).alias("band_hash"),
            )
            for b in range(bands)
        ]
    )
    exploded = (
        df.where(F.col(sig_col).isNotNull())
        .select(F.col(id_col).alias("id"), F.explode(band_structs).alias("band"))
        .select("id", "band.band_idx", "band.band_hash")
    )
    # hot band-hashes filtered out BEFORE pair expansion (size-bounded
    # per-key self-join, buckets.bounded_pair_join: ≤ C(cap, 2) rows per
    # bucket stream through codegen — no collect_list buffer, no Python
    # enumeration stage)
    return bounded_pair_join(
        exploded, ["band_idx", "band_hash"], "id",
        max_bucket_size=max_bucket_size,
    ).distinct()


def minhash_near_duplicates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    k: int = 3,
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.7,
    max_bucket_size: int = 200,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """End-to-end near-dup pairs: ``(id_a, id_b, jaccard_est)``.

    jaccard_est = fraction of agreeing minhash positions (unbiased estimator
    of true Jaccard).  ``hash_family='md5'`` runs the engine-portable
    variant end to end (see :func:`minhash_signature`) — same pipeline
    shape, reproducible in external SQL engines.
    """
    rows_per_band = num_perm // bands
    # Materialize the shingle set BEFORE the signature projection: the
    # signature references `sh` twice (size guard + hash traversal) and the
    # tokenize/ngram pipeline is itself multi-referenced — fusing everything
    # into one projection re-evaluates the expensive text pipeline several
    # times per row (measured 3x wall at sf0.1).  persist + count pins the
    # computed arrays.
    # (toks staged as its own projection first: the gram lambda inside
    # shingles references the token array per position — an inlined
    # tokenizer would re-run its regexes O(n) times per document)
    sets = (
        df.where(F.col(text_col).isNotNull())
        .select(
            F.col(id_col).alias("id"),
            word_tokens(normalized_text(F.col(text_col))).alias("__toks"),
        )
        .select("id", shingles_from_tokens(F.col("__toks"), k).alias("sh"))
        # LAZY persist, no eager count: the InMemoryRelation boundary is
        # what blocks CollapseProject from inlining the shingle pipeline
        # into the signature fold's multiple references (measured 4x wall
        # without it), and `sets` has exactly ONE consumer (the signature
        # projection below), so the sigs count() materializes both in one
        # pipelined action with no cache-population race.
        .persist()
    )
    # shingle strings hash to longs JVM-side (one cheap pass), then the
    # P-permutation sweep + per-document minima run whole-batch in numpy
    # (_minhash_sigs_arrow) — bit-identical to the expression fold, which
    # evaluated its lambdas interpreted and dominated the signature stage
    hash_one = (
        md5_long60 if hash_family == "md5" else (lambda s: F.xxhash64(s))
    )
    if hash_family not in ("md5", "xxhash64"):
        raise ValueError(
            f"hash_family must be 'xxhash64' or 'md5', got {hash_family!r}"
        )
    hashed = sets.select(
        "id", F.transform(F.col("sh"), hash_one).alias("hs")
    )
    sigs = _minhash_sigs_arrow(hashed, num_perm, 7, hash_family)
    # signatures are consumed four times (bucket sizes + pair join sides
    # + both verify sides), but those consumers are SEQUENTIAL stages of
    # the caller's action (sizes → keep → live join → pairs → verify), so
    # a lazy persist is populated by the first stage and reused by the
    # rest — the old eager count() was one whole extra job per call
    sigs = sigs.persist()

    pairs = lsh_candidate_pairs(
        sigs, "id", "sig",
        bands=bands, rows_per_band=rows_per_band, max_bucket_size=max_bucket_size,
        hash_family=hash_family,
    )
    a = sigs.select(F.col("id").alias("id_a"), F.col("sig").alias("sig_a"))
    b = sigs.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b"))
    joined = pairs.join(a, "id_a").join(b, "id_b")
    est = (
        F.size(
            F.filter(
                F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
                lambda eq: eq,
            )
        )
        / F.lit(num_perm)
    )
    out = (
        joined.select("id_a", "id_b", est.alias("jaccard_est"))
        .where(F.col("jaccard_est") >= threshold)
    )
    # materialize the (small) pair result, then drop the intermediate caches
    from ..cache import lazy_result

    return lazy_result(out, sets, sigs)
