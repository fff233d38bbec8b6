"""SimHash near-duplicate detection, expression-only.

64-bit SimHash: each token hashes to 64 bits; bit b of the fingerprint is 1
iff Σ_tokens (±1 per token's bit b) > 0.  Near-dups = fingerprints within a
small Hamming distance.

Candidate generation uses the Charikar rotation trick adapted to banding:
split the 64 bits into ``bands`` chunks; docs within Hamming distance d < bands
must agree on ≥1 chunk → one shuffle on (chunk_idx, chunk_value).

Everything is Spark expressions (shiftright/bitwise ops inside transform /
aggregate) — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..text.analysis import normalized_text, word_tokens
from .buckets import bounded_pair_join

__all__ = [
    "simhash",
    "simhash_from_hashes",
    "hamming_distance",
    "hamming_near_duplicates",
    "simhash_near_duplicates",
]

_BITS = 64


def _token_hash(hash_family: str):
    if hash_family == "md5":
        from .minhash import md5_long64

        return md5_long64
    if hash_family != "xxhash64":
        raise ValueError(
            f"hash_family must be 'xxhash64' or 'md5', got {hash_family!r}"
        )
    return F.xxhash64


def simhash(text: Column, *, hash_family: str = "xxhash64") -> Column:
    """64-bit SimHash of whitespace tokens of normalized text (bigint).

    NOTE: references its input 129 times (2 per bit + size); call via
    :func:`simhash_near_duplicates`-style two-phase selects so the token
    hash array is materialized once per row, not recomputed per bit.

    SimHash is pure integer arithmetic — the only engine-specific piece
    is the token hash, so ``hash_family='md5'`` (portable full-64-bit md5,
    :func:`..minhash.md5_long64`) makes the whole fingerprint
    reproducible in external SQL engines.  Default stays xxhash64.
    """
    th = _token_hash(hash_family)
    return simhash_from_hashes(
        F.transform(word_tokens(normalized_text(text)), lambda t: th(t))
    )


def simhash_from_hashes(hashes: Column) -> Column:
    """Single-pass fingerprint: ONE ``F.aggregate`` traversal of the token
    hashes accumulating all 64 bit counters (array<long>), then one zip to
    assemble the word — replaces the 64×``F.filter`` unrolled loop, which
    traversed the hash array once per bit."""
    n = F.size(hashes)
    bit_idx = F.sequence(F.lit(0), F.lit(_BITS - 1))
    # the Python shiftright/shiftleft wrappers demand int shift amounts;
    # call_function reaches the SQL expressions, which take Columns
    shr = lambda x, b: F.call_function("shiftright", x, b)  # noqa: E731
    shl = lambda x, b: F.call_function("shiftleft", x, b)  # noqa: E731
    counts = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0).cast("long"), _BITS),
        lambda acc, h: F.zip_with(
            acc,
            F.transform(bit_idx, lambda b: shr(h, b).bitwiseAND(F.lit(1))),
            lambda c, one: c + one,
        ),
    )
    # Σ±1 > 0  ⇔  ones > n/2  (strict, ties → 0 bit)
    word = F.aggregate(
        F.zip_with(
            counts,
            bit_idx,
            lambda ones, b: shl(
                F.when(ones * 2 > n, F.lit(1).cast("long")).otherwise(
                    F.lit(0).cast("long")
                ),
                b,
            ),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc.bitwiseOR(v),
    )
    return F.when(n > 0, word)


def _simhash_arrow(token_hashes: DataFrame) -> DataFrame:
    """``(id, sh)`` SimHash words from an ``(id, th array<bigint>)``
    frame — Arrow-batched numpy bit counting (pure INTEGER arithmetic,
    bit-identical to :func:`simhash_from_hashes`; rows with empty/null
    hash arrays are dropped, matching the old NULL-word filter).

    The expression form folds a 64-element counter array per token
    through interpreted higher-order lambdas (~n_tokens × 64 lambda
    evaluations per document); one unpacked-bit matrix sum per Arrow
    batch does the same counting vectorized (guide §4.2), and it also
    removes the separate token-hash materialization pass the
    twice-referencing fold needed."""
    import numpy as np
    import pyarrow as pa

    def gen(batches):
        for batch in batches:
            col = batch.column(1)
            if isinstance(col, pa.ChunkedArray):  # pragma: no cover
                col = col.combine_chunks()
            ids = batch.column(0).to_numpy(zero_copy_only=False)
            offs = col.offsets.to_numpy()
            vals = col.values.to_numpy(zero_copy_only=False).astype(
                np.int64
            ).view(np.uint64)
            lengths = offs[1:] - offs[:-1]
            keep = lengths > 0
            if not keep.any():
                continue
            # per-token 64-bit unpack → per-doc column sums via
            # segment reduction (reduceat over the flat token stream)
            bits = (
                (vals[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                & np.uint64(1)
            ).astype(np.int64)
            # segments between consecutive KEPT starts cover exactly one
            # kept row's tokens (empty rows contribute no values)
            starts = offs[:-1][keep]
            counts = np.add.reduceat(bits, starts, axis=0)
            n = lengths[keep][:, None]
            word = (
                ((counts * 2 > n).astype(np.uint64)
                 << np.arange(64, dtype=np.uint64)[None, :])
                .sum(axis=1, dtype=np.uint64)
                .view(np.int64)
            )
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids[keep]), pa.array(word)],
                names=["id", "sh"],
            )

    id_type = token_hashes.schema["id"].dataType.simpleString()
    return token_hashes.mapInArrow(gen, f"id {id_type}, sh bigint")


def hamming_distance(a: Column, b: Column) -> Column:
    """Popcount of XOR via bit_count (JVM intrinsic)."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_near_duplicates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    max_hamming: int = 3,
    bands: int = 4,
    max_bucket_size: int = 500,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """Near-dup pairs ``(id_a, id_b, hamming)`` with hamming ≤ max_hamming.

    With bands=4, any pair within Hamming distance 3 shares at least one
    16-bit chunk (pigeonhole), so recall is exact for max_hamming < bands.
    ``hash_family='md5'`` uses the portable token hash (see
    :func:`simhash`) so an external oracle replays fingerprints, chunk
    buckets, and pairs exactly.
    """
    chunk_bits = _BITS // bands
    mask = (1 << chunk_bits) - 1
    th = _token_hash(hash_family)
    token_hashes = df.where(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("id"),
        F.transform(
            word_tokens(normalized_text(F.col(text_col))), lambda t: th(t)
        ).alias("th"),
    )
    sigs = (
        _simhash_arrow(token_hashes)
        # consumed by sequential stages of one action (bucket sizes →
        # pair join sides): a lazy persist is populated by the first
        # stage — no eager count job needed (see ngram.py)
        .persist()
    )
    return hamming_near_duplicates(
        sigs,
        "id",
        "sh",
        max_hamming=max_hamming,
        bands=bands,
        max_bucket_size=max_bucket_size,
        _intermediates=(sigs,),
        _presigned=True,
    )


def hamming_near_duplicates(
    sigs: DataFrame,
    id_col: str = "id",
    hash_col: str = "sh",
    *,
    max_hamming: int = 3,
    bands: int = 4,
    max_bucket_size: int = 500,
    _intermediates: tuple = (),
    _presigned: bool = False,
) -> DataFrame:
    """Near-dup pairs over ANY 64-bit fingerprint column (SimHash, image
    dHash, audio fingerprints …): ``(id_a, id_b, hamming)`` with hamming
    ≤ ``max_hamming``; recall exact for ``max_hamming < bands``
    (pigeonhole over the banded chunks).  Same bounded-bucket shape as
    every candidate generator in this package."""
    if not 1 <= bands <= _BITS or _BITS % bands != 0:
        raise ValueError(f"bands must divide {_BITS}, got {bands}")
    chunk_bits = _BITS // bands
    mask = (1 << chunk_bits) - 1
    if not _presigned:
        sigs = (
            sigs.select(
                F.col(id_col).alias("id"), F.col(hash_col).alias("sh")
            )
            .where(F.col("sh").isNotNull())
            # consumed by sequential stages of one action: lazy persist,
            # populated by the first consuming stage
            .persist()
        )
        _intermediates = (*_intermediates, sigs)
    chunks = F.array(
        *[
            F.struct(
                F.lit(c).alias("chunk_idx"),
                F.shiftright(F.col("sh"), c * chunk_bits)
                .bitwiseAND(F.lit(mask))
                .alias("chunk_val"),
            )
            for c in range(bands)
        ]
    )
    exploded = sigs.select("id", "sh", F.explode(chunks).alias("c")).select(
        "id", "sh", "c.chunk_idx", "c.chunk_val"
    )
    # hot chunks filtered out BEFORE pair expansion — the size-bounded
    # per-key self-join (buckets.bounded_pair_join) carries each side's
    # fingerprint along, so no collect_list buffer and no Python stage;
    # the Hamming popcount stays a JVM intrinsic on the pair rows
    pairs = bounded_pair_join(
        exploded, ["chunk_idx", "chunk_val"], "id",
        max_bucket_size=max_bucket_size, meta_col="sh",
    ).select(
        "id_a",
        "id_b",
        hamming_distance(F.col("sh_a"), F.col("sh_b")).alias("hamming"),
    )
    out = pairs.where(F.col("hamming") <= max_hamming).distinct()
    # materialize the (small) pair result, then drop the intermediate caches
    from ..cache import lazy_result

    return lazy_result(out, *_intermediates)
