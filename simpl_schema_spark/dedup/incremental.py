"""Incremental (cross-snapshot) dedup — new-batch keys vs a seen table.

A resumable crawl pipeline dedups each incoming batch against the keys
already ingested (url/fingerprint column of the previous snapshots).
The exact answer is a ``left_anti`` join — but at 10^12 seen keys that
join shuffles the ENTIRE new batch.  The classic fix is a Bloom filter
pre-pass: probe every batch row against a compact bitset built from the
seen keys; rows with ANY unset probe bit are *definitely new* (Bloom
filters have no false negatives) and skip the join entirely, so the
exact anti-join runs only over the (small) maybe-seen remainder plus
false positives.  The final result is therefore EXACT for every
``fpp`` — the filter is invisible in the output, which is what lets the
driver contract gate this hash-exact against a plain SQL anti join.

Construction is fully distributed: per-key probe positions explode
map-side, a ``bit_or`` hash aggregation folds them into ``m/64`` words
(the only shuffle, bounded by the filter size, not the seen count), and
the assembled word array ships to executors as a 1-row broadcast
cross-join — the repo's tiny-totals pattern, not a plan-bloating
literal.  Probing is pure expressions (double hashing via two xxhash64
calls, Kirsch–Mitzenmacher), fused into the batch scan.

Sizing: 2^22 bits (default) is 512 KiB broadcast and holds ~400k seen
keys at 1% FP; scale ``bloom_bits`` with the snapshot (2^30 bits = 128
MiB is still broadcastable).  Past that, partition the seen table and
run one filter per partition — or skip the Bloom (``use_bloom=False``)
and take the plain anti join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["bloom_words", "new_rows"]


def _positions(key: Column, n_hashes: int, n_bits: int) -> Column:
    """Array of ``n_hashes`` bit positions for ``key``: pos_i =
    ``xxhash64(key, i) mod m``.  Seeded rehash rather than the textbook
    ``h1 + i*h2`` double-hash — Spark 4's ANSI mode forbids wrapping
    64-bit arithmetic, and the repo's minhash family uses the same
    seeded-rehash shape for the same reason."""
    ks = key.cast("string")
    return F.transform(
        F.sequence(F.lit(0), F.lit(n_hashes - 1)),
        lambda i: F.pmod(F.xxhash64(ks, i), F.lit(n_bits)),
    )


def bloom_words(
    seen: DataFrame,
    key_col: str,
    *,
    bloom_bits: int = 1 << 22,
    n_hashes: int = 5,
) -> DataFrame:
    """1-row DataFrame ``(words: array<long>)`` — the Bloom bitset over
    ``seen[key_col]`` packed into ``bloom_bits/64`` words."""
    if bloom_bits % 64 != 0 or bloom_bits <= 0:
        raise ValueError(f"bloom_bits must be a positive multiple of 64, got {bloom_bits}")
    if n_hashes < 1:
        raise ValueError(f"n_hashes must be >= 1, got {n_hashes}")
    n_words = bloom_bits // 64
    set_words = (
        seen.select(
            F.explode(
                _positions(F.col(key_col), n_hashes, bloom_bits)
            ).alias("__pos")
        )
        .select(
            (F.col("__pos") / 64).cast("long").alias("__w"),
            # call_function: pyspark's shiftleft wrapper only takes a
            # Python-int shift amount
            F.call_function(
                "shiftleft",
                F.lit(1).cast("long"),
                (F.col("__pos") % 64).cast("int"),
            ).alias("__m"),
        )
        .groupBy("__w")
        .agg(F.bit_or("__m").alias("__bits"))
    )
    # densify to a full word array: unset words -> 0 (map_from_entries
    # keeps the collected state one row of filter-sized data)
    return set_words.agg(
        F.map_from_entries(
            F.collect_list(F.struct("__w", "__bits"))
        ).alias("__wm")
    ).select(
        F.transform(
            F.sequence(F.lit(0), F.lit(n_words - 1)),
            lambda i: F.coalesce(
                F.element_at("__wm", i.cast("long")), F.lit(0).cast("long")
            ),
        ).alias("words")
    )


def new_rows(
    batch: DataFrame,
    seen: DataFrame,
    key_col: str,
    *,
    use_bloom: bool = True,
    bloom_bits: int = 1 << 22,
    n_hashes: int = 5,
) -> DataFrame:
    """Rows of ``batch`` whose ``key_col`` does not occur in ``seen`` —
    EXACT for any Bloom sizing (the filter only routes rows, never
    decides membership).  ``seen`` may carry extra columns; only
    ``key_col`` is read."""
    seen_keys = seen.select(F.col(key_col).alias("__seen_key")).distinct()
    if not use_bloom:
        return batch.join(
            seen_keys, F.col(key_col) == F.col("__seen_key"), "left_anti"
        )
    words = bloom_words(
        seen, key_col, bloom_bits=bloom_bits, n_hashes=n_hashes
    )
    probed = batch.crossJoin(words).withColumn(
        "__maybe_seen",
        F.forall(
            _positions(F.col(key_col), n_hashes, bloom_bits),
            lambda p: (
                F.element_at(
                    "words", ((p / 64).cast("long") + 1).cast("int")
                ).bitwiseAND(
                    F.call_function(
                        "shiftleft",
                        F.lit(1).cast("long"),
                        (p % 64).cast("int"),
                    )
                )
                != 0
            ),
        ),
    )
    from ..cache import lazy_result

    # consumed twice (definitely-new branch + maybe-seen branch): stage
    # the probed batch once so the scan+probe doesn't run twice
    probed = probed.persist()
    definitely_new = probed.where(~F.col("__maybe_seen")).drop(
        "__maybe_seen", "words"
    )
    maybe_seen = probed.where(F.col("__maybe_seen")).drop(
        "__maybe_seen", "words"
    )
    confirmed_new = maybe_seen.join(
        seen_keys, F.col(key_col) == F.col("__seen_key"), "left_anti"
    )
    result = definitely_new.unionAll(confirmed_new)
    return lazy_result(result, probed)
