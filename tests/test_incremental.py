"""Incremental cross-snapshot dedup with Bloom pre-filter
(dedup/incremental.py)."""

import pytest
from pyspark.sql import functions as F

from simpl_schema_spark.dedup import bloom_words, new_rows


@pytest.fixture(scope="module")
def frames(spark):
    seen = spark.createDataFrame(
        [(f"https://seen.com/{i}", i) for i in range(300)],
        "url string, snap long",
    )
    batch = spark.createDataFrame(
        [(f"https://seen.com/{i}", 100 + i) for i in range(0, 600, 2)],
        "url string, doc_id long",
    )
    # expected new: odd-free range 0..598 step2 -> urls with i >= 300
    return seen, batch


class TestBloomWords:
    def test_shape_and_population(self, spark, frames):
        seen, _ = frames
        row = bloom_words(seen, "url", bloom_bits=1 << 12).collect()[0]
        assert len(row.words) == (1 << 12) // 64
        assert any(w != 0 for w in row.words)

    def test_empty_seen_is_all_zero(self, spark):
        empty = spark.createDataFrame([], "url string")
        row = bloom_words(empty, "url", bloom_bits=1 << 10).collect()[0]
        assert all(w == 0 for w in row.words)

    def test_param_validation(self, spark, frames):
        seen, _ = frames
        with pytest.raises(ValueError):
            bloom_words(seen, "url", bloom_bits=100)  # not /64
        with pytest.raises(ValueError):
            bloom_words(seen, "url", n_hashes=0)


class TestNewRows:
    def test_exact_vs_plain_anti_join(self, spark, frames):
        seen, batch = frames
        want = {
            r.url
            for r in new_rows(batch, seen, "url", use_bloom=False).collect()
        }
        got = {r.url for r in new_rows(batch, seen, "url").collect()}
        assert got == want
        assert want == {f"https://seen.com/{i}" for i in range(300, 600, 2)}

    def test_exact_under_heavy_false_positives(self, spark, frames):
        """A 64-bit filter with 300 seen keys saturates -> nearly every
        probe is a false positive, and the result must STILL be exact."""
        seen, batch = frames
        got = {
            r.url
            for r in new_rows(
                batch, seen, "url", bloom_bits=64, n_hashes=3
            ).collect()
        }
        assert got == {f"https://seen.com/{i}" for i in range(300, 600, 2)}

    def test_batch_columns_preserved(self, spark, frames):
        seen, batch = frames
        out = new_rows(batch, seen, "url")
        assert out.columns == ["url", "doc_id"]

    def test_empty_seen_returns_batch(self, spark, frames):
        _, batch = frames
        empty = spark.createDataFrame([], "url string")
        assert new_rows(batch, empty, "url").count() == batch.count()

    def test_duplicate_seen_keys_ok(self, spark, frames):
        seen, batch = frames
        doubled = seen.unionAll(seen)
        got = new_rows(batch, doubled, "url").count()
        assert got == 150
