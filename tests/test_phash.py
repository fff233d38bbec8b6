"""Perceptual image dHash near-dup (multimodal/phash.py)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from simpl_schema_spark.multimodal import (
    dhash64,
    image_dhash,
    image_near_duplicates,
)
from simpl_schema_spark.multimodal.minipng import encode_png


def _png(pixels: np.ndarray) -> bytes:
    """Encode a (h, w) uint8 luma array as an RGB PNG."""
    rows = [
        bytes(
            b
            for v in pixels[y]
            for b in (int(v), int(v), int(v))
        )
        for y in range(pixels.shape[0])
    ]
    return encode_png(pixels.shape[1], pixels.shape[0], rows)


def _gradient(h, w):
    return np.tile(
        np.linspace(0, 255, w, dtype=np.uint8), (h, 1)
    )


class TestDhash64:
    def test_gradient_is_all_ones(self):
        # strictly increasing left->right: every comparison bit is 1
        assert dhash64(_gradient(64, 72)) == -1  # 64 one-bits, signed

    def test_reverse_gradient_is_zero(self):
        assert dhash64(_gradient(64, 72)[:, ::-1]) == 0

    def test_scale_invariance(self):
        rng = np.random.RandomState(7)
        base = rng.randint(0, 256, (32, 36)).astype(np.uint8)
        big = np.kron(base, np.ones((4, 4), dtype=np.uint8))
        h1, h2 = dhash64(base), dhash64(big)
        assert bin((h1 ^ h2) & ((1 << 64) - 1)).count("1") <= 4

    def test_rejects_bad_shapes(self):
        with pytest.raises(ValueError):
            dhash64(np.zeros(10))
        with pytest.raises(ValueError):
            dhash64(np.zeros((5, 1)))


class TestImageDhash:
    def test_real_decode_matches_direct_hash(self, spark):
        px = _gradient(40, 50)
        df = spark.createDataFrame(
            [(1, bytearray(_png(px)))], "id long, payload binary"
        )
        got = image_dhash(df, use_stub=False).collect()[0]
        assert got.dhash == dhash64(px)

    def test_null_payload_hashes_null(self, spark):
        df = spark.createDataFrame(
            [(1, None)], "id long, payload binary"
        )
        got = image_dhash(df, use_stub=False).collect()[0]
        assert got.dhash is None

    def test_skip_policy_drops_corrupt(self, spark):
        df = spark.createDataFrame(
            [
                (1, bytearray(_png(_gradient(16, 18)))),
                (2, bytearray(b"\x89PNG then garbage")),
            ],
            "id long, payload binary",
        )
        ids = {r.id for r in image_dhash(df, use_stub=False, on_error="skip").collect()}
        assert ids == {1}
        with pytest.raises(Exception):
            image_dhash(df, use_stub=False, on_error="raise").collect()

    def test_stub_is_deterministic(self, spark):
        df = spark.createDataFrame(
            [(1, bytearray(b"abc")), (2, bytearray(b"abc"))],
            "id long, payload binary",
        )
        hs = [r.dhash for r in image_dhash(df, use_stub=True).collect()]
        assert hs[0] == hs[1] and hs[0] is not None


class TestImageNearDuplicates:
    def test_near_pair_found_distinct_not(self, spark):
        rng = np.random.RandomState(11)
        base = rng.randint(0, 256, (64, 64)).astype(np.uint8)
        noisy = base.copy()
        noisy[:2, :2] = 255 - noisy[:2, :2]  # tiny local perturbation
        other = rng.randint(0, 256, (64, 64)).astype(np.uint8)
        df = spark.createDataFrame(
            [
                (1, bytearray(_png(base))),
                (2, bytearray(_png(noisy))),
                (3, bytearray(_png(other))),
            ],
            "id long, payload binary",
        )
        pairs = {
            (r.id_a, r.id_b): r.hamming
            for r in image_near_duplicates(
                df, use_stub=False, max_hamming=6
            ).collect()
        }
        assert (1, 2) in pairs and pairs[(1, 2)] <= 6
        assert (1, 3) not in pairs and (2, 3) not in pairs
