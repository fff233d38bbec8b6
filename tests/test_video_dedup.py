"""Video near-dup by shared sampled-frame hashes
(multimodal/media.video_near_duplicates)."""

import pytest

from simpl_schema_spark.multimodal import video_near_duplicates
from tests.test_pipeline_ops import _make_y4m

#: streaming watermark waits / frame decode dominate the suite's tail;
#: the fast loop (pytest -m 'not slow') skips them
pytestmark = pytest.mark.slow


class TestVideoNearDuplicates:
    def test_shared_frames_pair_found(self, spark):
        # videos 1 and 2 share frames (lumas 10,20,30 vs 10,20,99);
        # video 3 is disjoint
        v1 = _make_y4m(n_frames=3, luma=[10, 20, 30])
        v2 = _make_y4m(n_frames=3, luma=[10, 20, 99])
        v3 = _make_y4m(n_frames=3, luma=[70, 80, 90])
        df = spark.createDataFrame(
            [(1, bytearray(v1)), (2, bytearray(v2)), (3, bytearray(v3))],
            "id long, payload binary",
        )
        pairs = {
            (r.id_a, r.id_b): r.n_shared
            for r in video_near_duplicates(
                df, n_frames=3, min_shared=2, use_stub=False
            ).collect()
        }
        assert pairs == {(1, 2): 2}

    def test_min_shared_threshold(self, spark):
        v1 = _make_y4m(n_frames=3, luma=[10, 20, 30])
        v2 = _make_y4m(n_frames=3, luma=[10, 98, 99])  # one shared frame
        df = spark.createDataFrame(
            [(1, bytearray(v1)), (2, bytearray(v2))],
            "id long, payload binary",
        )
        assert (
            video_near_duplicates(
                df, n_frames=3, min_shared=2, use_stub=False
            ).count()
            == 0
        )
        one = video_near_duplicates(
            df, n_frames=3, min_shared=1, use_stub=False
        ).collect()
        assert [(r.id_a, r.id_b, r.n_shared) for r in one] == [(1, 2, 1)]

    def test_hot_frame_hash_is_capped_not_exploded(self, spark):
        # 30 videos all sharing one identical (e.g. black) frame: with
        # max_bucket_size below the corpus size the hot hash is dropped
        # by the bounded bucket builder instead of emitting 435 pairs
        vids = [
            (i, bytearray(_make_y4m(n_frames=2, luma=[5, 100 + i])))
            for i in range(30)
        ]
        df = spark.createDataFrame(vids, "id long, payload binary")
        out = video_near_duplicates(
            df, n_frames=2, min_shared=1, use_stub=False, max_bucket_size=10
        )
        assert out.count() == 0
