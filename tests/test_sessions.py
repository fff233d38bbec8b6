"""Gap-based sessionization (sessions.py): boundary semantics, ties,
per-user isolation, and the one-shuffle plan shape."""

import pytest
from datetime import datetime, timedelta

from pyspark.sql import functions as F

from simpl_schema_spark.sessions import session_stats, sessionize

T0 = datetime(2024, 3, 1, 12, 0, 0)


def _events(spark, rows):
    """rows: (event_id, user_id, offset_minutes)."""
    data = [(eid, uid, T0 + timedelta(minutes=m)) for eid, uid, m in rows]
    return spark.createDataFrame(
        data, "event_id bigint, user_id bigint, ts timestamp_ntz"
    )


def _idx(df):
    return {
        r.event_id: r.session_idx
        for r in df.select("event_id", "session_idx").collect()
    }


class TestSessionize:
    def test_gap_splits_sessions(self, spark):
        df = _events(spark, [(1, 7, 0), (2, 7, 10), (3, 7, 50), (4, 7, 55)])
        idx = _idx(sessionize(df, gap_minutes=30))
        assert idx == {1: 0, 2: 0, 3: 1, 4: 1}

    def test_gap_exactly_equal_stays_in_session(self, spark):
        # boundary: gap == gap_minutes stays; one microsecond more breaks
        df = _events(spark, [(1, 7, 0), (2, 7, 30)])
        assert _idx(sessionize(df, gap_minutes=30)) == {1: 0, 2: 0}
        df2 = spark.createDataFrame(
            [
                (1, 7, T0),
                (2, 7, T0 + timedelta(minutes=30, microseconds=1)),
            ],
            "event_id bigint, user_id bigint, ts timestamp_ntz",
        )
        assert _idx(sessionize(df2, gap_minutes=30)) == {1: 0, 2: 1}

    def test_users_independent(self, spark):
        df = _events(spark, [(1, 1, 0), (2, 2, 0), (3, 1, 90), (4, 2, 5)])
        idx = _idx(sessionize(df, gap_minutes=30))
        assert idx == {1: 0, 2: 0, 3: 1, 4: 0}

    def test_timestamp_tie_broken_by_id(self, spark):
        # same ts twice then a far event: deterministic indices either way
        df = _events(spark, [(2, 7, 0), (1, 7, 0), (3, 7, 120)])
        idx = _idx(sessionize(df, gap_minutes=30))
        assert idx == {1: 0, 2: 0, 3: 1}


class TestSessionStats:
    def test_rollup_values(self, spark):
        df = _events(spark, [(1, 7, 0), (2, 7, 10), (3, 7, 50)])
        rows = {
            (r.user_id, r.session_idx): r
            for r in session_stats(df, gap_minutes=30).collect()
        }
        s0 = rows[(7, 0)]
        assert s0.n_events == 2
        assert s0.duration_us == 10 * 60_000_000
        assert s0.first_event_id == 1
        s1 = rows[(7, 1)]
        assert s1.n_events == 1 and s1.duration_us == 0

    def test_single_shuffle_plan(self, spark):
        # the (user, session_idx) rollup must reuse the window's
        # hash-partitioning on user — exactly ONE Exchange in the plan
        df = _events(spark, [(1, 7, 0), (2, 7, 10)])
        plan = (
            session_stats(df, gap_minutes=30)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert plan.count("Exchange") == 1, plan

    def test_no_unpartitioned_window(self, spark):
        df = _events(spark, [(1, 7, 0)])
        plan = (
            sessionize(df, gap_minutes=30)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # every Window node carries the user partition key
        for line in plan.splitlines():
            if "Window [" in line:
                assert "[user_id" in line, line


@pytest.mark.slow
class TestStreamingSessions:
    #: 3-minute stateful-streaming wait; skipped by the -m 'not slow' fast loop
    def test_gap_closed_sessions_emitted(self, spark, tmp_path):
        from simpl_schema_spark.streaming import streaming_sessions

        src = str(tmp_path / "ev_stream")
        rows = [
            # user 7: sessions [0,10] (closed by 120), open [120,130]
            (1, 7, 0), (2, 7, 10), (3, 7, 120), (4, 7, 130),
            # user 8: singleton sessions closed at 100 and 200; open [200]
            (5, 8, 0), (6, 8, 100), (7, 8, 200),
        ]
        _events(spark, rows).write.mode("overwrite").parquet(src)
        schema = spark.read.parquet(src).schema
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            streaming_sessions(stream, gap_minutes=30)
            .writeStream.format("memory")
            .queryName("sess_stream")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        got = {
            (r.user_id, r.session_start_us): (
                r.session_end_us, r.n_events, r.closed_by
            )
            for r in spark.sql("select * from sess_stream").collect()
        }

        def us(minutes):
            return int((T0 + timedelta(minutes=minutes)).timestamp() * 1_000_000)

        # only gap-closed sessions are emitted (open ones stay in state)
        assert got[(7, us(0))] == (us(10), 2, "gap")
        assert got[(8, us(0))] == (us(0), 1, "gap")
        assert got[(8, us(100))] == (us(100), 1, "gap")
        assert (7, us(120)) not in got
        assert (8, us(200)) not in got
