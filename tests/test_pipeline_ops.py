"""PII redaction, sequence packing, keep-best dedup (round-4 additions)."""

import pytest

from pyspark.sql import functions as F

from simpl_schema_spark.dedup import keep_best
from simpl_schema_spark.packing import exclusive_prefix_sum, sequence_chunks
from simpl_schema_spark.text import pii_counts, redact_pii


def _pii_one(spark, text):
    df = spark.createDataFrame([(text,)], "text string")
    out = pii_counts(df, "text").withColumn(
        "redacted", redact_pii(F.col("text"))
    )
    return out.collect()[0]


class TestPii:
    def test_email(self, spark):
        r = _pii_one(spark, "write to First.Last+tag@sub.example.co.uk today")
        assert (r.n_email, r.n_ipv4, r.n_phone) == (1, 0, 0)
        assert r.redacted == "write to <EMAIL> today"

    def test_email_trailing_period_not_swallowed(self, spark):
        r = _pii_one(spark, "mail a@b.com. Next sentence")
        assert r.n_email == 1
        assert r.redacted == "mail <EMAIL>. Next sentence"

    def test_ipv4_word_boundaries(self, spark):
        r = _pii_one(spark, "host 192.168.0.1 and v1.2.3.4 end")
        # v1.2.3.4 does NOT match: \b needs a word/non-word transition and
        # 'v'->'1' is word->word, so no match can start after the 'v'
        assert r.n_ipv4 == 1
        assert r.redacted == "host <IP> and v1.2.3.4 end"

    def test_phone_variants(self, spark):
        r = _pii_one(spark, "call +1 555 010 1234 or +44-201-555 0000 now")
        assert r.n_phone == 2
        assert r.redacted == "call <PHONE> or <PHONE> now"

    def test_counts_independent_and_null_safe(self, spark):
        df = spark.createDataFrame(
            [("a@b.com from 10.0.0.1",), (None,)], "text string"
        )
        rows = pii_counts(df, "text").select(
            "text", "n_email", "n_ipv4", redact_pii(F.col("text")).alias("r")
        ).collect()
        by_null = {r.text is None: r for r in rows}
        assert (by_null[False].n_email, by_null[False].n_ipv4) == (1, 1)
        assert by_null[False].r == "<EMAIL> from <IP>"
        assert by_null[True].n_email is None and by_null[True].r is None


class TestPrefixSum:
    def test_matches_serial_cumsum(self, spark):
        rows = [(i, (i * 7) % 13) for i in range(200)]
        df = spark.createDataFrame(rows, "id long, v long").repartition(8)
        got = {
            r.id: r.prefix_sum
            for r in exclusive_prefix_sum(df, "id", "v").collect()
        }
        acc = 0
        for i, v in rows:
            assert got[i] == acc
            acc += v

    def test_no_global_single_task_window(self, spark):
        df = spark.createDataFrame([(i, 1) for i in range(10)], "id long, v long")
        plan = exclusive_prefix_sum(df, "id", "v")._jdf.queryExecution().executedPlan().toString()
        # every Window node must be partitioned (by __pid) — a global
        # ordered window would show an empty partition spec
        for line in plan.splitlines():
            if "Window" in line and "windowspecdefinition" in line:
                assert "__pid" in line, line

    def test_null_values_count_zero(self, spark):
        df = spark.createDataFrame(
            [(1, None), (2, 5), (3, None), (4, 2)], "id long, v long"
        )
        got = {
            r.id: r.prefix_sum
            for r in exclusive_prefix_sum(df, "id", "v").collect()
        }
        assert got == {1: 0, 2: 0, 3: 5, 4: 5}


class TestSequenceChunks:
    def test_layout(self, spark):
        # capacity 10; docs: 4, 8, 10, 0, 3  (in id order)
        df = spark.createDataFrame(
            [(1, 4), (2, 8), (3, 10), (4, 0), (5, 3)], "id long, n long"
        )
        got = {
            r.id: (r.tok_start, r.chunk_first, r.chunk_last, r.n_chunks)
            for r in sequence_chunks(df, "id", "n", capacity=10).collect()
        }
        assert got[1] == (0, 0, 0, 1)     # tokens 0-3
        assert got[2] == (4, 0, 1, 2)     # tokens 4-11 straddles
        assert got[3] == (12, 1, 2, 2)    # tokens 12-21 straddles
        assert got[4] == (22, 2, 2, 1)    # empty doc sits at its boundary
        assert got[5] == (22, 2, 2, 1)    # tokens 22-24

    def test_capacity_validated(self, spark):
        df = spark.createDataFrame([(1, 1)], "id long, n long")
        with pytest.raises(ValueError, match="capacity"):
            sequence_chunks(df, "id", "n", capacity=0)


class TestStreamingPii:
    def test_windowed_rates_match_batch(self, spark, tmp_path):
        import datetime

        from simpl_schema_spark.streaming import streaming_pii_rates

        src = str(tmp_path / "pii_src")
        ts = datetime.datetime(2026, 1, 1, 0, 30)
        rows = [
            (1, ts, "contact a@b.com and c@d.org"),   # 1 doc, 2 emails
            (2, ts, "from 10.0.0.1"),                  # 1 doc, 1 ip
            (3, ts, "clean text"),
            (4, ts, None),
        ]
        spark.createDataFrame(
            rows, "doc_id long, warc_ts timestamp, text string"
        ).write.mode("overwrite").parquet(src)
        static_schema = spark.read.parquet(src).schema

        stream = spark.readStream.schema(static_schema).parquet(src)
        out = streaming_pii_rates(stream, window_duration="24 hours")
        q = (
            out.writeStream.format("memory")
            .queryName("pii_rates")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        [r] = spark.sql("select * from pii_rates").collect()
        assert r.n_docs == 4
        assert (r.docs_email, r.matches_email) == (1, 2)
        assert (r.docs_ipv4, r.matches_ipv4) == (1, 1)
        assert (r.docs_phone, r.matches_phone) == (0, 0)


class TestReviewRound2Fixes:
    """Second self-review pass (post-late-additions) findings."""

    def test_vectorized_validator_on_deep_column_gets_decoded_values(self, spark):
        from tests.helpers import run_validation
        from simpl_schema_spark.schema import SimpleSchema

        def too_long(s):
            # vectorized: Series of the REAL nested lists, not JSON strings
            return s.map(
                lambda v: "tooLong" if v is not None and len(v) > 1 else None
            )

        too_long.vectorized = True
        ss = SimpleSchema(
            {
                "cube": {
                    "type": SimpleSchema.Array,
                    "optional": True,
                    "custom": too_long,
                },
                "cube.$": {"type": SimpleSchema.Array},
                "cube.$.$": {"type": SimpleSchema.Array},
                "cube.$.$.$": {"type": str},
            }
        )
        ddl = "cube array<array<array<string>>>"
        rows = [
            {"cube": [[["a"]]]},            # outer len 1 -> ok
            {"cube": [[["a"]], [["b"]]]},   # outer len 2 -> tooLong
        ]
        out = run_validation(spark, ss, ddl, rows)
        assert out[0] == []
        assert [(v["name"], v["type"]) for v in out[1]] == [("cube", "tooLong")]

    def test_video_stub_emits_rows_for_null_payload(self, spark):
        from simpl_schema_spark.multimodal import sample_video_frames

        df = spark.createDataFrame(
            [(1, bytearray(b"x" * 10)), (2, None)], "id bigint, payload binary"
        )
        out = sample_video_frames(df, n_frames=2, use_stub=True).collect()
        assert sorted((r.id, r.frame_idx) for r in out) == [
            (1, 0), (1, 1), (2, 0), (2, 1)
        ]

    def test_y4m_long_comment_header_parses(self):
        from simpl_schema_spark.multimodal.y4m import frame_offsets, parse_header

        b = (
            b"YUV4MPEG2 W2 H2 F25:1 X" + b"c" * 2000 + b"\n"
            + b"FRAME\n" + b"\x10" * 4 + b"\x80" * 2
        )
        info = parse_header(b)
        assert (info.width, info.height) == (2, 2)
        assert len(frame_offsets(b, info)) == 1

    def test_inclusive_prefix_sums_multi_column(self, spark):
        from simpl_schema_spark.packing import prefix_sums

        rows = [(i, 1, i % 3) for i in range(30)]
        df = spark.createDataFrame(rows, "x long, a long, b long")
        got = {
            r.x: (r.ca, r.cb)
            for r in prefix_sums(
                df, "x", ["a", "b"], ["ca", "cb"], inclusive=True
            ).collect()
        }
        sa = sb = 0
        for x, a, b in rows:
            sa += a
            sb += b
            assert got[x] == (sa, sb)


class TestPercentileFilter:
    def test_matches_sql_percent_rank_with_ties(self, spark):
        from simpl_schema_spark.ranking import exact_rank_counts

        # scores: 1,2,2,3 -> n_below: 0,1,1,3 (ties share)
        df = spark.createDataFrame(
            [(1, 1), (2, 2), (3, 2), (4, 3), (5, None)],
            "id long, s long",
        )
        got = {
            r.id: (r.n_below, r.n_total)
            for r in exact_rank_counts(df, "s").collect()
        }
        assert got == {1: (0, 4), 2: (1, 4), 3: (1, 4), 4: (3, 4)}

    def test_threshold_keeps_top_share(self, spark):
        from simpl_schema_spark.ranking import percentile_filter

        df = spark.createDataFrame(
            [(i, i) for i in range(100)], "id long, s long"
        )
        kept = sorted(
            r.id for r in percentile_filter(df, "s", min_percentile=0.9).collect()
        )
        # n_below = id here; keep id >= 0.9*99 = 89.1 -> 90..99
        assert kept == list(range(90, 100))

    def test_single_row_and_bounds(self, spark):
        from simpl_schema_spark.ranking import percentile_filter

        df = spark.createDataFrame([(1, 5)], "id long, s long")
        assert percentile_filter(df, "s", min_percentile=0.5).count() == 0
        assert percentile_filter(df, "s", min_percentile=0.0).count() == 1
        with pytest.raises(ValueError, match="min_percentile"):
            percentile_filter(df, "s", min_percentile=1.5)

    def test_no_global_window_in_plan(self, spark):
        from simpl_schema_spark.ranking import exact_rank_counts

        df = spark.createDataFrame([(i, i % 7) for i in range(50)], "id long, s long")
        plan = exact_rank_counts(df, "s")._jdf.queryExecution().executedPlan().toString()
        for line in plan.splitlines():
            if "Window" in line and "windowspecdefinition" in line:
                assert "__pid" in line, line


class TestRemoveCommonLines:
    def test_boilerplate_removed_order_preserved(self, spark):
        from simpl_schema_spark.dedup import remove_common_lines

        footer = "copyright footer"
        rows = [
            (i, f"unique body {i}\n  {footer}  \nmore {i}") for i in range(5)
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r.doc_id: (r.text, r.n_removed)
            for r in remove_common_lines(df, min_df=3).collect()
        }
        for i in range(5):
            # trimmed form matched; raw line (with spaces) removed; order kept
            assert got[i] == (f"unique body {i}\nmore {i}", 1)

    def test_empty_lines_never_removed_and_all_hot_doc(self, spark):
        from simpl_schema_spark.dedup import remove_common_lines

        rows = [(1, "hot\n\nhot"), (2, "hot\nkeep me"), (3, "hot")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r.doc_id: (r.text, r.n_removed)
            for r in remove_common_lines(df, min_df=2).collect()
        }
        assert got[1] == ("", 2)          # blank line alone -> "" after join? no: blank kept
        assert got[2] == ("keep me", 1)
        assert got[3] == ("", 1)

    def test_min_df_validated(self, spark):
        import pytest as _pt

        from simpl_schema_spark.dedup import remove_common_lines

        df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        with _pt.raises(ValueError, match="min_df"):
            remove_common_lines(df, min_df=1)

    def test_line_document_frequencies(self, spark):
        from simpl_schema_spark.dedup import line_document_frequencies

        # duplicate line WITHIN one doc counts that doc once
        rows = [(1, "a\na\nb"), (2, "a"), (3, None)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r.line: r.n_docs for r in line_document_frequencies(df).collect()
        }
        assert got == {"a": 2, "b": 1}


class TestEncodingRepair:
    def _fix(self, spark, s):
        from simpl_schema_spark.text import fix_mojibake, strip_control_chars

        df = spark.createDataFrame([(s,)], "t string")
        return df.select(
            strip_control_chars(fix_mojibake(F.col("t"))).alias("f")
        ).collect()[0].f

    def test_punctuation_family(self, spark):
        # explicit escapes: the right-double-quote artifact ends in C1 9D
        raw = (
            'It\u00e2\u20ac\u2122s '
            '\u00e2\u20ac\u0153ok\u00e2\u20ac\u009d '
            '\u00e2\u20ac\u201d fine'
        )
        got = self._fix(spark, raw)
        assert got == 'It\u2019s \u201cok\u201d \u2014 fine'

    def test_accents_and_symbols(self, spark):
        got = self._fix(spark, "CafÃ© Â£5 ÃŸ")
        assert got == "Café £5 ß"

    def test_controls_stripped_but_tabs_newlines_kept(self, spark):
        got = self._fix(spark, "a\x07b\tc\nd\x9fe")
        assert got == "ab\tc\nde"

    def test_clean_text_unchanged(self, spark):
        s = "plain ascii text, nothing to fix."
        assert self._fix(spark, s) == s


def _make_y4m(w=4, h=2, n_frames=3, colorspace=b"C420jpeg", luma=None):
    """Tiny synthetic YUV4MPEG2 stream; frame j's Y plane is filled with
    ``luma[j]`` (default 10*j)."""
    header = b"YUV4MPEG2 W%d H%d F25:1 Ip A1:1 %s\n" % (w, h, colorspace)
    y_size = w * h
    c_size = (w // 2) * (h // 2) if colorspace.startswith(b"C420") else y_size
    out = [header]
    for j in range(n_frames):
        v = (luma[j] if luma else 10 * j) & 0xFF
        out.append(b"FRAME\n")
        out.append(bytes([v]) * y_size)          # Y
        out.append(b"\x80" * (2 * c_size))       # U + V
    return b"".join(out)


class TestY4m:
    def test_parse_header_and_frames(self):
        from simpl_schema_spark.multimodal.y4m import (
            frame_offsets,
            parse_header,
            y_plane,
        )

        b = _make_y4m(w=4, h=2, n_frames=3)
        info = parse_header(b)
        assert (info.width, info.height) == (4, 2)
        assert (info.fps_num, info.fps_den) == (25, 1)
        assert info.colorspace == "420jpeg"
        assert info.frame_size == 8 + 2 * 2
        offs = frame_offsets(b, info)
        assert len(offs) == 3
        assert y_plane(b, info, offs[1]) == bytes([10]) * 8

    def test_malformed_raises(self):
        from simpl_schema_spark.multimodal.y4m import (
            Y4mError,
            frame_offsets,
            parse_header,
        )

        with pytest.raises(Y4mError, match="signature"):
            parse_header(b"RIFFxxxx")
        with pytest.raises(Y4mError, match="W/H"):
            parse_header(b"YUV4MPEG2 F25:1\nFRAME\n")
        b = _make_y4m(n_frames=2)
        info = parse_header(b)
        with pytest.raises(Y4mError, match="truncated"):
            frame_offsets(b[:-3], info)

    def test_colorspace_plane_sizes(self):
        from simpl_schema_spark.multimodal.y4m import parse_header

        for cs, size in [(b"C422", 8 + 2 * 4), (b"C444", 24), (b"Cmono", 8)]:
            info = parse_header(b"YUV4MPEG2 W4 H2 %s\n" % cs)
            assert info.frame_size == size, cs

    def test_real_frame_sampling_in_spark(self, spark):
        from simpl_schema_spark.multimodal import (
            sample_video_frames,
            with_media_meta,
        )

        payload = _make_y4m(w=4, h=2, n_frames=6, luma=[0, 10, 20, 30, 40, 50])
        df = spark.createDataFrame(
            [(1, bytearray(payload))], "id bigint, payload binary"
        )
        meta = with_media_meta(df).collect()[0].media_meta
        assert meta.magic == "y4m" and meta.media_type == "video"
        out = sample_video_frames(df, n_frames=3, use_stub=False).collect()
        # evenly spaced: frames 0, 2, 4 — REAL luma means
        assert [(r.frame_idx, r.mean_luma) for r in out] == [
            (0, 0.0), (2, 20.0), (4, 40.0)
        ]
        # identical luma planes hash identically, distinct ones differ
        again = sample_video_frames(df, n_frames=3, use_stub=False).collect()
        assert [r.frame_hash for r in out] == [r.frame_hash for r in again]
        assert len({r.frame_hash for r in out}) == 3

    def test_compressed_payload_raises(self, spark):
        from simpl_schema_spark.multimodal import sample_video_frames

        df = spark.createDataFrame(
            [(1, bytearray(b"\x1aE\xdf\xa3" + b"x" * 50))],
            "id bigint, payload binary",
        )
        with pytest.raises(Exception, match="ffmpeg"):
            sample_video_frames(df, use_stub=False).collect()


class TestKeepBest:
    def test_max_score_min_id_tiebreak(self, spark):
        df = spark.createDataFrame(
            [
                ("u1", 1, 10),
                ("u1", 2, 30),
                ("u1", 3, 30),   # tie on score -> smaller id (2) wins
                ("u2", 4, 5),
                (None, 5, 99),   # null key dropped
            ],
            "url string, doc_id long, score long",
        )
        got = {
            r.url: (r.keep_id, r.keep_score, r.n_dups)
            for r in keep_best(df, "url", "score", "doc_id").collect()
        }
        assert got == {"u1": (2, 30, 3), "u2": (4, 5, 1)}

    def test_null_scores_lose_to_any_scored_row(self, spark):
        df = spark.createDataFrame(
            [("u", 1, None), ("u", 2, 1), ("v", 3, None)],
            "url string, doc_id long, score long",
        )
        got = {
            r.url: (r.keep_id, r.keep_score, r.n_dups)
            for r in keep_best(df, "url", "score", "doc_id").collect()
        }
        assert got["u"] == (2, 1, 2)
        # all-null group still keeps a deterministic survivor
        assert got["v"] == (3, None, 1)

    def test_single_shuffle_no_window_no_join(self, spark):
        df = spark.createDataFrame(
            [("u", 1, 2)], "url string, doc_id long, score long"
        )
        plan = keep_best(df, "url", "score", "doc_id")._jdf.queryExecution().executedPlan().toString()
        assert "Window" not in plan and "Join" not in plan
        # partial_min proves map-side combine before the exchange
        assert "partial_min" in plan
