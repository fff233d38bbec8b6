"""Exact duplicate-span removal (dedup/spans.py).

Reference semantics: suffix-array exact substring dedup (Lee et al.
2022) re-expressed as hot anchor k-grams; these tests pin the span
algebra (maximal-run merging, within-doc repeats, all-occurrence
removal) and the scale-shape of the plan (no unpartitioned window, no
forced broadcast of the hot set).
"""

import pytest
from pyspark.sql import functions as F

from simpl_schema_spark.dedup import duplicate_spans, remove_duplicate_spans


def _words(prefix, n):
    return " ".join(f"{prefix}{i}" for i in range(n))


SHARED = _words("dup", 12)  # 12-token verbatim passage


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # doc 1 and 2 share SHARED, embedded in distinct prose
        (1, f"{_words('a', 5)} {SHARED} {_words('b', 4)}"),
        (2, f"{_words('c', 6)} {SHARED} {_words('d', 3)}"),
        # doc 3: unique text, longer than k
        (3, _words("u", 20)),
        # doc 4: repeats ITS OWN passage twice (within-doc duplication)
        (4, f"{_words('e', 3)} {SHARED} {_words('f', 3)} {SHARED}"),
        # doc 5: shorter than k, identical to nothing
        (5, "tiny doc"),
        # doc 6: is ENTIRELY the shared passage
        (6, SHARED),
        # doc 7: null text -> excluded
        (7, None),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestDuplicateSpans:
    def test_spans_cover_shared_passage(self, spark, docs):
        spans = {
            (r.doc_id, r.start, r.end)
            for r in duplicate_spans(docs, k=8, min_count=2).collect()
        }
        # doc 1: SHARED occupies tokens 5..16
        assert (1, 5, 16) in spans
        # doc 2: tokens 6..17
        assert (2, 6, 17) in spans
        # doc 6 fully covered
        assert (6, 0, 11) in spans

    def test_within_doc_repeat_yields_two_spans(self, spark, docs):
        got = sorted(
            (r.start, r.end)
            for r in duplicate_spans(docs, k=8, min_count=2)
            .where(F.col("doc_id") == 4)
            .collect()
        )
        # doc 4 layout: e0 e1 e2 | dup0..dup11 (3..14) | f0 f1 f2 | dup0..dup11 (18..29)
        assert got == [(3, 14), (18, 29)]

    def test_unique_and_short_docs_have_no_spans(self, spark, docs):
        ids = {
            r.doc_id
            for r in duplicate_spans(docs, k=8, min_count=2).collect()
        }
        assert 3 not in ids and 5 not in ids and 7 not in ids

    def test_param_validation(self, docs):
        with pytest.raises(ValueError):
            duplicate_spans(docs, k=1)
        with pytest.raises(ValueError):
            remove_duplicate_spans(docs, min_count=1)


class TestRemoveDuplicateSpans:
    @pytest.fixture(scope="class")
    def result(self, spark, docs):
        out = {
            r.doc_id: r
            for r in remove_duplicate_spans(docs, k=8, min_count=2).collect()
        }
        yield out

    def test_shared_passage_removed_everywhere(self, result):
        assert result[1].text_deduped == f"{_words('a', 5)} {_words('b', 4)}"
        assert result[2].text_deduped == f"{_words('c', 6)} {_words('d', 3)}"

    def test_within_doc_occurrences_all_removed(self, result):
        assert result[4].text_deduped == f"{_words('e', 3)} {_words('f', 3)}"
        assert result[4].n_spans == 2
        assert result[4].n_dup_tokens == 24

    def test_untouched_docs_roundtrip(self, result):
        assert result[3].text_deduped == _words("u", 20)
        assert result[3].n_dup_tokens == 0 and result[3].n_spans == 0
        assert result[5].text_deduped == "tiny doc"

    def test_fully_duplicated_doc_becomes_empty(self, result):
        assert result[6].text_deduped == ""
        assert result[6].n_tokens == 12 and result[6].n_dup_tokens == 12

    def test_null_text_excluded(self, result):
        assert 7 not in result

    def test_token_counts(self, result):
        assert result[1].n_tokens == 21
        assert result[1].n_dup_tokens == 12
        assert result[1].n_spans == 1

    def test_whitespace_tokenization(self, spark):
        df = spark.createDataFrame(
            [(1, "  x \t y \n z  "), (2, " x y\tz ")],
            "doc_id long, text string",
        )
        got = {
            r.doc_id: r.text_deduped
            for r in remove_duplicate_spans(df, k=2, min_count=2).collect()
        }
        # both docs are the same 3-token sequence -> fully removed
        assert got == {1: "", 2: ""}


class TestSpanPlanShape:
    def test_no_unpartitioned_window_and_no_forced_broadcast(
        self, spark, docs
    ):
        plan = remove_duplicate_spans(
            docs, k=8, min_count=2
        )._jdf.queryExecution().optimizedPlan().toString()
        # every window partitions by doc_id (no global-order single task)
        for line in plan.splitlines():
            if "windowspecdefinition" in line.lower():
                assert "doc_id" in line
        # the hot set must be AQE-decided, not hint-forced
        assert "ResolvedHint" not in plan
