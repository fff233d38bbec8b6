"""Context-length chunking (text/chunking.py)."""

import pytest
from pyspark.sql import functions as F

from simpl_schema_spark.text.chunking import chunk_documents


def _words(n):
    return " ".join(f"w{i}" for i in range(n))


class TestChunkDocuments:
    @pytest.fixture(scope="class")
    def docs(self, spark):
        return spark.createDataFrame(
            [
                (1, _words(10)),   # 3 chunks at max=4: 4+4+2
                (2, _words(4)),    # exactly one full chunk
                (3, "one"),        # single short chunk
                (4, ""),           # no tokens -> nothing
                (5, None),         # null -> nothing
                (6, "  a  b\tc \n d  "),  # messy whitespace, 4 tokens
            ],
            "doc_id long, text string",
        )

    def test_layout(self, spark, docs):
        rows = {
            (r.doc_id, r.chunk_idx): (r.n_tokens, r.chunk_text)
            for r in chunk_documents(docs, max_tokens=4).collect()
        }
        assert rows[(1, 0)] == (4, "w0 w1 w2 w3")
        assert rows[(1, 1)] == (4, "w4 w5 w6 w7")
        assert rows[(1, 2)] == (2, "w8 w9")
        assert rows[(2, 0)] == (4, "w0 w1 w2 w3")
        assert rows[(3, 0)] == (1, "one")
        assert rows[(6, 0)] == (4, "a b c d")
        assert not any(d in (4, 5) for d, _ in rows)

    def test_min_tokens_drops_tail_scraps(self, spark, docs):
        rows = {
            (r.doc_id, r.chunk_idx)
            for r in chunk_documents(
                docs, max_tokens=4, min_tokens=3
            ).collect()
        }
        assert (1, 2) not in rows  # 2-token tail dropped
        assert (1, 0) in rows and (1, 1) in rows
        assert (3, 0) not in rows  # 1-token doc below min

    def test_param_validation(self, spark, docs):
        with pytest.raises(ValueError):
            chunk_documents(docs, max_tokens=0)
        with pytest.raises(ValueError):
            chunk_documents(docs, max_tokens=4, min_tokens=5)

    def test_no_shuffle_plan(self, spark, docs):
        plan = (
            chunk_documents(docs, max_tokens=4)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan  # chunking rides the scan
