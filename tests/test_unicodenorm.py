"""Unicode NFC normalization (text/unicodenorm.py): canonical
composition, multi-mark sequences, null preservation, and the
no-shuffle projection shape.  Fixture literals are raw decomposed
sequences; each line's comment states the intended codepoints (verify
with `python -c "print([hex(ord(c)) for c in ...])"` if an editor is
suspected of normalizing the file)."""

from pyspark.sql import functions as F

from simpl_schema_spark.text import nfc_normalize


class TestNfcNormalize:
    def test_composition_and_nulls(self, spark):
        rows = [
            (1, "é"),             # -> U+00E9
            (2, "Å"),             # -> U+00C5
            (3, "ë́"),       # -> U+00EB + U+0301 (acute stays)
            (4, "é"),              # precomposed unchanged
            (5, "ascii stays"),
            (6, None),
        ]
        df = spark.createDataFrame(rows, "i bigint, t string")
        got = {
            r.i: r.n
            for r in df.select(
                "i", nfc_normalize(F.col("t")).alias("n")
            ).collect()
        }
        assert got[1] == "é"
        assert got[2] == "Å"
        assert got[3] == "ë́"
        assert got[4] == "é"
        assert got[5] == "ascii stays"
        assert got[6] is None

    def test_projection_no_shuffle(self, spark):
        df = spark.createDataFrame([("x",)], "t string")
        plan = (
            df.select(nfc_normalize(F.col("t")))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan
        assert "ArrowEvalPython" in plan  # vectorized, not BatchEvalPython
