"""Generator determinism + the north-rule byte-identity invariant."""

import pytest

from pyspark.sql import functions as F

from simpl_schema_spark.datagen import documents_schema, extract_text, generate_documents
from simpl_schema_spark.pipeline import clean_and_validate
from simpl_schema_spark.validation import with_violations

N = 2000


@pytest.fixture(scope="module")
def docs(spark):
    return generate_documents(spark, N).cache()


class TestGenerator:
    def test_schema_shape(self, docs):
        assert [(f.name, f.dataType.simpleString()) for f in docs.schema.fields] == [
            ("url", "string"),
            ("warc_ts", "timestamp"),
            ("html", "binary"),
            ("text", "string"),
            ("lang", "string"),
        ]

    def test_deterministic(self, spark):
        a = generate_documents(spark, 500).collect()
        b = generate_documents(spark, 500).collect()
        assert a == b

    def test_dirtiness_buckets_exact(self, docs):
        assert docs.where(F.col("text").isNull()).count() == len(
            [i for i in range(N) if i % 97 == 13]
        )
        assert docs.where(F.col("lang").isNull()).count() == len(
            [i for i in range(N) if i % 29 == 11 and i % 23 != 7]
        )

    def test_duplicate_urls_injected(self, docs):
        dup_urls = (
            docs.groupBy("url").count().where(F.col("count") > 1).count()
        )
        expected = len([i for i in range(N) if i % 101 == 42 and i > 0])
        assert dup_urls == expected

    def test_host_skew(self, docs):
        top = (
            docs.select(F.regexp_extract("url", r"https://([^.]+)", 1).alias("h"))
            .groupBy("h")
            .count()
            .orderBy(F.desc("count"))
            .first()
        )
        assert top.h == "host0" and top["count"] > 0.25 * N


class TestByteIdentity:
    def test_extracted_text_byte_identical(self, docs):
        """The BASELINE.json per-row invariant: byte-identical extracted text
        per url (NULL text ⇒ empty extraction)."""
        mismatches = docs.where(
            extract_text(F.col("html")) != F.coalesce(F.col("text"), F.lit(""))
        ).count()
        assert mismatches == 0

    def test_padded_rows_roundtrip_exactly(self, docs):
        padded = docs.where(F.col("text").startswith("   "))
        assert padded.count() > 0
        bad = padded.where(extract_text(F.col("html")) != F.col("text")).count()
        assert bad == 0


class TestFullConstraintSuite:
    def test_validation_over_generated_docs(self, docs):
        out = with_violations(docs, documents_schema())
        total = out.count()
        assert total == N
        by_type = {
            r["type"]: r["cnt"]
            for r in out.select(F.explode("violations").alias("v"))
            .groupBy(F.col("v.type").alias("type"))
            .agg(F.count(F.lit(1)).alias("cnt"))
            .collect()
        }
        # notAllowed: lang='xx' or 'EN' buckets; minDate: warc_ts bucket
        n_bad_lang = len(
            [i for i in range(N) if i % 23 == 7 or (i % 29 != 11 and i % 31 == 30)]
        )
        n_old_ts = len([i for i in range(N) if i % 89 == 88])
        assert by_type.get("notAllowed") == n_bad_lang
        assert by_type.get("minDate") == n_old_ts
        assert "required" not in by_type  # url/warc_ts/html always present

    def test_clean_and_validate_runs(self, docs):
        out = clean_and_validate(docs, documents_schema())
        assert out.count() == N
