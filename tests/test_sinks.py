"""Partition-layout sink tests (Iceberg spec, parquet fallback)."""

from pyspark.sql import functions as F

from simpl_schema_spark.datagen import generate_documents
from simpl_schema_spark.sinks import with_partition_columns, write_documents


class TestSinks:
    def test_partition_columns(self, spark):
        docs = generate_documents(spark, 200)
        out = with_partition_columns(docs, buckets=8)
        rows = out.select("warc_day", "url_bucket").collect()
        assert all(0 <= r.url_bucket < 8 for r in rows)
        # bucket assignment is deterministic per url
        a = {r.url: r.url_bucket for r in out.select("url", "url_bucket").collect()}
        b = {
            r.url: r.url_bucket
            for r in with_partition_columns(docs, buckets=8)
            .select("url", "url_bucket")
            .collect()
        }
        assert a == b

    def test_parquet_fallback_layout(self, spark, tmp_path):
        docs = generate_documents(spark, 500)
        target = str(tmp_path / "docs_table")
        write_documents(docs, target, buckets=4, use_iceberg=False)
        back = spark.read.parquet(target)
        assert back.count() == 500
        assert {"warc_day", "url_bucket"}.issubset(set(back.columns))
        # partition pruning works: a day filter reads a subset of files
        one_day = back.where(F.col("warc_day") == "2024-01-01")
        plan = one_day._jdf.queryExecution().executedPlan().toString()
        assert one_day.count() > 0
