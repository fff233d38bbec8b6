import os

import pytest

os.environ.setdefault("PYARROW_IGNORE_TIMEZONE", "1")


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("simpl-schema-spark-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "4g")
        .getOrCreate()
    )
    yield spark
    spark.stop()


def assert_violations(result_rows, expected):
    """Compare violation (name, type) multisets."""
    got = sorted((r["name"], r["type"]) for r in result_rows)
    want = sorted(expected)
    assert got == want, f"violations mismatch:\n got: {got}\nwant: {want}"
