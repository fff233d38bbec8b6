"""URL filtering and per-domain capping (text/urlfilter.py)."""

import pytest
from pyspark.sql import functions as F

from simpl_schema_spark.text import (
    cap_per_domain,
    filter_urls,
    url_shape_features,
)


@pytest.fixture(scope="module")
def urls(spark):
    rows = [
        (1, "https://example.com/articles/science/a1"),
        (2, "http://spam.example.net/buy-now?x=1&y=2"),
        (3, "https://casino-winner.biz/poker"),
        (4, "http://93.184.216.34/raw"),
        (5, "https://ok.org/p?" + "&".join(f"k{i}=v" for i in range(30))),
        (6, "https://fine.co.uk/page"),
        (7, "https://example.com/" + "x" * 3000),
        (8, "https://blocked.io/anything"),
    ]
    return spark.createDataFrame(rows, "doc_id long, url string")


class TestShapeFeatures:
    def test_features(self, spark, urls):
        f = {
            r.doc_id: r.f.asDict()
            for r in urls.select("doc_id", url_shape_features(F.col("url")).alias("f")).collect()
        }
        assert f[1]["path_depth"] == 3 and f[1]["n_params"] == 0
        assert f[2]["n_params"] == 2
        assert f[4]["is_ip_host"] is True
        assert f[5]["n_params"] == 30
        assert f[7]["url_len"] > 2048
        assert f[1]["is_ip_host"] is False
        assert f[4]["host_digit_ratio"] > 0.7


class TestFilterUrls:
    def test_all_checks_compose(self, spark, urls):
        blocked = spark.createDataFrame(
            [("blocked.io",), ("example.net",)], "domain string"
        )
        kept = {
            r.doc_id
            for r in filter_urls(
                urls,
                blocked_domains=blocked,
                blocked_keywords=["casino", "buy-now"],
            ).collect()
        }
        # 2: blocked domain AND keyword; 3: keyword; 4: IP host;
        # 5: too many params; 7: too long; 8: blocked domain
        assert kept == {1, 6}

    def test_no_options_only_shape_checks(self, spark, urls):
        kept = {r.doc_id for r in filter_urls(urls).collect()}
        assert kept == {1, 2, 3, 6, 8}

    def test_keyword_regex_escaping(self, spark):
        # keyword containing regex metacharacters must match literally
        df = spark.createDataFrame(
            [(1, "https://a.com/x?q=1"), (2, "https://a.com/xq1")],
            "doc_id long, url string",
        )
        kept = {
            r.doc_id
            for r in filter_urls(df, blocked_keywords=["x?q=1"]).collect()
        }
        assert kept == {2}

    def test_no_forced_broadcast(self, spark, urls):
        blocked = spark.createDataFrame([("blocked.io",)], "domain string")
        plan = (
            filter_urls(urls, blocked_domains=blocked)
            ._jdf.queryExecution()
            .optimizedPlan()
            .toString()
        )
        assert "ResolvedHint" not in plan


class TestCapPerDomain:
    def test_cap_and_determinism(self, spark):
        rows = [
            (i, f"https://host{i % 3}.example{i % 3}.com/p/{i}")
            for i in range(60)
        ]
        df = spark.createDataFrame(rows, "doc_id long, url string")
        out = cap_per_domain(df, "url", "doc_id", 4)
        got = sorted(r.doc_id for r in out.collect())
        assert len(got) == 12  # 3 domains x 4
        per_dom = (
            cap_per_domain(df.repartition(5), "url", "doc_id", 4)
            .groupBy().count().collect()[0][0]
        )
        assert per_dom == 12
        again = sorted(
            r.doc_id
            for r in cap_per_domain(df.repartition(5), "url", "doc_id", 4).collect()
        )
        assert again == got  # hash-deterministic under repartition

    def test_small_domains_kept_whole(self, spark):
        df = spark.createDataFrame(
            [(1, "https://solo.com/a"), (2, "https://solo.com/b")],
            "doc_id long, url string",
        )
        assert cap_per_domain(df, "url", "doc_id", 5).count() == 2
