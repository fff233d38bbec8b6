"""Outlink extraction / URL resolution (text/links.py) and iterative
PageRank (graph.py): resolution branches, host-edge weighting, rank
values against a NumPy power-iteration oracle, dangling mass, and the
partitioned-once edge-table plan shape."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from simpl_schema_spark.graph import pagerank
from simpl_schema_spark.text.links import (
    anchor_term_profile,
    extract_anchors,
    extract_outlinks,
    host_edges,
    resolve_link,
)


def _resolve_one(spark, link, base):
    df = spark.createDataFrame([(link, base)], "l string, b string")
    return df.select(resolve_link(F.col("l"), F.col("b")).alias("r")).first().r


class TestResolveLink:
    BASE = "https://ex.com/a/b/page.html?q=1"

    @pytest.mark.parametrize(
        "link,expected",
        [
            ("https://other.org/x", "https://other.org/x"),
            ("http://other.org/x", "http://other.org/x"),
            ("//cdn.net/lib.js", "https://cdn.net/lib.js"),
            ("/root.html", "https://ex.com/root.html"),
            ("sib.html", "https://ex.com/a/b/sib.html"),
            ("sub/deep.html", "https://ex.com/a/b/sub/deep.html"),
            ("?page=2", "https://ex.com/a/b/?page=2"),
            ("x.html#frag", "https://ex.com/a/b/x.html"),
            ("#top", None),  # fragment-only -> empty after strip
            ("", None),
            ("mailto:a@b.c", None),
            ("javascript:void(0)", None),
            ("tel:+15551234", None),
            ("data:text/plain,x", None),
            ("ftp://files.org/f", None),
            ("magnet:?xt=urn", None),  # unknown scheme dropped
        ],
    )
    def test_branches(self, spark, link, expected):
        assert _resolve_one(spark, link, self.BASE) == expected

    def test_base_without_path(self, spark):
        assert (
            _resolve_one(spark, "p.html", "https://ex.com")
            == "https://ex.com/p.html"
        )

    def test_base_fragment_stripped(self, spark):
        assert (
            _resolve_one(spark, "p.html", "https://ex.com/d/#sec")
            == "https://ex.com/d/p.html"
        )


class TestExtractOutlinks:
    def test_explodes_resolves_and_drops_html(self, spark):
        html = (
            '<a href="/a">A</a> <a href = "b.html">B</a>'
            '<link rel="x" href="//cdn.io/c.css">'
            '<a href="mailto:x@y.z">skip</a><a href="#top">skip</a>'
        )
        df = spark.createDataFrame(
            [(1, "https://h.com/d/p", html), (2, "https://h.com/", "<p>none</p>")],
            "doc_id bigint, url string, html string",
        )
        out = extract_outlinks(df)
        assert out.columns == ["doc_id", "url", "outlink"]
        got = sorted((r.doc_id, r.outlink) for r in out.collect())
        assert got == [
            (1, "https://cdn.io/c.css"),
            (1, "https://h.com/a"),
            (1, "https://h.com/d/b.html"),
        ]

    def test_duplicate_hrefs_preserved(self, spark):
        df = spark.createDataFrame(
            [(1, "https://h.com/", '<a href="/x"></a><a href="/x"></a>')],
            "doc_id bigint, url string, html string",
        )
        assert extract_outlinks(df).count() == 2


class TestExtractAnchors:
    def test_inner_text_and_targets(self, spark):
        html = (
            '<a href="/a"><b>Bold</b> link</a>'
            '<a class="x" href="b.html">plain\n  text</a>'
            '<a href="/img"><img src="i.png"></a>'
            '<a href="mailto:x@y.z">dropped</a>'
        )
        df = spark.createDataFrame(
            [(1, "https://h.com/d/p", html)],
            "doc_id bigint, url string, html string",
        )
        got = sorted(
            (r.outlink, r.anchor)
            for r in extract_anchors(df).collect()
        )
        assert got == [
            ("https://h.com/a", "Bold link"),
            ("https://h.com/d/b.html", "plain text"),
            ("https://h.com/img", ""),  # image-only link survives, empty
        ]


class TestAnchorTermProfile:
    def test_topk_order_and_ties(self, spark):
        rows = [
            ("https://t.com/1", "great site"),
            ("https://t.com/2", "great docs"),
            ("https://t.com/3", "GREAT"),
            ("https://other.io/x", "zzz"),
        ]
        df = spark.createDataFrame(rows, "outlink string, anchor string")
        got = [
            (r.dst_host, r.term, r.n)
            for r in anchor_term_profile(df, k=2)
            .orderBy("dst_host", F.desc("n"), "term")
            .collect()
        ]
        # t.com: great=3 wins; docs/site tie at 1 -> term asc keeps 'docs'
        assert got == [
            ("other.io", "zzz", 1),
            ("t.com", "great", 3),
            ("t.com", "docs", 1),
        ]

    def test_rejects_bad_k(self, spark):
        df = spark.createDataFrame([("https://a.b/c", "x")], "outlink string, anchor string")
        with pytest.raises(ValueError):
            anchor_term_profile(df, k=0)

    def test_no_per_host_window(self, spark):
        df = spark.createDataFrame(
            [("https://a.b/c", "x y")], "outlink string, anchor string"
        )
        plan = (
            anchor_term_profile(df)
            ._jdf.queryExecution()
            .optimizedPlan()
            .toString()
        )
        assert "Window" not in plan, plan


class TestHostEdges:
    def test_weights_and_self_loop_drop(self, spark):
        rows = [
            ("https://a.com/1", "https://b.com/x"),
            ("https://a.com/2", "https://b.com/y"),
            ("https://a.com/1", "https://a.com/self"),  # dropped
            ("https://b.com/1", "https://a.com/z"),
        ]
        df = spark.createDataFrame(rows, "url string, outlink string")
        got = {
            (r.src_host, r.dst_host): r.n_links
            for r in host_edges(df).collect()
        }
        assert got == {("a.com", "b.com"): 2, ("b.com", "a.com"): 1}


def _np_pagerank(edge_w, n_ids, damping, iterations):
    """Dense oracle: edge_w maps (src,dst)->w over ids 0..n_ids-1."""
    out_w = np.zeros(n_ids)
    for (s, _), w in edge_w.items():
        out_w[s] += w
    r = np.full(n_ids, 1.0 / n_ids)
    for _ in range(iterations):
        contrib = np.zeros(n_ids)
        for (s, d), w in edge_w.items():
            contrib[d] += r[s] * w / out_w[s]
        dm = r[out_w == 0].sum()
        r = (1 - damping) / n_ids + damping * (contrib + dm / n_ids)
    return r


class TestPagerank:
    def _run(self, spark, edges, n_ids, iterations=10, weight=None):
        df = spark.createDataFrame(
            edges,
            "src_host bigint, dst_host bigint"
            + (", n_links bigint" if weight else ""),
        )
        got = {
            r.id: r.rank
            for r in pagerank(df, weight=weight, iterations=iterations).collect()
        }
        ew = {}
        for e in edges:
            ew[(e[0], e[1])] = ew.get((e[0], e[1]), 0) + (e[2] if weight else 1)
        want = _np_pagerank(ew, n_ids, 0.85, iterations)
        assert set(got) == set(range(n_ids))
        for i in range(n_ids):
            assert got[i] == pytest.approx(want[i], abs=1e-12), f"id {i}"
        return got

    def test_cycle_is_uniform(self, spark):
        got = self._run(spark, [(0, 1), (1, 2), (2, 0)], 3)
        for v in got.values():
            assert v == pytest.approx(1 / 3, abs=1e-9)

    def test_hub_and_dangling(self, spark):
        # 0->2, 1->2, 2 dangles: 2 accumulates, dangling mass recycles
        got = self._run(spark, [(0, 2), (1, 2)], 3)
        assert got[2] > got[0] == got[1]
        assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)

    def test_weighted_parallel_edges(self, spark):
        # 0 links 3x to 1 and 1x to 2 (parallel rows sum)
        edges = [(0, 1, 2), (0, 1, 1), (0, 2, 1), (1, 0, 1), (2, 0, 1)]
        got = self._run(spark, edges, 3, weight="n_links")
        assert got[1] > got[2]

    def test_checkpoint_path(self, spark):
        # iterations > checkpoint_every exercises the lineage cut
        df = spark.createDataFrame([(0, 1), (1, 0)], "src_host bigint, dst_host bigint")
        out = pagerank(df, iterations=6, checkpoint_every=2)
        assert sum(r.rank for r in out.collect()) == pytest.approx(1.0, abs=1e-9)

    def test_rejects_bad_params(self, spark):
        df = spark.createDataFrame([(0, 1)], "src_host bigint, dst_host bigint")
        with pytest.raises(ValueError):
            pagerank(df, iterations=0)
        with pytest.raises(ValueError):
            pagerank(df, damping=1.0)

    def test_outlinks_query_is_scan_fused(self, spark):
        # extraction + resolution must ride the parquet scan: explode +
        # CASE projection, zero shuffles
        import __spark_entry__ as em

        df = em.queries()["outlinks"](spark, "/root/testdata/sf0.001")
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan

    def test_edge_table_partitioned_once(self, spark):
        # the transition table is repartitioned by src and persisted — the
        # per-iteration plan must reference the InMemoryRelation, not
        # re-shuffle the raw edges
        df = spark.createDataFrame(
            [(0, 1), (1, 2), (2, 0)], "src_host bigint, dst_host bigint"
        )
        out = pagerank(df, iterations=2, checkpoint_every=0)
        plan = out._jdf.queryExecution().optimizedPlan().toString()
        assert "InMemoryRelation" in plan or "LogicalRDD" in plan


def test_bench_lists_cover_queries():
    # every contract query must be in bench.py's run lists — silently
    # unbenchmarked operators drift out of the per-round perf record
    import bench
    import __spark_entry__ as em

    missing = set(em.queries()) - set(bench.HEADLINE + bench.HEADLINE_EXTRA)
    assert not missing, f"queries missing from bench lists: {sorted(missing)}"


class TestHostReciprocity:
    def test_flags_mutual_pairs(self, spark):
        from simpl_schema_spark.text.links import host_reciprocity

        rows = [
            ("farm1", "farm2", 5), ("farm2", "farm1", 9),  # mutual
            ("farm1", "farm3", 1), ("farm3", "farm1", 1),  # mutual
            ("organic", "farm1", 2),                       # one-way
            ("farm1", "elsewhere", 1),                     # one-way
        ]
        df = spark.createDataFrame(
            rows, "src_host string, dst_host string, n_links bigint"
        )
        got = {
            r.host: (r.n_out, r.n_reciprocal, r.reciprocity)
            for r in host_reciprocity(df).collect()
        }
        assert got["farm1"] == (3, 2, pytest.approx(2 / 3, abs=1e-6))
        assert got["farm2"] == (1, 1, 1.0)
        assert got["organic"] == (1, 0, 0.0)

    def test_weights_ignored(self, spark):
        from simpl_schema_spark.text.links import host_reciprocity

        df = spark.createDataFrame(
            [("a", "b", 100), ("a", "b", 1)],
            "src_host string, dst_host string, n_links bigint",
        )
        got = host_reciprocity(df).collect()
        assert len(got) == 1 and got[0].n_out == 1


class TestCrawlDelay:
    def test_group_selection_and_defaults(self, spark):
        from simpl_schema_spark.text import crawl_delays

        bodies = [
            ("a.com", "User-agent: *\nCrawl-delay: 2.5\nDisallow: /x"),
            ("b.com", "User-agent: greedybot\nCrawl-delay: 99\n"
                      "User-agent: *\nCrawl-delay: 1"),
            ("c.com", "User-agent: *\nCrawl-delay: not-a-number"),
            ("d.com", "User-agent: *\nDisallow: /"),
            ("e.com", "User-agent: *\nCrawl-delay: -3"),
        ]
        df = spark.createDataFrame(bodies, "domain string, robots_txt string")
        got = {
            r.domain: r.crawl_delay
            for r in crawl_delays(df, default_delay=0.5).collect()
        }
        assert got["a.com"] == 2.5
        assert got["b.com"] == 1.0      # '*' group, not greedybot's
        assert got["c.com"] == 0.5      # malformed -> default
        assert got["d.com"] == 0.5      # absent -> default
        assert got["e.com"] == 0.5      # negative -> default

    def test_specific_agent_wins(self, spark):
        from simpl_schema_spark.text.robots import parse_crawl_delay

        body = ("User-agent: mybot\nCrawl-delay: 7\n"
                "User-agent: *\nCrawl-delay: 1")
        assert parse_crawl_delay(body, "mybot/2.0") == 7.0
        assert parse_crawl_delay(body, "otherbot") == 1.0
        assert parse_crawl_delay("", "mybot") is None
