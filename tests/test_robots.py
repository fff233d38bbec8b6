"""robots.txt parsing + crawl-politeness filtering (text/robots.py).

The parse cases follow the public RFC 9309 examples (longest-match
decision, Allow tie-break, group merging, '*' fallback).
"""

import pytest
from pyspark.sql import functions as F

from simpl_schema_spark.text.robots import (
    _pattern_regex,
    filter_allowed,
    parse_robots_txt,
    robots_rules,
)

BODY = """
# comments are stripped
User-agent: *
Disallow: /private/
Allow: /private/ok

User-agent: examplebot
User-agent: otherbot
Disallow: /only-example/

User-agent: examplebot
Disallow: /merged/
"""


class TestParse:
    def test_star_group(self):
        assert parse_robots_txt(BODY, "randombot") == [
            (False, "/private/"),
            (True, "/private/ok"),
        ]

    def test_specific_agent_beats_star_and_merges(self):
        got = parse_robots_txt(BODY, "ExampleBot/1.0")
        assert got == [(False, "/only-example/"), (False, "/merged/")]

    def test_longest_agent_match_wins(self):
        body = (
            "User-agent: bot\nDisallow: /a\n\n"
            "User-agent: bigbot\nDisallow: /b\n"
        )
        assert parse_robots_txt(body, "bigbot") == [(False, "/b")]
        assert parse_robots_txt(body, "smallbot") == [(False, "/a")]

    def test_empty_disallow_decides_nothing(self):
        assert parse_robots_txt("User-agent: *\nDisallow:\n") == []

    def test_rules_before_any_agent_ignored(self):
        assert parse_robots_txt("Disallow: /x\n") == []

    def test_pattern_regex(self):
        assert _pattern_regex("/a*b$") == "^/a.*b$"
        assert _pattern_regex("/p?x") == r"^/p\?x"


class TestFilterAllowed:
    @pytest.fixture(scope="class")
    def rules(self, spark):
        bodies = spark.createDataFrame(
            [
                (
                    "site-a.com",
                    "User-agent: *\nDisallow: /\nAllow: /public/",
                ),
                (
                    "site-b.com",
                    "User-agent: *\nDisallow: /*.pdf$\nDisallow: /tmp/",
                ),
                ("site-c.com", ""),  # empty robots -> allow all
            ],
            "domain string, robots_txt string",
        )
        return robots_rules(bodies)

    def test_decision_matrix(self, spark, rules):
        urls = spark.createDataFrame(
            [
                (1, "https://site-a.com/public/page"),   # allow beats /
                (2, "https://site-a.com/secret"),        # disallow /
                (3, "https://site-b.com/doc.pdf"),       # $ anchor hits
                (4, "https://site-b.com/doc.pdf.html"),  # $ anchor misses
                (5, "https://site-b.com/tmp/x"),         # prefix
                (6, "https://site-c.com/anything"),      # empty robots
                (7, "https://unknown.org/whatever"),     # no rules row
            ],
            "doc_id long, url string",
        )
        kept = {r.doc_id for r in filter_allowed(urls, rules).collect()}
        assert kept == {1, 4, 6, 7}

    def test_columns_preserved(self, spark, rules):
        urls = spark.createDataFrame(
            [(1, "https://site-c.com/x", "en")],
            "doc_id long, url string, lang string",
        )
        out = filter_allowed(urls, rules)
        assert out.columns == ["doc_id", "url", "lang"]
