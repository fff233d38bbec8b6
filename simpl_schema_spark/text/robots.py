"""robots.txt crawl-politeness filtering — RFC 9309 from scratch.

A crawl-derived corpus should be filterable by the robots policies the
pages were crawled under (retroactive takedowns, politeness audits).
This module implements the public RFC 9309 semantics with no parser
dependency:

- group selection: the group(s) whose ``User-agent`` line is the
  LONGEST match for the product token, else the ``*`` groups; multiple
  user-agent lines stack onto the following rule block;
- rules: ``Allow`` / ``Disallow`` path patterns with ``*`` wildcards
  and the ``$`` end anchor;
- decision: the matching rule with the LONGEST pattern wins; ``Allow``
  wins ties; no matching rule (or no rules for the domain) = allowed;
  empty-pattern Disallow = allowed (RFC 9309 §2.2.3).

Scale shape: bodies parse once per DOMAIN (an Arrow ``mapInPandas``
batch pass over the robots corpus — domain-cardinality, not
page-cardinality); each pattern compiles to a Java regex AT PARSE TIME;
the per-domain rule arrays join onto the page table (AQE-decided — a
robots table is domain-sized and usually broadcasts) and the match is a
pure higher-order-function pass over each url's path.
"""

from __future__ import annotations

import re
from typing import Iterator, List, Tuple

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

from .urls import url_host

__all__ = [
    "parse_robots_txt",
    "robots_rules",
    "filter_allowed",
    "parse_crawl_delay",
    "crawl_delays",
]

#: rules per domain cap — a hostile robots.txt must not blow up the plan
_MAX_RULES = 500


def _pattern_regex(pattern: str) -> str:
    """Java/RE2-safe regex for an RFC 9309 path pattern (anchored at the
    path start; ``*`` spans any run; trailing ``$`` anchors the end)."""
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    parts = [re.escape(p) for p in body.split("*")]
    return "^" + ".*".join(parts) + ("$" if anchored else "")


def parse_robots_txt(
    body: str, user_agent: str = "*"
) -> List[Tuple[bool, str]]:
    """Ordered ``(allow, pattern)`` rules of the group governing
    ``user_agent`` (RFC 9309 group selection; case-insensitive field
    names; ``#`` comments stripped; unknown fields ignored)."""
    ua = user_agent.lower()
    groups: list[tuple[list[str], list[tuple[bool, str]]]] = []
    agents: list[str] = []
    rules: list[tuple[bool, str]] = []
    in_group_header = True
    for raw in body.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if not in_group_header:
                groups.append((agents, rules))
                agents, rules = [], []
            agents.append(value.lower())
            in_group_header = True
        elif field in ("allow", "disallow"):
            if agents:
                rules.append((field == "allow", value))
                in_group_header = False
        # crawl-delay / sitemap / unknown fields: ignored per RFC
    if agents:
        groups.append((agents, rules))
    # groups for the same agent merge (RFC 9309 §2.2.1); the longest
    # matching user-agent token wins; '*' is the fallback
    by_agent: dict[str, list[tuple[bool, str]]] = {}
    for gagents, grules in groups:
        for a in gagents:
            by_agent.setdefault(a, []).extend(grules)
    specific = [a for a in by_agent if a != "*" and a and a in ua]
    if specific:
        chosen = by_agent[max(specific, key=len)]
    else:
        chosen = by_agent.get("*", [])
    # empty-pattern rules decide nothing (empty Disallow = allow all)
    return [(al, p) for al, p in chosen if p][:_MAX_RULES]


def robots_rules(
    df: DataFrame,
    domain_col: str = "domain",
    body_col: str = "robots_txt",
    *,
    user_agent: str = "*",
) -> DataFrame:
    """Per-domain rule table
    ``(domain, rules: array<struct<allow, plen, regex>>)`` — patterns
    pre-compiled to Java regexes at parse time, one Arrow batch pass
    over the (domain-cardinality) robots corpus."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            doms, rule_lists = [], []
            for dom, body in zip(pdf[domain_col], pdf[body_col]):
                parsed = parse_robots_txt(body or "", user_agent)
                doms.append(dom)
                rule_lists.append(
                    [
                        {
                            "allow": al,
                            "plen": len(p),
                            "regex": _pattern_regex(p),
                        }
                        for al, p in parsed
                    ]
                )
            yield pd.DataFrame(
                {"domain": doms, "rules": pd.Series(rule_lists, dtype=object)}
            )

    return df.select(domain_col, body_col).mapInPandas(
        batches,
        schema=(
            "domain string, "
            "rules array<struct<allow:boolean,plen:int,regex:string>>"
        ),
    )


def _url_path(url: Column) -> Column:
    """Path component ('/' when empty) — the string robots rules match."""
    p = F.regexp_extract(url, r"^[a-z][a-z0-9+.-]*://[^/?#]*([^#]*)", 1)
    return F.when(p == "", F.lit("/")).otherwise(p)


def filter_allowed(
    df: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
    *,
    host_to_domain=None,
) -> DataFrame:
    """Rows whose URL the domain's robots rules allow (longest matching
    pattern wins, Allow wins ties, unknown domains allowed).

    ``rules`` comes from :func:`robots_rules`; the join key is the url
    HOST by default (pass ``host_to_domain`` to map hosts to the
    registrable domain the rules were fetched for).
    """
    host = url_host(F.col(url_col))
    key = host_to_domain(host) if host_to_domain else host
    joined = df.withColumn("__rkey", key).join(
        rules.select(
            F.col("domain").alias("__rdom"), F.col("rules").alias("__rules")
        ),
        F.col("__rkey") == F.col("__rdom"),
        "left",
    )
    path = _url_path(F.col(url_col))
    matched = F.filter(
        F.col("__rules"), lambda r: F.regexp_like(path, r["regex"])
    )
    # longest pattern wins; allow wins ties -> max over (plen, allow)
    best = F.array_max(
        F.transform(
            matched,
            lambda r: F.struct(
                r["plen"].alias("plen"), r["allow"].alias("allow")
            ),
        )
    )
    verdict = F.when(
        F.col("__rules").isNull() | (F.size(matched) == 0), F.lit(True)
    ).otherwise(best["allow"])
    return joined.where(verdict).drop("__rkey", "__rdom", "__rules")


def parse_crawl_delay(body: str, user_agent: str = "*") -> "float | None":
    """``Crawl-delay`` (seconds) of the group governing ``user_agent``
    — the de-facto extension most crawlers honor (not in RFC 9309, so
    :func:`parse_robots_txt` ignores it; politeness schedulers want it).
    Group selection mirrors :func:`parse_robots_txt`: longest matching
    specific agent token wins, '*' is the fallback; the group's LAST
    valid delay applies; malformed/negative values are ignored."""
    ua = user_agent.lower()
    agents: list = []
    in_group_header = True
    by_agent: dict = {}
    for raw in body.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if not in_group_header:
                agents = []
            agents.append(value.lower())
            in_group_header = True
        elif field in ("allow", "disallow"):
            in_group_header = False
        elif field == "crawl-delay" and agents:
            in_group_header = False
            try:
                d = float(value)
            except ValueError:
                continue
            if d >= 0:
                for a in agents:
                    by_agent[a] = d
    specific = [a for a in by_agent if a != "*" and a and a in ua]
    if specific:
        return by_agent[max(specific, key=len)]
    return by_agent.get("*")


def crawl_delays(
    df: DataFrame,
    domain_col: str = "domain",
    body_col: str = "robots_txt",
    *,
    user_agent: str = "*",
    default_delay: float = 0.0,
) -> DataFrame:
    """Per-domain politeness delay table ``(domain, crawl_delay)`` —
    the scheduling input next to :func:`robots_rules`' allow/deny.
    Same Arrow-batch pass over the domain-cardinality robots corpus;
    domains without a usable Crawl-delay get ``default_delay``."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            delays = [
                (
                    d
                    if (d := parse_crawl_delay(body or "", user_agent))
                    is not None
                    else default_delay
                )
                for body in pdf[body_col]
            ]
            yield pd.DataFrame(
                {"domain": pdf[domain_col], "crawl_delay": delays}
            )

    return df.select(domain_col, body_col).mapInPandas(
        batches, schema="domain string, crawl_delay double"
    )
