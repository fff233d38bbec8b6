"""URL-level filtering and per-domain capping — the crawl-side quality
stage that runs BEFORE any text is parsed.

Web pipelines (CCNet/RefinedWeb lineage) drop documents on URL evidence
alone: blocklisted registrable domains (adult/spam lists), spam keywords
in the URL, pathological shapes (kilobyte-long urls, tracking-parameter
chains, raw-IP hosts), and per-domain volume caps so no single host
dominates the corpus.  Cheap by construction: every predicate here is a
pure column expression over the url string — fuses with the scan and
prunes rows before any text-side shuffle.

Scale shapes:

- keyword/shape predicates: scan-fused expressions, zero shuffle;
- domain blocklist: ``left_anti`` join on the registrable domain — AQE
  broadcasts a small list at runtime, a multi-million-entry list (UT1
  is ~4M domains) stays a hash join; never a literal ``isin`` (a 4M-term
  literal blows up the plan);
- per-domain cap: the two-stage bounded top-n from
  :func:`..sampling.stratified_sample` — NO per-domain window (a
  window over ``partitionBy(domain)`` serializes mega-hosts through one
  task).
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import Column, DataFrame, functions as F

from .urls import url_host, url_registered_domain

__all__ = ["url_shape_features", "filter_urls", "cap_per_domain"]


def url_shape_features(url: Column) -> Column:
    """Struct of URL shape heuristics: ``url_len``, ``path_depth``,
    ``n_params``, ``host_digit_ratio``, ``is_ip_host``."""
    host = url_host(url)
    query = F.regexp_extract(url, r"\?(.*)$", 1)
    return F.struct(
        F.length(url).alias("url_len"),
        F.size(
            F.filter(
                F.split(
                    F.regexp_extract(url, r"^[a-z][a-z0-9+.-]*://[^/?#]*([^?#]*)", 1),
                    "/",
                ),
                lambda s: s != "",
            )
        ).alias("path_depth"),
        F.when(query == "", F.lit(0))
        .otherwise(F.size(F.split(query, "&")))
        .alias("n_params"),
        (
            F.length(F.regexp_replace(host, r"[^0-9]", ""))
            / F.greatest(F.length(host), F.lit(1))
        ).alias("host_digit_ratio"),
        host.rlike(r"^\d{1,3}(\.\d{1,3}){3}(:\d+)?$").alias("is_ip_host"),
    )


def filter_urls(
    df: DataFrame,
    url_col: str = "url",
    *,
    blocked_domains: "DataFrame | None" = None,
    blocked_keywords: "Iterable[str] | None" = None,
    max_len: int = 2048,
    max_params: int = 16,
    drop_ip_hosts: bool = True,
    public_suffixes: "Iterable[str] | None" = None,
) -> DataFrame:
    """Rows whose URL survives every enabled check.

    - ``blocked_domains``: single-column DataFrame of registrable domains
      (lowercase); rows whose :func:`url_registered_domain` matches are
      dropped via ``left_anti`` (AQE broadcasts small lists).
    - ``blocked_keywords``: literal substrings (case-insensitive) of the
      whole URL — compiled into ONE regex alternation, so the scan pays
      a single regex pass regardless of list length.
    - shape limits: total length, query-parameter count, raw-IP hosts.
    """
    url = F.col(url_col)
    feats = url_shape_features(url)
    keep = (feats["url_len"] <= max_len) & (feats["n_params"] <= max_params)
    if drop_ip_hosts:
        keep = keep & ~feats["is_ip_host"]
    if blocked_keywords:
        import re as _re

        alternation = "|".join(
            sorted(_re.escape(k.lower()) for k in blocked_keywords)
        )
        keep = keep & ~F.lower(url).rlike(alternation)
    out = df.where(keep)
    if blocked_domains is not None:
        bcol = blocked_domains.columns[0]
        # stage the domain ONCE: as a bare join-key expression the
        # regex chain would re-evaluate in the exchange hash, the sort,
        # and the join-key comparison (3x per row)
        out = (
            out.withColumn(
                "__dom", url_registered_domain(F.col(url_col), public_suffixes)
            )
            .join(
                blocked_domains.select(
                    F.lower(F.col(bcol)).alias("__blocked_dom")
                ).distinct(),
                F.col("__dom") == F.col("__blocked_dom"),
                "left_anti",
            )
            .drop("__dom")
        )
    return out


def cap_per_domain(
    df: DataFrame,
    url_col: str,
    key_col: str,
    n: int,
    *,
    public_suffixes: "Iterable[str] | None" = None,
) -> DataFrame:
    """At most ``n`` rows per registrable domain, chosen deterministically
    by content-hash order of ``key_col`` (identical selection on re-runs
    and under repartitioning).  Two-stage bounded top-n — per-task state
    is ``n`` rows per (domain, input partition), so a host with 10^9
    pages costs the same as one with ``n``."""
    from ..sampling import stratified_sample

    with_dom = df.withColumn(
        "__domain", url_registered_domain(F.col(url_col), public_suffixes)
    )
    return stratified_sample(with_dom, "__domain", key_col, n).drop("__domain")
