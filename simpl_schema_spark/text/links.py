"""Outlink extraction and host-graph construction from crawled HTML.

Web-scale pipelines mine the link structure of the crawl for ranking
(PageRank seeds quality filters a la Common Crawl's host-level ranks),
frontier expansion, and spam-cluster detection.  No reference analog (the
reference is a schema validator); these are the graph primitives the north
rule's Common-Crawl-style corpus (url + html columns) needs.

All JVM expressions end-to-end:

- :func:`extract_outlinks` — ``href`` attributes via ``regexp_extract_all``
  (one pass over the html column, fuses with the scan), then per-link
  RFC-3986-style resolution against the page url expressed as a CASE over
  link shapes (absolute / protocol-relative / root-relative / path-relative,
  with javascript:/mailto:/data:/tel:/fragment-only links dropped).
- :func:`host_edges` — aggregate resolved links to a weighted host-level
  edge list ``(src_host, dst_host, n_links)``, self-loops dropped.

Scale shape: extraction + resolution are a scan-fused projection (zero
shuffles); ``host_edges`` is ONE map-side-combinable aggregation keyed by
the host pair.  At 100 TB the host graph is ~10^7 hosts / ~10^9 edges —
small relative to the corpus and the natural input to :mod:`..graph`'s
PageRank.

Deliberate simplifications (documented, not bugs): dot-segments (``../``)
are not collapsed, only double-quoted hrefs are matched (single-quoted and
unquoted attributes are rare in modern HTML and double the regex cost),
and srcset/meta-refresh targets are out of scope.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["extract_outlinks", "resolve_link", "host_edges"]

#: href attribute matcher — double-quoted values on any tag
_HREF_RE = r'href\s*=\s*"([^"]*)"'

#: link schemes that never yield a crawlable http(s) target
_SKIP_RE = r"^(javascript:|mailto:|data:|tel:|ftp:)"


def resolve_link(link: Column, base_url: Column) -> Column:
    """Resolve a raw ``href`` value against ``base_url`` → absolute URL
    (NULL for non-http(s) schemes, fragment-only links, and empties).

    ``base_url`` must itself be absolute (``scheme://host[/path...]``).
    Pure CASE-over-regexp expression; the same logic is replayed by the
    DuckDB oracle, so every branch is cross-engine-pinned.
    """
    # fragments never survive resolution (RFC 3986 §5.3 strips them from
    # the target of a dereference)
    l = F.regexp_replace(link, "#.*$", "")
    base = F.regexp_replace(base_url, "#.*$", "")
    scheme = F.regexp_extract(base, r"^([a-z][a-z0-9+.-]*):", 1)
    authority = F.regexp_extract(base, r"^[a-z][a-z0-9+.-]*://([^/?#]*)", 1)
    origin = F.concat(scheme, F.lit("://"), authority)
    # directory of the base path: strip query, then the last path segment;
    # a base with no path at all resolves relative links from "/"
    base_path = F.regexp_extract(base, r"^[a-z][a-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    base_dir = F.regexp_replace(base_path, r"[^/]*$", "")
    base_dir = F.when(base_dir == "", F.lit("/")).otherwise(base_dir)

    return (
        F.when((l == "") | l.rlike(_SKIP_RE), F.lit(None).cast("string"))
        .when(l.rlike(r"^https?://"), l)
        .when(l.startswith("//"), F.concat(scheme, F.lit(":"), l))
        .when(l.startswith("/"), F.concat(origin, l))
        .when(l.rlike(r"^[a-z][a-z0-9+.-]*:"), F.lit(None).cast("string"))
        .otherwise(F.concat(origin, base_dir, l))
    )


def extract_outlinks(
    df: DataFrame,
    html_col: str = "html",
    url_col: str = "url",
    *,
    out_col: str = "outlink",
) -> DataFrame:
    """Explode each page into one row per resolved outlink.

    Output: the input columns MINUS ``html_col`` (the exploded frame must
    not duplicate the multi-KB html payload per link — at 100 TB that is
    the difference between a link table and a second corpus), PLUS
    ``out_col`` with the absolute target URL.  Pages with no links yield
    no rows.  Duplicate hrefs on one page are preserved (they carry weight
    for :func:`host_edges`).
    """
    html = F.col(html_col)
    raw = F.regexp_extract_all(html, F.lit(_HREF_RE), 1)
    keep = [c for c in df.columns if c != html_col]
    exploded = df.select(*keep, F.explode(raw).alias("__raw_link"))
    resolved = resolve_link(F.col("__raw_link"), F.col(url_col))
    return (
        exploded.select(*keep, resolved.alias(out_col))
        .where(F.col(out_col).isNotNull())
    )


def host_edges(
    links: DataFrame,
    src_url_col: str = "url",
    dst_url_col: str = "outlink",
) -> DataFrame:
    """Weighted host-level edge list ``(src_host, dst_host, n_links)``.

    Self-loops (intra-host navigation — the bulk of raw links) are dropped
    BEFORE the aggregation so the shuffle only moves cross-host edges.
    One map-side-combinable groupBy; host cardinality makes the result
    small enough to feed iterative PageRank directly.
    """
    from .urls import url_host

    s = url_host(F.col(src_url_col))
    d = url_host(F.col(dst_url_col))
    return (
        links.select(s.alias("src_host"), d.alias("dst_host"))
        .where((F.col("src_host") != F.col("dst_host")) & (F.col("dst_host") != ""))
        .groupBy("src_host", "dst_host")
        .agg(F.count(F.lit(1)).alias("n_links"))
    )
