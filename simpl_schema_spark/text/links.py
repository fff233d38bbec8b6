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
srcset/meta-refresh targets are out of scope, and query-only references
(``?page=2``) resolve through the path-relative branch
(origin + base directory + link) rather than RFC 3986 §5.3's
keep-full-base-path-replace-query rule — the oracle replays the same
branch, so the deviation is cross-engine-consistent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = [
    "extract_outlinks",
    "resolve_link",
    "host_edges",
    "extract_anchors",
    "anchor_term_profile",
    "host_reciprocity",
]

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


#: a full <a ...href="..."...>INNER</a> element, non-greedy, newline-safe
_ANCHOR_RE = r'(?s)<a\s[^>]*href\s*=\s*"[^"]*"[^>]*>.*?</a>'


def extract_anchors(
    df: DataFrame,
    html_col: str = "html",
    url_col: str = "url",
    *,
    link_col: str = "outlink",
    anchor_col: str = "anchor",
) -> DataFrame:
    """One row per ``<a>`` element: resolved target + visible anchor text.

    Anchor text is the element's inner content with nested tags stripped
    (``<b>``/``<img>``/…), whitespace collapsed, and edges trimmed —
    empty anchors (image-only links) survive as ``''`` so callers can
    measure text-less-link rates.  Same scan-fused shape as
    :func:`extract_outlinks` (regexp_extract_all + per-element
    projection, zero shuffles); rows whose href does not resolve are
    dropped.
    """
    keep = [c for c in df.columns if c != html_col]
    elems = df.select(
        *keep,
        F.explode(
            F.regexp_extract_all(F.col(html_col), F.lit(_ANCHOR_RE), 0)
        ).alias("__a"),
    )
    href = F.regexp_extract(F.col("__a"), r'href\s*=\s*"([^"]*)"', 1)
    inner = F.regexp_replace(F.col("__a"), r"(?s)^<a[^>]*>|</a>$", "")
    text = F.trim(
        F.regexp_replace(
            F.regexp_replace(inner, r"(?s)<[^>]*>", " "), r"\s+", " "
        )
    )
    return (
        elems.select(
            *keep,
            resolve_link(href, F.col(url_col)).alias(link_col),
            text.alias(anchor_col),
        )
        .where(F.col(link_col).isNotNull())
    )


def anchor_term_profile(
    anchors: DataFrame,
    link_col: str = "outlink",
    anchor_col: str = "anchor",
    *,
    k: int = 5,
) -> DataFrame:
    """Top-``k`` incoming anchor terms per TARGET host:
    ``(dst_host, term, n)`` — what the web calls each destination
    (search/quality pipelines use incoming anchor text as an off-page
    relevance signal precisely because the target didn't write it).

    Terms are lowercase whitespace tokens of the anchor text.  One
    map-side-combinable count shuffle, then the repo's two-stage bounded
    top-n (NOT a per-host window: a hub host's term list would funnel
    through one task) ordered by (n desc, term asc) — comparator-based,
    no ANSI-unsafe count negation.  Ties are deterministic.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from .analysis import word_tokens
    from .urls import url_host

    counts = (
        anchors.select(
            url_host(F.col(link_col)).alias("dst_host"),
            F.explode(word_tokens(F.lower(F.col(anchor_col)))).alias("term"),
        )
        .groupBy("dst_host", "term")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    item = F.struct(F.col("n"), F.col("term"))

    def _cmp(a, b):
        return (
            F.when(a["n"] > b["n"], F.lit(-1))
            .when(a["n"] < b["n"], F.lit(1))
            .when(a["term"] < b["term"], F.lit(-1))
            .when(a["term"] > b["term"], F.lit(1))
            .otherwise(F.lit(0))
        )

    partial = counts.groupBy(
        F.col("dst_host"), F.spark_partition_id().alias("__pid")
    ).agg(F.slice(F.array_sort(F.collect_list(item), _cmp), 1, k).alias("__c"))
    merged = partial.groupBy("dst_host").agg(
        F.slice(
            F.array_sort(F.flatten(F.collect_list("__c")), _cmp), 1, k
        ).alias("__top")
    )
    return merged.select("dst_host", F.explode("__top").alias("__e")).select(
        "dst_host", F.col("__e.term").alias("term"), F.col("__e.n").alias("n")
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


def host_reciprocity(
    edges: DataFrame,
    src_col: str = "src_host",
    dst_col: str = "dst_host",
) -> DataFrame:
    """Per-host outlink reciprocity ``(host, n_out, n_reciprocal,
    reciprocity)`` — the classic link-farm / link-exchange signal: an
    organic host's targets rarely all link back, a reciprocal-exchange
    ring's do (reciprocity ≈ 1 at non-trivial out-degree).

    Weights are ignored (existence, not volume): the edge list reduces
    to distinct ordered pairs, reciprocal pairs are found with ONE
    self-join on the reversed key (host-graph-sized, co-partitioned —
    both sides hash the same pair columns), and the per-host rollup is
    a map-side-combinable count.  Nothing corpus-sized.
    """
    e = edges.select(
        F.col(src_col).alias("a"), F.col(dst_col).alias("b")
    ).distinct()
    rev = e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    recip = e.intersect(rev)  # pairs whose reverse also exists
    marked = e.join(
        recip.select("a", "b", F.lit(1).alias("__r")), ["a", "b"], "left"
    )
    return (
        marked.groupBy(F.col("a").alias("host"))
        .agg(
            F.count(F.lit(1)).alias("n_out"),
            F.sum(F.coalesce(F.col("__r"), F.lit(0))).alias("n_reciprocal"),
        )
        .select(
            "host",
            "n_out",
            "n_reciprocal",
            F.round(
                F.col("n_reciprocal") / F.col("n_out").cast("double"), 6
            ).alias("reciprocity"),
        )
    )
