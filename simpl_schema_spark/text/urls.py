"""URL normalization / host extraction — web-crawl pipeline primitives.

The north rule's corpus is keyed by url; dedup and per-host skew handling
(salting hot hosts) start from a CANONICAL url.  All pure JVM expressions
(regexp over one column — fuses with the scan, no Python, no shuffle):

- :func:`url_normalize` — lowercase scheme+authority, strip default ports
  (``:80`` for http, ``:443`` for https), drop the fragment, and remove
  tracking query parameters (``utm_*``, ``fbclid``, ``gclid``), fixing up
  ``?``/``&`` separators (a removed leading param promotes the next one).
- :func:`url_host` — the authority's host (no port/userinfo).
- :func:`url_registered_domain` — last two labels of the host (public-
  suffix-list-free approximation: right for .com/.org/…, one label short
  for ccSLDs like .co.uk — documented tradeoff, no external data).

At 100 TB: normalize once at ingest and store the canonical url; url-keyed
dedup (`checks/uniqueness.py`) and host-salted joins then operate on a
stable key.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import Column, functions as F

__all__ = ["url_normalize", "url_host", "url_registered_domain"]

#: query parameters dropped by normalization (tracking only — never
#: content-bearing params)
_TRACKING = r"(utm_[^=&#]*|fbclid|gclid)"


def url_normalize(url: Column) -> Column:
    """Canonical URL: lowercased scheme+authority, default ports stripped,
    fragment dropped, tracking params removed."""
    # 1. drop the fragment
    u = F.regexp_replace(url, "#.*$", "")
    # 2. lowercase scheme://authority (path/query case is significant)
    prefix = F.regexp_extract(u, "^[^/?#]*//[^/?#]*", 0)
    rest = F.substring(u, F.length(prefix) + F.lit(1), F.lit(2147483647))
    p = F.lower(prefix)
    # 3. default ports (scheme-aware: http://x:443 is NOT default)
    p = F.regexp_replace(p, r"^(http://[^/:]*):80$", "$1")
    p = F.regexp_replace(p, r"^(https://[^/:]*):443$", "$1")
    # 4. tracking params: mid-list '&p=v' first, then a leading '?p=v&'
    #    (promote the next param), then a lone '?p=v'
    rest = F.regexp_replace(rest, r"&" + _TRACKING + r"=[^&#]*", "")
    rest = F.regexp_replace(rest, r"\?" + _TRACKING + r"=[^&#]*&", "?")
    rest = F.regexp_replace(rest, r"\?" + _TRACKING + r"=[^&#]*$", "")
    return F.concat(p, rest)


def url_host(url: Column) -> Column:
    """Host of the authority (userinfo and port stripped), lowercased."""
    auth = F.lower(F.regexp_extract(url, "^[^/?#]*//([^/?#]*)", 1))
    no_user = F.regexp_replace(auth, "^.*@", "")
    return F.regexp_replace(no_user, ":.*$", "")


def _last_labels(host: Column, n: int) -> Column:
    """Last ``n`` dot-separated labels of ``host`` ('' when fewer)."""
    return F.regexp_extract(host, r"((?:[^.]+\.){%d}[^.]+)$" % (n - 1), 1)


def url_registered_domain(
    url: Column, public_suffixes: "Iterable[str] | None" = None
) -> Column:
    """Registrable domain of the URL's host.

    Without ``public_suffixes``: the last two host labels — a public-
    suffix-list-free approximation (right for .com/.org/…, one label short
    for ccSLDs like ``foo.co.uk`` → ``co.uk``).

    ``public_suffixes`` accepts a caller-supplied set of MULTI-LABEL
    public suffixes (e.g. ``{"co.uk", "com.au"}`` — or the full PSL, which
    this library deliberately does not vendor); hosts ending in one keep
    one extra label (``foo.co.uk`` → ``foo.co.uk``).  Longest suffix wins.
    Pure expression: the suffix set compiles to an ``isin`` literal list
    per label count — no broadcast join, fuses with the scan.
    """
    host = url_host(url)
    if not public_suffixes:
        return _last_labels(host, 2)
    by_n: dict[int, list[str]] = {}
    for s in public_suffixes:
        by_n.setdefault(s.count(".") + 1, []).append(s.lower())
    expr = None
    for n in sorted(by_n, reverse=True):  # longest suffixes first
        cond = _last_labels(host, n).isin(by_n[n])
        val = _last_labels(host, n + 1)
        expr = F.when(cond, val) if expr is None else expr.when(cond, val)
    return expr.otherwise(_last_labels(host, 2))
