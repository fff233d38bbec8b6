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


def url_registered_domain(url: Column) -> Column:
    """Last two host labels — a public-suffix-free approximation."""
    return F.regexp_extract(url_host(url), r"([^.]+\.[^.]+)$", 1)
