"""URL canonicalization: the dedup key normalizer every crawl pipeline runs.

Re-crawls and mirrors produce the same page under many url spellings; exact
dedup and as-of re-crawl diffs need ONE canonical key.  Rules implemented
(each a pure Spark expression — JVM-side, codegen'd, no UDF):

* lowercase scheme and host (path/query stay case-sensitive per RFC 3986);
* drop the fragment (``#...`` never reaches the server);
* drop tracking params (``utm_*``, ``fbclid``, ``gclid``, ``ref``);
* sort the remaining query params (order is almost never semantic);
* drop a trailing ``?`` left by param removal.

The reference has no url handling (its page key is an opaque image name,
``/root/reference/scripts/predict_single_book.py:353-359``); this is the
graft-side requirement of keying a 10^12-row crawl by url.

Everything uses ``regexp_extract`` + array expressions (NOT ``parse_url``)
so the DuckDB oracle can mirror the exact same semantics.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["canonicalize_url", "TRACKING_PREFIXES"]

TRACKING_PREFIXES = ("utm_", "fbclid=", "gclid=", "ref=")

_SCHEME_HOST = r"^([a-zA-Z][a-zA-Z0-9+.-]*)://([^/?#]*)"
_PATH = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)"
# the '?' must occur BEFORE any '#': a '?' inside the fragment is fragment
# content, not a query string
_QUERY = r"^[^#]*\?([^#]*)"


def canonicalize_url(url: Column) -> Column:
    """Canonical form of an absolute url; non-absolute / malformed inputs
    (no ``scheme://host``) pass through unchanged rather than collapsing
    to a shared degenerate key."""
    from functools import reduce

    scheme = F.lower(F.regexp_extract(url, _SCHEME_HOST, 1))
    host = F.lower(F.regexp_extract(url, _SCHEME_HOST, 2))
    path = F.regexp_extract(url, _PATH, 1)
    q = F.regexp_extract(url, _QUERY, 1)
    params = F.filter(
        F.split(q, "&"),
        lambda p: reduce(
            lambda acc, pref: acc & ~p.startswith(pref),
            TRACKING_PREFIXES,
            F.length(p) > 0,
        ),
    )
    canon_q = F.array_join(F.array_sort(params), "&")
    canon = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(canon_q == "", F.lit("")).otherwise(F.concat(F.lit("?"), canon_q)),
    )
    return F.when(host == "", url).otherwise(canon)
