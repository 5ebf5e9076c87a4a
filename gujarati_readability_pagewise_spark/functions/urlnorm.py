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

__all__ = ["canonicalize_url", "TRACKING_PREFIXES", "host_block_flags"]

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



def host_block_flags(
    df,
    blocklist,
    host_col: str = "host",
    domain_col: str = "domain",
    max_labels: int = 8,
):
    """Domain-blocklist filtering (the C4/CCNet URL-filter tier): flag
    every row whose host IS a blocked domain or a SUBDOMAIN of one.

    Scale shape — ZERO shuffles: suffix semantics ("a.b.example.com"
    blocked by "example.com") become ``max_labels`` equi broadcast hash
    joins, one per suffix level (level i = the host minus its first i−1
    labels, NULL past the label count, and NULL never matches), all
    fused into the same map stage; ``blocked = any level hit``.  The
    alternatives all break at corpus scale: a LIKE/array_contains join
    plans as BroadcastNestedLoop, a regex alternation rebuilds a
    million-branch automaton per task, and an explode + re-attach
    shuffles the corpus for a 1-bit flag.  The blocklist (lowercased,
    distinct) broadcasts once and is probed ``max_labels`` times.

    ``blocklist``: DataFrame with ``domain_col`` — registrable domains or
    any suffix level to block.  Output: ``df`` + ``blocked`` (0/1).
    Hosts deeper than ``max_labels`` labels match on their first
    ``max_labels`` suffix levels only (raise it for pathological hosts).
    """
    from pyspark.sql import functions as F

    labels = F.split(F.lower(F.col(host_col)), r"\.")
    # distinct guards against duplicate blocklist rows duplicating matched
    # corpus rows through the left joins; localCheckpoint materializes it
    # ONCE so the per-level branches broadcast the same result instead of
    # re-running the dedup shuffle eight times
    bl = (
        blocklist.select(
            F.lower(F.col(domain_col)).alias("_blocked_domain")
        )
        .distinct()
        .localCheckpoint()
    )
    out = df
    hit_cols = []
    for i in range(1, max_labels + 1):
        sfx = F.when(
            F.size(labels) >= i,
            F.array_join(F.slice(labels, i, F.size(labels) - i + 1), "."),
        )  # NULL past the label count: never equal, never matches
        b_i = bl.withColumnRenamed("_blocked_domain", f"_bd_{i}")
        out = out.withColumn(f"_sfx_{i}", sfx).join(
            F.broadcast(b_i), F.col(f"_sfx_{i}") == F.col(f"_bd_{i}"), "left"
        )
        hit_cols.append(F.col(f"_bd_{i}").isNotNull())
    blocked = hit_cols[0]
    for c in hit_cols[1:]:
        blocked = blocked | c
    drop = [f"_sfx_{i}" for i in range(1, max_labels + 1)] + [
        f"_bd_{i}" for i in range(1, max_labels + 1)
    ]
    return out.withColumn("blocked", blocked.cast("int")).drop(*drop)
