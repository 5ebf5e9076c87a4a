"""Robots-compliance filtering: disallow-prefix rules applied to a fetch
frontier.

Every polite crawler filters its frontier against the host's robots
rules before scheduling (the compliance tier next to the per-host rate
limiter in operators/sampling.crawl_schedule).  The graft implements the
PREFIX-RULE core — ``Disallow: <path-prefix>`` lines extracted per host
and applied as a starts-with test against each fetch path — with two
documented simplifications kept deliberately SQL-expressible so the
cross-engine gate can verify the whole chain: user-agent groups are not
distinguished (every Disallow line applies), and Allow/wildcard
precedence (RFC 9309 longest-match) is out of scope.  A production
deployment swaps :func:`parse_robots_rules` for a full RFC parser and
keeps :func:`robots_allowed` unchanged.

Scale shape: rules aggregate to ONE row per host (array of prefixes —
bounded by the robots file, not the corpus), the frontier joins that
table on the host equi-key, and the prefix test is a higher-order
``exists`` over the host's own rule array — never a LIKE join (nested
loop) and never a regex alternation automaton per task.  A hot host's
many frontier rows replicate only its single rule row through the join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["parse_robots_rules", "robots_allowed"]

_DISALLOW_RE = r"Disallow:\s*(/\S*)"


def parse_robots_rules(
    robots: DataFrame, host_col: str = "host", text_col: str = "robots_txt"
) -> DataFrame:
    """(host, robots_txt) → one row per host: (host, disallow_prefixes).

    Prefix list order follows document order (``regexp_extract_all``);
    duplicates are kept — ``exists`` semantics make them harmless, and
    deduping would need a per-host sort the filter never requires.
    Hosts whose robots text has no Disallow lines get an empty array
    (everything allowed), matching a missing robots file.
    """
    # function API, not F.expr: a SQL string literal would eat the regex
    # backslashes ('\\s' -> 's') unless double-escaped
    return robots.select(
        F.col(host_col).alias("host"),
        F.regexp_extract_all(
            F.col(text_col), F.lit(_DISALLOW_RE), 1
        ).alias("disallow_prefixes"),
    )


def robots_allowed(
    fetches: DataFrame,
    rules: DataFrame,
    host_col: str = "host",
    path_col: str = "path",
) -> DataFrame:
    """Flag every frontier row: ``allowed = no disallow prefix matches``.

    ``rules`` is :func:`parse_robots_rules` output (or any
    (host, disallow_prefixes array) table).  Hosts absent from ``rules``
    are fully allowed (left join, empty-array coalesce).  Output:
    ``fetches`` + ``allowed`` (0/1).
    """
    r = rules.select(
        F.col("host").alias("_rh"), F.col("disallow_prefixes").alias("_dp")
    )
    joined = fetches.join(r, fetches[host_col] == r["_rh"], "left")
    blocked = F.exists(
        F.coalesce(F.col("_dp"), F.array().cast("array<string>")),
        lambda p: F.col(path_col).startswith(p),
    )
    return joined.withColumn(
        "allowed", (~blocked).cast("int")
    ).drop("_rh", "_dp")
