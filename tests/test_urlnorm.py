"""URL canonicalization edge cases (fragment '?', schemeless passthrough)."""

import pandas as pd
from pyspark.sql import functions as F

from gujarati_readability_pagewise_spark.functions.urlnorm import canonicalize_url


def _canon(spark, urls):
    df = spark.createDataFrame(pd.DataFrame({"url": urls}))
    return [
        r["c"] for r in df.select(canonicalize_url(F.col("url")).alias("c")).collect()
    ]


def test_basic_rules(spark):
    got = _canon(
        spark,
        ["HTTPS://WWW.Site.COM/Path/X?utm_source=a&b=2&a=1&ref=t&gclid=g#frag"],
    )
    assert got == ["https://www.site.com/Path/X?a=1&b=2"]


def test_question_mark_inside_fragment_is_not_a_query(spark):
    # hash-routed SPA urls: '?' after '#' is fragment content, NOT a query
    got = _canon(
        spark,
        ["http://site.com/#/page?id=1", "http://site.com/#/other?id=1"],
    )
    assert got == ["http://site.com/", "http://site.com/"]
    # and a real query before the fragment still survives
    assert _canon(spark, ["http://site.com/p?id=1#x?y=2"]) == ["http://site.com/p?id=1"]


def test_schemeless_urls_pass_through_unchanged(spark):
    urls = ["example.com/a?x=1", "other.org/b?x=1", "not a url at all"]
    assert _canon(spark, urls) == urls  # no shared degenerate key


def test_query_only_tracking_params_drops_question_mark(spark):
    assert _canon(spark, ["https://h.com/p?utm_x=1&gclid=2"]) == ["https://h.com/p"]


def test_langid_quality_dialect_parity_randomized(spark):
    """The lang-id / quality regex fragments are load-bearing in four
    oracles (corpus_curation, curation_funnel, streaming_curation,
    quality_weighted_sample): 300 seeded random mixed-script strings must
    produce identical lang_pred and floor(q*1e6) under Spark (Java regex)
    and DuckDB (RE2)."""
    import random

    import duckdb
    from pyspark.sql import functions as F

    from gujarati_readability_pagewise_spark.functions.textstats import (
        lang_id_expr,
        quality_score_expr,
    )

    rng = random.Random(1234)
    frags = [
        "ગુજરાતી લખાણ અહીં", "देवनागरी पाठ", "plain english words",
        "1234567890", "!!!???***", "    ", "a", "ં", "ઁ", "ॿ", "૿",
        "mixed ગુજરાતી and english", "।॥", "e@x.io", "[-`{~",
        "ABCxyz", "\t\n", "٠١٢", "中文字符", "ß", "İstanbul",
    ]
    texts = []
    for _ in range(300):
        n = rng.randint(0, 10)
        texts.append("".join(rng.choice(frags) for _ in range(n)))
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i int, text string"
    )
    got = {
        r["i"]: (r["lang"], r["qfp"])
        for r in df.select(
            "i",
            lang_id_expr(F.col("text")).alias("lang"),
            F.floor(quality_score_expr(F.col("text")) * 1000000)
            .cast("long")
            .alias("qfp"),
        ).collect()
    }
    con = duckdb.connect()
    sql = """
        SELECT CASE
                 WHEN (length(?) - length(regexp_replace(?, '[઀-૿]', '', 'g')))::DOUBLE
                      / greatest(length(?), 1) > 0.3 THEN 'gu'
                 WHEN (length(?) - length(regexp_replace(?, '[ऀ-ॿ]', '', 'g')))::DOUBLE
                      / greatest(length(?), 1) > 0.3 THEN 'hi'
                 WHEN (length(?) - length(regexp_replace(?, '[A-Za-z]', '', 'g')))::DOUBLE
                      / greatest(length(?), 1) > 0.4 THEN 'en'
                 ELSE 'und' END,
               CAST(floor(least(greatest(
                 0.4 * (CASE WHEN length(?) BETWEEN 100 AND 20000 THEN 1.0
                             WHEN length(?) >= 20 THEN 0.5 ELSE 0.0 END)
                 + 0.4 * ((length(?) - length(regexp_replace(?,
                        '[A-Za-z઀-૿ऀ-ॿ]', '', 'g')))::DOUBLE / greatest(length(?), 1))
                 - 0.2 * ((length(?) - length(regexp_replace(?,
                        '[0-9!-/:-@\\[-`{-~]', '', 'g')))::DOUBLE / greatest(length(?), 1))
                 + 0.2, 0.0), 1.0) * 1000000) AS BIGINT)
    """
    for i, t in enumerate(texts):
        want = con.execute(sql, [t] * 17).fetchone()
        assert got[i] == want, (i, repr(t), got[i], want)


def test_host_block_flags_suffix_semantics(spark):
    """Blocklist flags must cover exact hosts, subdomains at any depth,
    case-insensitive matching, and must NOT duplicate rows when the
    blocklist itself contains duplicates or a host matches at several
    suffix levels."""
    from gujarati_readability_pagewise_spark.functions.urlnorm import (
        host_block_flags,
    )

    rows = [
        (1, "example.org"),            # exact apex
        (2, "a.b.c.d.example.org"),    # deep subdomain
        (3, "WWW.Blocked.COM"),        # case-insensitive
        (4, "notexample.org"),         # suffix must align on label boundary
        (5, "example.org.evil.net"),   # blocked domain as PREFIX: not blocked
        (6, "blocked.com"),            # matches two blocklist rows (dup + apex)
        (7, "fine.example.net"),
        (8, None),                     # NULL host: never matches, blocked 0
    ]
    df = spark.createDataFrame(rows, "doc_id long, host string")
    bl = spark.createDataFrame(
        [("example.org",), ("blocked.com",), ("Blocked.Com",), ("blocked.com",)],
        "domain string",
    )
    out = {r["doc_id"]: r["blocked"] for r in host_block_flags(df, bl).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 0, 5: 0, 6: 1, 7: 0, 8: 0}
    assert host_block_flags(df, bl).count() == len(rows)  # no row duplication


def test_robots_rules_and_prefix_filter(spark):
    """parse_robots_rules extracts every Disallow prefix (simplified
    grammar: user-agent groups not distinguished); robots_allowed applies
    STRING-prefix semantics (Disallow /tmp blocks /tmpfile, per RFC 9309
    path matching) and fully allows ruleless or unknown hosts."""
    from gujarati_readability_pagewise_spark.functions.robots import (
        parse_robots_rules,
        robots_allowed,
    )

    robots = spark.createDataFrame(
        [
            ("h0", "User-agent: *\nDisallow: /private\nDisallow: /tmp\n"),
            ("h1", "User-agent: *\nAllow: /\n"),
            ("h2", "Disallow: /secret/area\n# comment\n"),
        ],
        "host string, robots_txt string",
    )
    rules = {r["host"]: r["disallow_prefixes"]
             for r in parse_robots_rules(robots).collect()}
    assert rules == {
        "h0": ["/private", "/tmp"], "h1": [], "h2": ["/secret/area"],
    }
    fetches = spark.createDataFrame(
        [
            ("h0", "/private/p1"), ("h0", "/pub/p2"), ("h0", "/tmpfile"),
            ("h1", "/private/p3"), ("h2", "/secret/area/x"),
            ("h2", "/secret/are"), ("h9", "/anything"),
        ],
        "host string, path string",
    )
    out = {
        (r["host"], r["path"]): r["allowed"]
        for r in robots_allowed(fetches, parse_robots_rules(robots)).collect()
    }
    assert out == {
        ("h0", "/private/p1"): 0, ("h0", "/pub/p2"): 1, ("h0", "/tmpfile"): 0,
        ("h1", "/private/p3"): 1, ("h2", "/secret/area/x"): 0,
        ("h2", "/secret/are"): 1, ("h9", "/anything"): 1,
    }
