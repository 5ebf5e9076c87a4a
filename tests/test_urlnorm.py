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
