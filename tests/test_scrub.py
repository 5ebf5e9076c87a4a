"""PII scrubbing: boundary cases + Spark<->DuckDB regex dialect parity."""

import duckdb
import pytest
from pyspark.sql import functions as F

from gujarati_readability_pagewise_spark.functions.scrub import (
    EMAIL_RE,
    IPV4_RE,
    PHONE_RE,
    scrub_documents,
    scrub_pii,
)

CASES = [
    "contact me at bob.smith+x@mail-site.co.uk or 192.168.1.254 thanks",
    "call +44 20 7946 0958 now",
    "v1.2.3.4 release notes",  # version string: no \\b before the 1 -> kept
    "price 10.5 and a@b.io plus 10.0.0.1:8080",
    "digits 1234567890123 in a row",  # long digit run -> phone-like
    "no pii here at all",
    "",
    "double a@b.co c@d.org and 8.8.8.8 1.1.1.1",
]


def test_scrub_redacts_and_counts(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CASES)], "doc_id int, text string"
    )
    out = {r["doc_id"]: r for r in scrub_documents(df).collect()}
    assert (out[0]["n_emails"], out[0]["n_ips"], out[0]["n_phones"]) == (1, 1, 0)
    assert (out[1]["n_phones"], out[2]["n_ips"]) == (1, 0)  # version kept
    # adjacent IPs separated by ONE delimiter: the first match consumes it,
    # so one pass redacts only the first (documented; identical in both
    # engines) — a second pass reaches the fixpoint
    assert (out[7]["n_emails"], out[7]["n_ips"]) == (2, 1)
    scrubbed = {
        r["doc_id"]: r["s"]
        for r in df.select("doc_id", scrub_pii(F.col("text")).alias("s")).collect()
    }
    assert scrubbed[0] == "contact me at <EMAIL> or <IP> thanks"
    assert scrubbed[2] == "v1.2.3.4 release notes"
    assert scrubbed[7] == "double <EMAIL> <EMAIL> and <IP> 1.1.1.1"
    twice = {
        r["doc_id"]: r["s"]
        for r in df.select(
            "doc_id", scrub_pii(scrub_pii(F.col("text"))).alias("s")
        ).collect()
    }
    assert twice[7] == "double <EMAIL> <EMAIL> and <IP> <IP>"


def test_scrub_dialect_parity_with_duckdb(spark):
    """Every pattern must behave identically under Java regex and RE2 —
    the property the oracle depends on."""
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CASES)], "doc_id int, text string"
    )
    got = {
        r["doc_id"]: (r["n_emails"], r["n_ips"], r["n_phones"], r["s"])
        for r in df.select(
            "doc_id",
            F.regexp_count("text", F.lit(EMAIL_RE)).alias("n_emails"),
            F.regexp_count("text", F.lit(IPV4_RE)).alias("n_ips"),
            F.regexp_count("text", F.lit(PHONE_RE)).alias("n_phones"),
            scrub_pii(F.col("text")).alias("s"),
        ).collect()
    }
    con = duckdb.connect()
    for i, t in enumerate(CASES):
        want = con.execute(
            "SELECT len(regexp_extract_all(?, ?)), len(regexp_extract_all(?, ?)),"
            " len(regexp_extract_all(?, ?)),"
            " regexp_replace(regexp_replace(regexp_replace(?, ?, '<EMAIL>', 'g'),"
            " ?, '\\1<IP>\\4', 'g'), ?, '<PHONE>', 'g')",
            [t, EMAIL_RE, t, IPV4_RE, t, PHONE_RE, t, EMAIL_RE, IPV4_RE, PHONE_RE],
        ).fetchone()
        assert got[i] == want, (i, got[i], want)


def test_scrub_dialect_parity_randomized(spark):
    """300 seeded random strings (unicode mixed with pii-ish fragments)
    must scrub identically under Java regex and RE2 — hardens the oracle
    against dialect surprises beyond the hand-picked cases."""
    import random

    rng = random.Random(99)
    frags = [
        "a@b.io", "x.y@z-w.museum", "@", ".", "-", "+", " ", "..",
        "1.2.3.4", "999.999.999.999", "10.0.0.", "0.0.0.0 ",
        "+1 23", "12345678", "555 010 1234", "12 34 56 78 90",
        "ગુજરાતી", "देवनागरी", " ", "\t", "e@", "@e", "a@@b.cc",
        "word", "WORD", "%+-", "_%", "1.2", "v1.2.3.4x",
    ]
    texts = []
    for _ in range(300):
        n = rng.randint(0, 12)
        texts.append("".join(rng.choice(frags) for _ in range(n)))
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    got = {
        r["doc_id"]: (r["n_emails"], r["n_ips"], r["n_phones"], r["s"])
        for r in df.select(
            "doc_id",
            F.regexp_count("text", F.lit(EMAIL_RE)).alias("n_emails"),
            F.regexp_count("text", F.lit(IPV4_RE)).alias("n_ips"),
            F.regexp_count("text", F.lit(PHONE_RE)).alias("n_phones"),
            scrub_pii(F.col("text")).alias("s"),
        ).collect()
    }
    con = duckdb.connect()
    for i, t in enumerate(texts):
        want = con.execute(
            "SELECT len(regexp_extract_all(?, ?)), len(regexp_extract_all(?, ?)),"
            " len(regexp_extract_all(?, ?)),"
            " regexp_replace(regexp_replace(regexp_replace(?, ?, '<EMAIL>', 'g'),"
            " ?, '\\1<IP>\\4', 'g'), ?, '<PHONE>', 'g')",
            [t, EMAIL_RE, t, IPV4_RE, t, PHONE_RE, t, EMAIL_RE, IPV4_RE, PHONE_RE],
        ).fetchone()
        assert got[i] == want, (i, repr(t), got[i], want)


def test_scrub_fixpoint_and_ipv6(spark):
    """fixpoint=True closes the adjacent-IP gap in one call; ipv6=True
    redacts full, compressed, and leading-:: IPv6 forms while leaving
    times and version strings alone."""
    cases = [
        (0, "pair 10.0.0.1,10.0.0.2 done"),
        (1, "v6 full 2001:0db8:85a3:0000:0000:8a2e:0370:7334 ok"),
        (2, "v6 short fe80::1 and ::1 here"),
        (3, "meeting at 12:30 version v1.2.3.4x untouched"),
        (4, "mixed a@b.co fe80::abcd 10.1.2.3,10.1.2.4 +1 555 010 1234"),
    ]
    df = spark.createDataFrame(cases, "doc_id int, text string")
    out = {
        r["doc_id"]: r["s"]
        for r in df.select(
            "doc_id",
            scrub_pii(F.col("text"), fixpoint=True, ipv6=True).alias("s"),
        ).collect()
    }
    assert out[0] == "pair <IP>,<IP> done"
    assert out[1] == "v6 full <IPV6> ok"
    assert out[2] == "v6 short <IPV6> and <IPV6> here"
    assert out[3] == "meeting at 12:30 version v1.2.3.4x untouched"
    assert out[4] == "mixed <EMAIL> <IPV6> <IP>,<IP> <PHONE>"


def test_scrub_ipv6_dialect_parity_randomized(spark):
    """Seeded random ipv6-ish fragments must scrub identically under Java
    regex and RE2 (the property the fixpoint oracle depends on)."""
    import random

    from gujarati_readability_pagewise_spark.functions.scrub import IPV6_RE

    rng = random.Random(4242)
    frags = [
        "fe80::1", "::1", "2001:db8::ff00:42:8329", "::", ":::", "a:b",
        "1:2:3:4:5:6:7:8", "12:30", "x:y::z", "G:H::1", "fe80::", " ",
        ",", ".", "deadbeef::cafe", "0:0:0:0:0:0:0:1", "::ffff:1.2.3.4",
        "word", "ગુજરાતી", "a1b2::c3d4", "1::", "::g", "abcd:ef01:",
    ]
    texts = []
    for _ in range(300):
        n = rng.randint(0, 8)
        texts.append("".join(rng.choice(frags) for _ in range(n)))
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    got = {
        r["doc_id"]: (r["n"], r["s"])
        for r in df.select(
            "doc_id",
            F.regexp_count("text", F.lit(IPV6_RE)).alias("n"),
            F.regexp_replace("text", IPV6_RE, "$1<IPV6>$3").alias("s"),
        ).collect()
    }
    con = duckdb.connect()
    for i, t in enumerate(texts):
        want = con.execute(
            "SELECT len(regexp_extract_all(?, ?)),"
            " regexp_replace(?, ?, '\\1<IPV6>\\3', 'g')",
            [t, IPV6_RE, t, IPV6_RE],
        ).fetchone()
        assert got[i] == want, (i, repr(t), got[i], want)
