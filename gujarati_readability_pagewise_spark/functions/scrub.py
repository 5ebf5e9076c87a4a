r"""PII scrubbing for training corpora: email / IPv4 / phone redaction.

Public-pipeline counterpart: corpus curation recipes (C4's blocklist
filtering, CCNet/The Pile cleanup steps, and the redaction passes in
open dataset toolkits) remove or mask personally identifying strings
before training.  This module implements the standard regex tier —
emails, IPv4 addresses, phone-like digit runs — as pure Spark
expressions (regexp_count / chained regexp_replace, JVM-side, no UDF).

Pattern-dialect note: the patterns below use only constructs with
IDENTICAL semantics in Java regex (Spark) and RE2 (DuckDB) — character
classes, bounded repetition, ``\p{L}``; no backreferences, no
lookaround, and crucially NO ``\b``: Java's word boundary is
Unicode-asymmetric around non-ASCII letters (``4दे`` has no Java
boundary but an RE2 one — found by the randomized parity sweep in
tests/test_scrub.py), so the IPv4 rule spells its boundaries as explicit
negated classes captured and restored in the replacement.  Two adjacent
IPs separated by a single delimiter leave the second unredacted in one
pass (the delimiter is consumed) — identically in both engines; run
:func:`scrub_pii` twice for a fixpoint if that case matters.

Replacement order is fixed (email → ip → phone): emails contain digits
and dots that the later patterns could otherwise shred; the chain is a
pure function of the text.

Scale shape: one narrow map over the corpus — no shuffle, fully fused
into whole-stage codegen with whatever projection follows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["EMAIL_RE", "IPV4_RE", "PHONE_RE", "scrub_pii", "pii_counts"]

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"(^|[^\p{L}0-9_.])((\d{1,3}\.){3}\d{1,3})([^\p{L}0-9_.]|$)"
PHONE_RE = r"\+?\d[\d -]{7,}\d"

EMAIL_TOKEN = "<EMAIL>"
IP_TOKEN = "<IP>"
PHONE_TOKEN = "<PHONE>"


def scrub_pii(text: Column) -> Column:
    """Redact emails, IPv4s, and phone-like digit runs (in that order)."""
    return F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(text, EMAIL_RE, EMAIL_TOKEN),
            IPV4_RE,
            "$1" + IP_TOKEN + "$4",
        ),
        PHONE_RE,
        PHONE_TOKEN,
    )


def pii_counts(text: Column) -> list[Column]:
    """Per-kind match counts (pre-redaction) for audit metrics."""
    return [
        F.regexp_count(text, F.lit(EMAIL_RE)).alias("n_emails"),
        F.regexp_count(text, F.lit(IPV4_RE)).alias("n_ips"),
        F.regexp_count(text, F.lit(PHONE_RE)).alias("n_phones"),
    ]


def scrub_documents(
    docs: DataFrame, text_col: str = "text", key_col: str = "doc_id"
) -> DataFrame:
    """(key, n_emails, n_ips, n_phones, scrubbed_md5): audit counts plus a
    content digest of the redacted text (the digest lets an oracle verify
    the whole replacement chain, not just the counts)."""
    t = F.col(text_col)
    return docs.select(
        key_col,
        *pii_counts(t),
        F.md5(scrub_pii(t)).alias("scrubbed_md5"),
    )
