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

__all__ = [
    "EMAIL_RE",
    "IPV4_RE",
    "IPV6_RE",
    "PHONE_RE",
    "scrub_pii",
    "pii_counts",
]

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"(^|[^\p{L}0-9_.])((\d{1,3}\.){3}\d{1,3})([^\p{L}0-9_.]|$)"
PHONE_RE = r"\+?\d[\d -]{7,}\d"
# IPv6, same dialect constraints (no \b, no lookaround, only non-capturing
# inner groups so the boundary backrefs stay $1/$3): full 8-group form,
# '::'-compressed with a leading group, and leading-'::' forms.  The
# boundary classes exclude hex chars, ':' and '.', so partial matches
# can't split an address; an IPv4-mapped tail ('::ffff:1.2.3.4') is left
# for the IPv4 rule that runs next in the chain.
IPV6_RE = (
    r"(^|[^A-Za-z0-9:.])"
    r"((?:[0-9A-Fa-f]{1,4}:){7}[0-9A-Fa-f]{1,4}"
    r"|(?:[0-9A-Fa-f]{1,4}:)+:(?:[0-9A-Fa-f]{1,4}(?::[0-9A-Fa-f]{1,4})*)?"
    r"|::(?:[0-9A-Fa-f]{1,4}(?::[0-9A-Fa-f]{1,4})*))"
    r"([^A-Za-z0-9:.]|$)"
)

EMAIL_TOKEN = "<EMAIL>"
IP_TOKEN = "<IP>"
IPV6_TOKEN = "<IPV6>"
PHONE_TOKEN = "<PHONE>"


def scrub_pii(text: Column, fixpoint: bool = False, ipv6: bool = False) -> Column:
    """Redact emails, (optionally IPv6s,) IPv4s, and phone-like digit runs
    in that fixed order.

    ``fixpoint=True`` runs the chain a second time: the IP boundary
    classes CONSUME their delimiter, so two addresses separated by a
    single delimiter ("10.0.0.1,10.0.0.2") leave the second unredacted
    after one pass — identically in both engines; the second pass closes
    the gap (token boundaries are word chars, so a third pass is a
    no-op on the tokens themselves).
    """
    out = F.regexp_replace(text, EMAIL_RE, EMAIL_TOKEN)
    if ipv6:
        out = F.regexp_replace(out, IPV6_RE, "$1" + IPV6_TOKEN + "$3")
    out = F.regexp_replace(
        F.regexp_replace(out, IPV4_RE, "$1" + IP_TOKEN + "$4"),
        PHONE_RE,
        PHONE_TOKEN,
    )
    if fixpoint:
        return scrub_pii(out, fixpoint=False, ipv6=ipv6)
    return out


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
