"""Text-analysis expressions: language-ID, quality score, token counts,
document fingerprints.

All pure Spark column expressions (JVM-side, whole-stage codegen, and each
one has an exact ANSI-SQL twin for the DuckDB oracle).  These are the
corpus-curation ops a crawl-scale training-data pipeline runs over every
document — the cheap always-on filters that run BEFORE the heavier Arrow
extraction kernel.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["lang_id_expr", "quality_score_expr", "token_count_expr", "fingerprint_expr"]


def _ratio(pattern: str, col: Column) -> Column:
    """share of characters matching the single-char class `pattern`."""
    kept = F.length(F.regexp_replace(col, pattern, ""))
    return (F.length(col) - kept) / F.greatest(F.length(col), F.lit(1)).cast("double")


def lang_id_expr(col: Column) -> Column:
    """Script-ratio language heuristic → 'gu' | 'hi' | 'en' | 'und'.

    The n-gram-free version of fastText-style langid: dominant writing
    system wins; Latin text must clear a letter-ratio bar to be 'en'
    (digit/punct soup stays 'und').  Same CASE tree runs in DuckDB.
    """
    guj = _ratio(r"[઀-૿]", col)
    dev = _ratio(r"[ऀ-ॿ]", col)
    lat = _ratio(r"[A-Za-z]", col)
    return (
        F.when(guj > 0.3, F.lit("gu"))
        .when(dev > 0.3, F.lit("hi"))
        .when(lat > 0.4, F.lit("en"))
        .otherwise(F.lit("und"))
    )


def quality_score_expr(col: Column) -> Column:
    """[0,1] heuristic quality: length band + letter share − digit/punct soup.

    A C4/Gopher-style rule-of-thumb filter expressed as one arithmetic
    column: score = 0.4·len_ok + 0.4·letter_ratio − 0.2·(punct+digit soup),
    clamped to [0,1].
    """
    n = F.length(col)
    len_ok = F.when((n >= 100) & (n <= 20000), F.lit(1.0)).otherwise(
        F.when(n >= 20, F.lit(0.5)).otherwise(F.lit(0.0))
    )
    letters = _ratio(r"[A-Za-z઀-૿ऀ-ॿ]", col)
    soup = _ratio(r"[0-9!-/:-@\[-`{-~]", col)
    raw = F.lit(0.4) * len_ok + F.lit(0.4) * letters - F.lit(0.2) * soup + F.lit(0.2)
    return F.least(F.greatest(raw, F.lit(0.0)), F.lit(1.0))


def token_count_expr(col: Column) -> Column:
    """Whitespace token count (the BPE-ish regex variant is `\\w+|[^\\w\\s]`)."""
    return F.size(F.split(F.trim(col), r"\s+"))


def bpe_ish_token_count_expr(col: Column) -> Column:
    """Count of word-or-symbol tokens — a rough proxy for BPE token counts
    (letters/digits runs count 1, each punctuation mark counts 1)."""
    return F.size(F.regexp_extract_all(col, F.lit(r"(\w+|[^\w\s])"), 1))


def fingerprint_expr(col: Column) -> Column:
    """64-bit-ish stable document fingerprint: md5 prefix as bigint.

    Exact-dup detection key; cross-engine (DuckDB:
    ``('0x'||substr(md5(x),1,15))::BIGINT``)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")
