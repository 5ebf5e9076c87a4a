"""DSIR-style data selection: hashed n-gram importance resampling.

Data Selection via Importance Resampling (Xie et al. 2023) picks
pretraining documents whose hashed-n-gram profile looks like a TARGET
distribution (e.g. curated wiki/books text) rather than the raw crawl:
featurize every doc into hashed unigram+bigram bucket counts, fit
bag-of-buckets models on the target and raw corpora, weight each raw doc
by its likelihood ratio, and resample by weight.

The graft keeps the estimator's structure — hashed n-gram buckets,
add-one-smoothed target/raw bucket frequencies, per-doc likelihood
ratio — but scores with the LINEARIZED ratio

    importance(d) = (S_t(d) · (T_r + m)) / (S_r(d) · (T_t + m))

where ``S_t(d) = Σ_{gram occurrences g in d} (ct[bucket(g)] + 1)`` (and
``S_r`` likewise over raw counts), ``T_t/T_r`` are total gram counts and
``m`` the bucket count: the mean smoothed target-frequency of the doc's
grams over its mean smoothed raw-frequency.  The classic form sums
per-bucket LOG ratios; a log-linear score cannot be made bit-identical
across engines (libm ulps — the same reason bigram_fluency scores mean
corpus frequency rather than log-prob, functions/repetition.py), while
this form is integer sums + ONE float division, exact in both engines.
Ranking by it preserves the DSIR intent: docs whose grams are common in
the target and rare in the raw corpus float to the top.

Scale shape (10^12 docs): the gram stream is the bigram_fluency explode;
both bucket-count tables are bounded by ``n_buckets`` rows (default
4096) and BROADCAST, so a Zipf-hot bucket resolves map-side and the only
wide exchange is the per-doc integer aggregation (map-side combinable).
Products are widened to DECIMAL(38,0) before the final division — at
corpus scale ``S_t · T_r`` exceeds 64 bits long before the doc stream
does anything else wrong.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import stable_hash64

__all__ = ["dsir_importance", "dsir_index", "dsir_importance_incremental"]


def _gram_buckets(docs: DataFrame, text_col: str, key_col: str, n_buckets: int) -> DataFrame:
    """(key, bucket) — one row per unigram/bigram OCCURRENCE, bucketed by
    the cross-engine stable 64-bit hash."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    unis = F.filter(toks, lambda w: F.length(w) > 0)
    bis = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat_ws(" ", F.slice(toks, i, 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = F.concat(unis, bis)
    return docs.select(
        key_col, F.explode(grams).alias("gram")
    ).select(
        key_col,
        F.pmod(stable_hash64(F.col("gram")), F.lit(n_buckets)).alias("bucket"),
    )


def dsir_importance(
    docs: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    n_buckets: int = 4096,
) -> DataFrame:
    """Per-doc DSIR-style importance of ``docs`` toward ``target``.

    Output: ``(key, n_grams, s_target, s_raw, importance)`` where
    ``n_grams`` is the doc's unigram+bigram occurrence count, ``s_target``
    / ``s_raw`` the integer sums of add-one-smoothed bucket counts over
    those occurrences, and ``importance`` the linearized likelihood ratio
    above (one float division of exact integer products).  Docs with no
    grams are omitted (no profile to score).  Downstream selection is a
    deterministic top-k on (importance DESC, key) or a hash-Bernoulli
    keep (operators/sampling.quality_weighted_sample's pattern).
    """
    raw_grams = _gram_buckets(docs, text_col, key_col, n_buckets)
    tgt_grams = _gram_buckets(target, text_col, key_col, n_buckets)
    ct = tgt_grams.groupBy("bucket").agg(F.count("*").alias("ct"))
    cr = raw_grams.groupBy("bucket").agg(F.count("*").alias("cr"))
    # totals: one row each, broadcast as a cross-joined literal pair
    tt = ct.agg(F.sum("ct").alias("t_t"))
    tr = cr.agg(F.sum("cr").alias("t_r"))
    d = lambda c: c.cast("decimal(38,0)")
    scored = (
        raw_grams
        .join(F.broadcast(ct), "bucket", "left")
        .join(F.broadcast(cr), "bucket", "left")  # cr always matches; ct may not
        .groupBy(key_col)
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(F.coalesce(F.col("ct"), F.lit(0)) + 1).alias("s_target"),
            F.sum(F.col("cr") + 1).alias("s_raw"),
        )
        .crossJoin(F.broadcast(tt))
        .crossJoin(F.broadcast(tr))
    )
    return scored.select(
        key_col,
        "n_grams",
        "s_target",
        "s_raw",
        (
            (d(F.col("s_target")) * d(F.col("t_r") + n_buckets)).cast("double")
            / (d(F.col("s_raw")) * d(F.col("t_t") + n_buckets)).cast("double")
        ).alias("importance"),
    )


def dsir_index(
    docs: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    n_buckets: int = 4096,
) -> DataFrame:
    """The stored DSIR estimator: one row per hashed-gram bucket with its
    target and raw occurrence counts — ``(bucket, ct, cr)``.

    Fit ONCE over the reference corpora and persist (≤ ``n_buckets``
    rows); daily snapshots are then scored against it by
    :func:`dsir_importance_incremental` without ever re-reading the
    corpus — the same fit-once/score-streams split the incremental dedup
    family uses (window_hash_index, lsh_cross_candidates).  Totals are
    re-derived from the index by summation (exact integers), so the
    index is self-contained.
    """
    raw_grams = _gram_buckets(docs, text_col, key_col, n_buckets)
    tgt_grams = _gram_buckets(target, text_col, key_col, n_buckets)
    ct = tgt_grams.groupBy("bucket").agg(F.count("*").alias("ct"))
    cr = raw_grams.groupBy("bucket").agg(F.count("*").alias("cr"))
    # FULL outer: in the canonical deployment the target is a SEPARATE
    # curated corpus, so buckets can exist on either side alone — a left
    # join would silently drop target-only buckets (and their t_t mass),
    # skewing every later snapshot score
    return (
        cr.join(ct, "bucket", "full")
        .select(
            "bucket",
            F.coalesce("ct", F.lit(0)).cast("long").alias("ct"),
            F.coalesce("cr", F.lit(0)).cast("long").alias("cr"),
        )
    )


def dsir_importance_incremental(
    new_docs: DataFrame,
    index: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    n_buckets: int = 4096,
) -> DataFrame:
    """Score a NEW snapshot against a stored :func:`dsir_index` — the
    deployment shape of DSIR (fit the importance estimator once, stream
    every incoming crawl snapshot through it); cost ∝ snapshot, never
    corpus.  Same output contract and linearized ratio as
    :func:`dsir_importance`; buckets the index never saw score with the
    add-one smoothing floor (ct=cr=0), exactly as an unseen gram should.
    """
    grams = _gram_buckets(new_docs, text_col, key_col, n_buckets)
    totals = index.agg(
        F.sum("ct").alias("t_t"), F.sum("cr").alias("t_r")
    )
    d = lambda c: c.cast("decimal(38,0)")
    scored = (
        grams.join(F.broadcast(index), "bucket", "left")
        .groupBy(key_col)
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(F.coalesce(F.col("ct"), F.lit(0)) + 1).alias("s_target"),
            F.sum(F.coalesce(F.col("cr"), F.lit(0)) + 1).alias("s_raw"),
        )
        .crossJoin(F.broadcast(totals))
    )
    return scored.select(
        key_col,
        "n_grams",
        "s_target",
        "s_raw",
        (
            (d(F.col("s_target")) * d(F.col("t_r") + n_buckets)).cast("double")
            / (d(F.col("s_raw")) * d(F.col("t_t") + n_buckets)).cast("double")
        ).alias("importance"),
    )
