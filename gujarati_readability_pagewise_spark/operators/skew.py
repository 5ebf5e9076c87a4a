"""Skewed-key handling: heavy-hitter detection + salted two-stage aggregation.

north_rule requires explicit skew machinery: one crawl host can hold 30 %+
of all pages (the synthetic generator plants exactly that).  AQE's skew-join
splitting handles *joins*; for wide **aggregations** over the hot key the
cure is salting — pre-aggregate on (key, salt) so the hot key's rows spread
over S reducers, then merge the S partials.

Only algebraic aggregates can split this way; this module implements the
count/sum/min/max/avg family (avg = sum+count merged at stage 2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import stable_hash64

__all__ = [
    "heavy_hitters",
    "heavy_hitters_approx",
    "heavy_hitters_hash_sampled",
    "salted_summary",
]


def heavy_hitters(df: DataFrame, key: str, min_share: float = 0.1) -> DataFrame:
    """Keys holding more than ``min_share`` of all rows (exact, two aggs)."""
    total = df.count()
    return (
        df.groupBy(key)
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > min_share * total)
        .withColumn("share", F.col("n") / F.lit(float(total)))
    )


def heavy_hitters_approx(
    df: DataFrame,
    key: str,
    min_share: float = 0.1,
    sample_fraction: float = 0.02,
    seed: int = 42,
    safety: float = 0.5,
) -> DataFrame:
    """Sampled heavy-hitter detection — the pre-pass you can afford at
    10^12 rows.

    ``heavy_hitters`` is exact but scans the table twice; here a seeded
    Bernoulli sample (one partial scan, no shuffle of the full table)
    estimates shares.  Keys are kept at ``min_share * safety`` — the
    slack absorbs sampling error so a true heavy hitter at the threshold
    is kept with overwhelming probability (a 10% key sampled at 2% of a
    10^9-row table is ~200k draws; share estimates concentrate within
    ±0.2%).  Output is a CANDIDATE set for the salting/AQE machinery:
    false positives only cost a useless salt column, false negatives cost
    a skewed reducer — hence the one-sided safety margin.
    """
    s = df.select(key).sample(fraction=sample_fraction, seed=seed)
    n = s.count()
    if n == 0:
        return s.groupBy(key).agg(F.count("*").alias("n_sampled")).withColumn(
            "share_est", F.col("n_sampled").cast("double")
        )
    return (
        s.groupBy(key)
        .agg(F.count("*").alias("n_sampled"))
        .withColumn("share_est", F.col("n_sampled") / F.lit(float(n)))
        .filter(F.col("share_est") >= min_share * safety)
    )


def heavy_hitters_hash_sampled(
    df: DataFrame,
    key: str,
    sample_on: str,
    min_share: float = 0.1,
    mod: int = 50,
    seed: int = 7,
    safety: float = 0.5,
) -> DataFrame:
    """Sampled heavy-hitter detection with a CONTENT-deterministic sample.

    Same cost shape as ``heavy_hitters_approx`` (one partial scan, shuffle
    only the sampled keys) but the 1/``mod`` sample is selected by
    ``stable_hash64(sample_on, seed) % mod == 0`` instead of ``rand()`` —
    so task retries, repartitioning, and re-runs all see the SAME sample
    (Bernoulli ``sample()`` is partition-order dependent), and the whole
    detection is expressible in plain SQL for cross-engine verification.
    At 10^12 rows this determinism is what makes the skew pre-pass safe to
    resume from a checkpoint: a retried stage cannot flip which keys got
    salted.

    ``sample_on`` must be a (near-)unique row identifier column (cast to
    string internally); keys are kept at ``min_share * safety`` — the
    one-sided slack absorbs sampling error exactly as in
    ``heavy_hitters_approx``.  Output: (key, n_sampled, share_est).
    """
    sampled = df.filter(
        F.pmod(stable_hash64(F.col(sample_on).cast("string"), seed=seed), F.lit(mod))
        == 0
    ).select(key)
    counts = sampled.groupBy(key).agg(F.count("*").alias("n_sampled"))
    total = sampled.agg(F.count("*").alias("_tot"))
    return (
        counts.crossJoin(F.broadcast(total))
        .withColumn("share_est", F.col("n_sampled") / F.col("_tot").cast("double"))
        .filter(F.col("share_est") >= min_share * safety)
        .drop("_tot")
    )


def salted_summary(
    df: DataFrame,
    key: str,
    value: str,
    n_salts: int = 16,
) -> DataFrame:
    """groupBy(key).agg(count,sum,avg,min,max of value) via salted two-stage.

    Stage 1 groups on (key, salt) — the hot key fans out over ``n_salts``
    reducers; stage 2 merges the tiny partials.  Salt must be a
    deterministic function of the ROW (here: value+key hash), never
    ``rand()``, so task retries reproduce the same partials.
    """
    salt = F.pmod(
        F.xxhash64(F.col(key), F.coalesce(F.col(value).cast("string"), F.lit(""))),
        F.lit(n_salts),
    )
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(key, "_salt")
        .agg(
            F.count("*").alias("_n"),
            F.sum(value).alias("_sum"),
            F.min(value).alias("_min"),
            F.max(value).alias("_max"),
        )
    )
    return (
        partial.groupBy(key)
        .agg(
            F.sum("_n").alias("n"),
            F.sum("_sum").alias("sum_value"),
            (F.sum("_sum") / F.sum("_n")).alias("avg_value"),
            F.min("_min").alias("min_value"),
            F.max("_max").alias("max_value"),
        )
    )
