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
    "heavy_hitters_hash_sampled",
    "salted_summary",
    "salted_join",
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


def heavy_hitters_hash_sampled(
    df: DataFrame,
    key: str,
    sample_on: str,
    min_share: float = 0.1,
    mod: int = 50,
    seed: int = 7,
    safety: float = 0.5,
) -> DataFrame:
    """THE sampled heavy-hitter pre-pass — the detection you can afford at
    10^12 rows (``heavy_hitters`` is exact but scans the table twice).

    One partial scan, shuffle only the sampled keys; the 1/``mod`` sample
    is selected by ``stable_hash64(sample_on, seed) % mod == 0``, NOT by
    ``rand()``/``sample()`` — Bernoulli ``sample()`` is partition-order
    dependent, so task retries, repartitioning, and re-runs could flip
    which keys got salted mid-resume (an earlier ``rand()``-sampled form
    was removed for exactly that reason); the hash-selected sample is
    content-deterministic and expressible in plain SQL for cross-engine
    verification.

    ``sample_on`` must be a (near-)unique row identifier column (cast to
    string internally); keys are kept at ``min_share * safety`` — the
    one-sided slack absorbs sampling error (a true heavy hitter at the
    threshold survives with overwhelming probability; false positives
    only cost a useless salt column, false negatives cost a skewed
    reducer).  Output: (key, n_sampled, share_est).
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


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the (large, skewed) LEFT side, replicate
    the (smaller) RIGHT side once per salt — the manual form of AQE's
    skew-join split, for the places AQE can't reach (a skewed key the
    runtime stats miss, stream-static joins where AQE is disabled, or a
    deliberately pinned physical plan).

    The left salt is a deterministic row hash (never ``rand()`` — retries
    must reproduce the same partition assignment); the right side gains
    an exploded ``_salt`` column so each (key, salt) shard joins its own
    replica.  Row-for-row identical to ``left.join(right, key, how)`` for
    ``inner``/``left`` joins (asserted in tests).  Cost: the right side is
    shipped ``n_salts`` times — use it when right is dimension-sized but
    too big (or too mid-plan) to broadcast.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how='inner'|'left' only")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(n_salts))
    l = left.withColumn("_salt", salt)
    r = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("_salt", F.col("_salt").cast(l.schema["_salt"].dataType))
    return l.join(r, [key, "_salt"], how).drop("_salt")
