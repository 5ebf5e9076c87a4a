"""Ingest monitoring: crawl-volume anomaly detection over time buckets.

A 100 TB crawl pipeline watches its own arrival rates: a host or feed
whose hourly volume jumps to k standard deviations above its trailing
mean is a crawler loop, a spam burst, or an outage backfill — flagging
it is the observability layer next to the metrics sink.

The statistics are the classic rolling z-score, but expressed so the
cross-engine gate can verify them EXACTLY: counts are integers, and the
|x − mean| > k·std rule is cross-multiplied to kill both the division
and the sqrt::

    (W·x − Σ)²  >  k² · (W·Σx² − Σ²)          -- exact integer arithmetic

where Σ/Σx² run over the W trailing buckets.  The squared terms can
exceed 64 bits once a (key, bucket) count passes ~10^8 — exactly the
hot keys the monitor exists for — so the COMPARISON is evaluated in
128-bit integers (Spark DECIMAL(38,0), DuckDB HUGEINT).  The binding
term is (W·x − Σ)² ≤ (W·x)², so with W=24 the comparison is exact up to
per-bucket counts of ~4·10^17 (where (24n)² reaches 10^38); beyond
that Spark's non-ANSI decimal multiply returns NULL and the flag is
coalesced to 0 rather than emitted NULL.  Emitted columns stay BIGINT.  Both sides are
exact integers, so the flag is bit-identical across engines and
partitionings — a float z-score would drift in the variance's summation
order, and 64-bit arithmetic would crash (ANSI) or silently wrap the
flag off on the burst it should report.

Scale shape: one hash aggregation to the (key, bucket) counts (map-side
combinable; the bucket count table is ~|keys|·|hours|, tiny relative to
the event stream), then a per-key window over time buckets — bounded by
the monitoring horizon, never by event volume.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

__all__ = ["volume_anomalies", "metric_drift"]


def volume_anomalies(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    bucket_seconds: int = 3600,
    trailing: int = 24,
    k: int = 3,
    min_trailing: int = 8,
) -> DataFrame:
    """Per-(key, bucket) counts with an exact-integer anomaly flag.

    A bucket is anomalous when its count ``x`` vs the ``trailing``
    PRIOR buckets' counts satisfies (W·x − Σ)² > k²·(W·Σx² − Σ²) AND
    x exceeds the trailing mean (one-sided: bursts, not droughts) —
    evaluated only once ``min_trailing`` prior buckets exist.  Output:
    (key, bucket_start, n, w_cnt, sum_prior, sumsq_prior, is_anomaly).

    Buckets are DENSIFIED per key before the window: every bucket in the
    key's [min, max] bucket range materializes (n=0 when no event
    arrived), so the ``trailing`` window is ``trailing`` TIME buckets,
    never a rows-window over present rows that would let a sparse key's
    "24-bucket" baseline silently span weeks and judge a post-outage
    burst against stale volumes.  Zero-volume buckets appear in the
    output (flag 0 — the rule is one-sided) so droughts are visible to
    the metrics sink too.  Cost: |keys| x horizon rows — bounded by the
    monitoring horizon, not event volume.
    """
    bucket = (
        F.floor(F.unix_timestamp(F.col(ts_col)) / bucket_seconds) * bucket_seconds
    ).cast("long")
    counts = (
        events.groupBy(F.col(key_col).alias("key"), bucket.alias("bucket_start"))
        .agg(F.count("*").alias("n"))
    )
    span = counts.groupBy("key").agg(
        F.min("bucket_start").alias("_lo"), F.max("bucket_start").alias("_hi")
    )
    grid = span.select(
        "key",
        F.explode(
            F.sequence(F.col("_lo"), F.col("_hi"), F.lit(bucket_seconds))
        ).alias("bucket_start"),
    )
    counts = grid.join(counts, ["key", "bucket_start"], "left").withColumn(
        "n", F.coalesce(F.col("n"), F.lit(0)).cast("long")
    )
    w = (
        W.partitionBy("key")
        .orderBy("bucket_start")
        .rowsBetween(-trailing, -1)
    )
    prior_n = F.count("n").over(w).cast("long")
    prior_sum = F.coalesce(F.sum("n").over(w), F.lit(0)).cast("long")
    prior_sumsq = F.coalesce(F.sum(F.col("n") * F.col("n")).over(w), F.lit(0)).cast(
        "long"
    )
    # 128-bit comparison (see module docstring): widen BEFORE multiplying.
    # The flag's Σx² is summed in decimal directly — the BIGINT sumsq audit
    # column itself saturates once W·n² passes 2^63 (documented bound), but
    # the flag must stay exact beyond it.
    d = lambda c: c.cast("decimal(38,0)")
    sumsq_d = F.coalesce(
        F.sum(d(F.col("n")) * d(F.col("n"))).over(w), F.lit(0).cast("decimal(38,0)")
    )
    lhs = d(prior_n) * d(F.col("n")) - d(prior_sum)
    flag = (
        (prior_n >= min_trailing)
        & (prior_n * F.col("n") > prior_sum)  # one-sided: burst only
        & (lhs * lhs > k * k * (d(prior_n) * sumsq_d - d(prior_sum) * d(prior_sum)))
    )
    # DECIMAL(38,0) overflow in lhs*lhs is non-ANSI NULL: past counts of
    # ~1e17 per bucket (W*n squared hits 10^38) the flag would go NULL,
    # not 0/1 — coalesce pins it 0 and the bound is documented here
    # rather than silently producing a NULL monitor row.
    flag = F.coalesce(flag.cast("int"), F.lit(0))
    return counts.select(
        "key",
        "bucket_start",
        "n",
        prior_n.alias("w_cnt"),
        prior_sum.alias("sum_prior"),
        prior_sumsq.alias("sumsq_prior"),
        flag.cast("int").alias("is_anomaly"),
    )


def metric_drift(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "source",
    score_col: str = "score",
    bucket_seconds: int = 3600,
    trailing: int = 24,
    min_trailing: int = 8,
    threshold_num: int = 1200,
    threshold_den: int = 1,
) -> DataFrame:
    """Per-(key, bucket) MEAN-SHIFT detection over an integer metric —
    the quality-drift monitor next to the volume monitor: a source whose
    mean quality score moves more than ``threshold_num/threshold_den``
    away from its trailing mean is an extractor regression, a template
    change, or a spam wave.

    ``score_col`` must be an INTEGER metric (fixed-point a float first:
    ``floor(q * 10000)``) so the rule is exact: with bucket sum/count
    (S, n) and trailing sums (St, Nt),

        |S/n − St/Nt| > num/den   ⇔   den·|S·Nt − St·n| > num·n·Nt

    where ``num/den`` is the drift threshold IN SCORE UNITS — for a
    quality score fixed-pointed at 1e4, a 0.12-quality drift is
    ``threshold_num=1200, threshold_den=1``

    — evaluated in DECIMAL(38,0)/HUGEINT, no float division, so the
    flag is bit-identical across engines and partitionings.  Buckets
    densify per key exactly like :func:`volume_anomalies` (empty buckets
    carry n=0 and are skipped by the flag: a mean over nothing is no
    evidence, but the row is emitted so droughts stay visible).  Output:
    (key, bucket_start, n, score_sum, w_n, w_sum, is_drift).
    """
    bucket = (
        F.floor(F.unix_timestamp(F.col(ts_col)) / bucket_seconds) * bucket_seconds
    ).cast("long")
    counts = (
        events.groupBy(F.col(key_col).alias("key"), bucket.alias("bucket_start"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col(score_col).cast("long")).alias("score_sum"),
        )
    )
    span = counts.groupBy("key").agg(
        F.min("bucket_start").alias("_lo"), F.max("bucket_start").alias("_hi")
    )
    grid = span.select(
        "key",
        F.explode(
            F.sequence(F.col("_lo"), F.col("_hi"), F.lit(bucket_seconds))
        ).alias("bucket_start"),
    )
    counts = (
        grid.join(counts, ["key", "bucket_start"], "left")
        .withColumn("n", F.coalesce(F.col("n"), F.lit(0)).cast("long"))
        .withColumn(
            "score_sum", F.coalesce(F.col("score_sum"), F.lit(0)).cast("long")
        )
    )
    w = W.partitionBy("key").orderBy("bucket_start").rowsBetween(-trailing, -1)
    w_n = F.coalesce(F.sum("n").over(w), F.lit(0)).cast("long")
    w_sum = F.coalesce(F.sum("score_sum").over(w), F.lit(0)).cast("long")
    w_buckets = F.count("n").over(w).cast("long")
    d = lambda c: c.cast("decimal(38,0)")
    diff = d(F.col("score_sum")) * d(w_n) - d(w_sum) * d(F.col("n"))
    flag = (
        (w_buckets >= min_trailing)
        & (F.col("n") > 0)
        & (w_n > 0)
        & (
            threshold_den * F.abs(diff)
            > threshold_num * d(F.col("n")) * d(w_n)
        )
    )
    flag = F.coalesce(flag.cast("int"), F.lit(0))
    return counts.select(
        "key",
        "bucket_start",
        "n",
        "score_sum",
        w_n.alias("w_n"),
        w_sum.alias("w_sum"),
        flag.alias("is_drift"),
    )
