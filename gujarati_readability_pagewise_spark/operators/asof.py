"""As-of (backward) join: each left row gets the latest right row at-or-before
its timestamp, per key.

Spark has no native ASOF JOIN (DuckDB/Pandas do).  The scalable composition
used here is union + window fill:

1. union the two sides on (key, ts) with a side flag, right rows sorted
   BEFORE left rows at equal ts (ASOF's ``right.ts <= left.ts`` inclusive);
2. one window per key ordered by (ts, flag):
   ``last(<right col>, ignorenulls=True)`` over unbounded-preceding rows
   forward-fills the most recent right values;
3. keep the left rows.

Cost at 10^12 rows: ONE shuffle of (key, ts) tuples — same as the
sort-merge join Spark would run anyway — with no range-explosion (a naive
``left.ts >= right.ts`` theta-join would cartesian within keys and melt at
scale).  The matched-timestamp column comes along for free.

Determinism: callers must ensure at most one right row per (key, ts) —
otherwise which row wins is tie-dependent.  Use
``dedupe_latest(right, key, ts, tiebreak)`` first (kept separate so the
caller can pick the canonical row).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

__all__ = ["dedupe_latest", "asof_join", "interval_join_bucketed"]


def dedupe_latest(df: DataFrame, key: str, ts: str, tiebreak: str) -> DataFrame:
    """One row per (key, ts): the row with the greatest `tiebreak` value."""
    w = W.partitionBy(key, ts).orderBy(F.desc(tiebreak))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
) -> DataFrame:
    """Backward as-of join; `value_cols` (from `right`) are forward-filled
    onto each left row, plus `matched_ts` (the right timestamp that won,
    null when no right row precedes the left row)."""
    lcols = [c for c in left.columns]
    clash = (set(value_cols) | {"matched_ts"}) & set(lcols)
    if clash:
        raise ValueError(
            f"asof_join output would duplicate left column(s) {sorted(clash)}; "
            "rename them on one side first"
        )
    l = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_left"),
        *[F.col(c) for c in lcols],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("_rts"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_v_{c}") for c in value_cols],
    )
    r = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        F.col(right_ts).alias("_rts"),
        *[F.col(c).alias(f"_v_{c}") for c in value_cols],
    )
    u = l.unionByName(r)
    w = (
        W.partitionBy("_k")
        .orderBy(F.col("_ts").asc(), F.col("_is_left").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    filled = u.select(
        "*",
        F.last("_rts", ignorenulls=True).over(w).alias("matched_ts"),
        *[
            F.last(f"_v_{c}", ignorenulls=True).over(w).alias(f"_m_{c}")
            for c in value_cols
        ],
    )
    return filled.filter(F.col("_is_left") == 1).select(
        *lcols,
        "matched_ts",
        *[F.col(f"_m_{c}").alias(c) for c in value_cols],
    )


def interval_join_bucketed(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str = "ts",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    bucket_seconds: int = 86400,
    how: str = "inner",
) -> DataFrame:
    """Range-containment join (point.ts ∈ [start, end]) without the
    nested-loop trap.

    Spark plans a raw ``ts BETWEEN start AND end`` join as
    BroadcastNestedLoop — quadratic the moment neither side broadcasts.
    The shuffle-native form aligns both sides on TIME BUCKETS: each point
    has exactly one bucket, each interval explodes into the buckets it
    overlaps (bounded by interval length / bucket_seconds), the join is a
    plain equi-join on the bucket, and the exact BETWEEN filter runs
    post-join.  Because a point owns a single bucket, no (point,
    interval) pair can meet twice — no dedup pass needed.

    Pick ``bucket_seconds`` near the typical interval length: shorter
    buckets shrink the per-bucket candidate sets, longer buckets shrink
    the interval fan-out.  ``how='left'`` keeps points matching no
    interval, with NULL interval columns.
    """
    if how not in ("inner", "left"):
        raise ValueError("interval_join_bucketed supports inner|left")
    b = F.lit(bucket_seconds)
    pb = points.withColumn(
        "_bkt", (F.floor(F.unix_timestamp(F.col(ts_col)) / b)).cast("long")
    )
    ib = intervals.withColumn(
        "_bkt",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(start_col)) / b).cast("long"),
                F.floor(F.unix_timestamp(F.col(end_col)) / b).cast("long"),
            )
        ),
    )
    cond = (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) <= F.col(end_col))
    if how == "inner":
        return pb.join(ib, "_bkt").filter(cond).drop("_bkt")
    matched = pb.join(ib, "_bkt").filter(cond).drop("_bkt")
    # left: union matched with never-matched points carrying NULLs.  The
    # anti-join uses NULL-SAFE equality on the full point tuple: plain
    # join equality is null-rejecting, so a matched point carrying a NULL
    # payload column would survive the anti-join and appear twice (once
    # matched, once NULL-padded).  The full-tuple form is also correct
    # for duplicate identical point rows — if such a row matches, BOTH
    # copies appear in `matched` and both are removed here; if not, both
    # survive — and unlike a synthetic monotonically_increasing_id it
    # never assumes two evaluations of an uncached plan assign rows the
    # same ids (task retries / nondeterministic upstream ordering break
    # that).
    mm = matched.select(*points.columns).distinct().alias("m")
    pp = points.alias("p")
    anti_cond = None
    for c in points.columns:
        eq = F.col(f"p.{c}").eqNullSafe(F.col(f"m.{c}"))
        anti_cond = eq if anti_cond is None else (anti_cond & eq)
    never = pp.join(mm, anti_cond, "left_anti")
    for c in [c for c in ib.columns if c not in points.columns + ["_bkt"]]:
        never = never.withColumn(c, F.lit(None))
    return matched.unionByName(never.select(matched.columns))
