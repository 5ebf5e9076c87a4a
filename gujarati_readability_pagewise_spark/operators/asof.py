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

__all__ = ["dedupe_latest", "asof_join"]


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
