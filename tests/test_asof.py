"""As-of join: known-answer cases + brute-force equivalence on testdata."""

import datetime as dt

import pandas as pd
from pyspark.sql import functions as F

from gujarati_readability_pagewise_spark.operators.asof import (
    asof_join,
    dedupe_latest,
)


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_known_answers(spark):
    left = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": [1, 1, 1, 2],
                "ts": [_ts("2024-01-05"), _ts("2024-01-10"), _ts("2024-01-01"), _ts("2024-01-05")],
                "ev": ["a", "b", "before-any", "no-right-rows"],
            }
        )
    )
    right = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": [1, 1],
                "rts": [_ts("2024-01-05"), _ts("2024-01-08")],
                "price": [10.0, 20.0],
            }
        )
    )
    out = {
        r["ev"]: r
        for r in asof_join(left, right, "k", "ts", "rts", ["price"]).collect()
    }
    # equal timestamps are INCLUSIVE (right sorts before left)
    assert out["a"]["price"] == 10.0 and out["a"]["matched_ts"] == _ts("2024-01-05")
    # latest at-or-before wins
    assert out["b"]["price"] == 20.0 and out["b"]["matched_ts"] == _ts("2024-01-08")
    # left row before any right row → nulls
    assert out["before-any"]["price"] is None and out["before-any"]["matched_ts"] is None
    # key with no right rows at all → nulls
    assert out["no-right-rows"]["price"] is None


def test_dedupe_latest_keeps_max_tiebreak(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {"k": [1, 1], "ts": [_ts("2024-01-05")] * 2, "id": [7, 9], "v": [1.0, 2.0]}
        )
    )
    out = dedupe_latest(df, "k", "ts", "id").collect()
    assert len(out) == 1 and out[0]["id"] == 9


def test_asof_equals_brute_force_on_testdata(spark):
    """events ⟕asof orders must equal the correlated-max brute force."""
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").filter(
        F.col("user_id") < 25
    )
    orders = dedupe_latest(
        spark.read.parquet("/root/testdata/sf0.001/orders.parquet"),
        "o_custkey",
        "o_orderdate",
        "o_orderkey",
    ).withColumnRenamed("o_custkey", "user_id")
    got = (
        asof_join(ev, orders, "user_id", "ts", "o_orderdate", ["o_orderkey"])
        .select("event_id", "o_orderkey")
        .toPandas()
        .set_index("event_id")["o_orderkey"]
    )
    # brute force: per event, max o_orderdate <= ts, then its (deduped) row
    pairs = (
        ev.join(orders, "user_id")
        .filter(F.col("o_orderdate") <= F.col("ts"))
        .groupBy("event_id")
        .agg(F.max_by("o_orderkey", F.struct("o_orderdate", "o_orderkey")).alias("o_orderkey"))
        .toPandas()
        .set_index("event_id")["o_orderkey"]
    )
    assert len(got) == ev.count()
    joined = got.to_frame("asof").join(pairs.to_frame("brute"), how="left")
    mism = joined[joined["asof"].fillna(-1) != joined["brute"].fillna(-1)]
    assert mism.empty, mism.head()


def test_value_col_name_clash_raises(spark):
    import pytest

    left = spark.createDataFrame(
        pd.DataFrame({"k": [1], "ts": [_ts("2024-01-05")], "price": [1.0]})
    )
    right = spark.createDataFrame(
        pd.DataFrame({"k": [1], "rts": [_ts("2024-01-01")], "price": [2.0]})
    )
    with pytest.raises(ValueError, match="duplicate left column"):
        asof_join(left, right, "k", "ts", "rts", ["price"])


def test_interval_join_bucketed_equals_naive_between(spark):
    """Bucketed interval join ≡ naive BETWEEN cross-join filter for inner
    and left joins, including points matching no interval, and the plan
    carries NO BroadcastNestedLoop when broadcast is disabled."""
    import pandas as pd
    from pyspark.sql import functions as F

    from gujarati_readability_pagewise_spark.operators.asof import (
        interval_join_bucketed,
    )

    base = 1_700_000_000
    pts = spark.createDataFrame(
        pd.DataFrame(
            {
                "pid": range(200),
                "ts": [pd.Timestamp(base + i * 977, unit="s") for i in range(200)],
            }
        )
    )
    iv = spark.createDataFrame(
        pd.DataFrame(
            {
                "iv_id": range(8),
                "start_ts": [pd.Timestamp(base + i * 20000, unit="s") for i in range(8)],
                "end_ts": [
                    pd.Timestamp(base + i * 20000 + 15000, unit="s") for i in range(8)
                ],
            }
        )
    )
    naive = sorted(
        map(
            tuple,
            pts.crossJoin(iv)
            .filter((F.col("ts") >= F.col("start_ts")) & (F.col("ts") <= F.col("end_ts")))
            .select("pid", "iv_id")
            .collect(),
        )
    )
    fast = interval_join_bucketed(pts, iv, bucket_seconds=7200)
    got = sorted(map(tuple, fast.select("pid", "iv_id").collect()))
    assert got == naive and len(naive) > 0
    left = interval_join_bucketed(pts, iv, bucket_seconds=7200, how="left")
    lp = left.select("pid", "iv_id").collect()
    matched_pids = {t[0] for t in naive}
    assert {r["pid"] for r in lp if r["iv_id"] is None} == set(range(200)) - matched_pids
    assert sorted((r["pid"], r["iv_id"]) for r in lp if r["iv_id"] is not None) == naive
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan = interval_join_bucketed(pts, iv, bucket_seconds=7200)._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoop" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_interval_join_left_null_payload_and_dup_points(spark):
    """Left interval join must not duplicate a MATCHED point whose payload
    column is NULL (a full-tuple anti-join is null-rejecting and would
    leave it in the never-matched branch too), and must keep duplicate
    identical point rows as distinct rows."""
    from datetime import datetime, timezone

    from gujarati_readability_pagewise_spark.operators.asof import (
        interval_join_bucketed,
    )

    base = 1_700_000_000
    dt = lambda s: datetime.fromtimestamp(base + s, tz=timezone.utc).replace(tzinfo=None)
    pts = spark.createDataFrame(
        [
            # matched, NULL payload — the ADVICE failure case
            (dt(100), None),
            # matched, twice (identical duplicate rows)
            (dt(200), "a"),
            (dt(200), "a"),
            # unmatched, NULL payload
            (dt(90000), None),
        ],
        "ts timestamp, payload string",
    )
    iv = spark.createDataFrame(
        [(1, dt(0), dt(1000))],
        "iv_id int, start_ts timestamp, end_ts timestamp",
    )
    out = interval_join_bucketed(pts, iv, bucket_seconds=3600, how="left")
    rows = sorted(
        [(r["payload"], r["iv_id"]) for r in out.select("payload", "iv_id").collect()],
        key=lambda t: (str(t[0]), str(t[1])),
    )
    # exactly 4 rows: NULL-payload matched ONCE, both dups matched, one never-matched
    assert rows == [(None, 1), (None, None), ("a", 1), ("a", 1)]
