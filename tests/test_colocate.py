"""Bucketed co-located join must plan with ZERO Exchange (no shuffle)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from gujarati_readability_pagewise_spark.operators.colocate import (
    read_bucketed,
    write_bucketed,
)


@pytest.fixture()
def two_bucketed_tables(spark, tmp_path):
    spark.sql("CREATE DATABASE IF NOT EXISTS colo_test")
    pages = spark.range(0, 2000).select(
        F.concat(F.lit("https://h"), (F.col("id") % 7).cast("string"),
                 F.lit(".example.com/"), F.col("id").cast("string")).alias("url"),
        (F.col("id") % 100).alias("score"),
    )
    labels = pages.select("url", (F.col("score") > 50).cast("int").alias("label"))
    write_bucketed(pages, "colo_test.pages_b", key="url", n_buckets=8)
    write_bucketed(labels, "colo_test.labels_b", key="url", n_buckets=8)
    yield "colo_test.pages_b", "colo_test.labels_b"
    spark.sql("DROP TABLE IF EXISTS colo_test.pages_b")
    spark.sql("DROP TABLE IF EXISTS colo_test.labels_b")


def test_bucketed_join_has_no_exchange(spark, two_bucketed_tables):
    t1, t2 = two_bucketed_tables
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_smj = spark.conf.get("spark.sql.join.preferSortMergeJoin")
    try:
        # force a sort-merge join so the elided exchange is what we prove
        # (the session default now allows shuffled hash joins)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.join.preferSortMergeJoin", "true")
        joined = read_bucketed(spark, t1).join(read_bucketed(spark, t2), "url")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        assert joined.count() == 2000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.conf.set("spark.sql.join.preferSortMergeJoin", old_smj)


def test_bucketed_aggregation_has_no_exchange(spark, two_bucketed_tables):
    t1, _ = two_bucketed_tables
    agg = read_bucketed(spark, t1).groupBy("url").agg(F.sum("score").alias("s"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert agg.count() == 2000
