"""Snapshot tables: versioning, atomic pointer, time travel."""

import pytest
from pyspark.sql import functions as F

from gujarati_readability_pagewise_spark.plans.snapshots import (
    latest_version,
    list_versions,
    read_latest,
    read_snapshot,
    write_snapshot,
)


def test_snapshot_versioning_and_latest(spark, tmp_path):
    t = str(tmp_path / "tbl")
    df1 = spark.range(10).withColumn("tag", F.lit("v1"))
    df2 = spark.range(20).withColumn("tag", F.lit("v2"))
    assert latest_version(t) is None
    with pytest.raises(FileNotFoundError):
        read_latest(spark, t)
    assert write_snapshot(df1, t) == 1
    assert write_snapshot(df2, t) == 2
    assert list_versions(t) == [1, 2]
    latest = read_latest(spark, t)
    assert latest.count() == 20
    assert latest.select("tag").distinct().collect()[0]["tag"] == "v2"
    # time travel: the old snapshot is still intact
    old = read_snapshot(spark, t, 1)
    assert old.count() == 10


def test_scd2_history_collapses_unchanged_fetches(spark):
    """SCD2: consecutive unchanged fingerprints collapse into one validity
    period; valid_to chains to the next version; the last version is
    current."""
    import pandas as pd

    from pyspark.sql import functions as F
    from gujarati_readability_pagewise_spark.plans.snapshots import scd2_history

    rows = [
        # url A: v1 at t1-t2 (t2 unchanged -> collapsed), v2 at t3
        ("a", 1, "x"), ("a", 2, "x"), ("a", 3, "y"),
        # url B: never changes -> one open-ended version
        ("b", 1, "z"), ("b", 2, "z"),
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["url", "fetch_ts", "fp"]))
    out = scd2_history(df, "url", "fetch_ts", "fp").orderBy("url", "version").collect()
    a = [r for r in out if r["url"] == "a"]
    b = [r for r in out if r["url"] == "b"]
    assert [(r["version"], r["fp"], r["valid_from"], r["valid_to"], r["is_current"]) for r in a] == [
        (1, "x", 1, 3, 0),
        (2, "y", 3, None, 1),
    ]
    assert [(r["version"], r["fp"], r["valid_to"], r["is_current"]) for r in b] == [
        (1, "z", None, 1)
    ]


def test_expire_snapshots_keeps_newest_and_current(spark, tmp_path):
    """Retention GC removes only versions behind the keep window, never
    the committed pointer's version; reads of the current version are
    unaffected."""
    from gujarati_readability_pagewise_spark.plans.snapshots import (
        expire_snapshots,
        list_versions,
        read_latest,
        write_snapshot,
    )

    t = str(tmp_path / "tbl")
    for i in range(5):
        write_snapshot(spark.range(i, i + 10).toDF("id"), t)
    assert sorted(list_versions(t)) == [1, 2, 3, 4, 5]
    removed = expire_snapshots(t, keep_n=2)
    assert removed == [1, 2, 3]
    assert sorted(list_versions(t)) == [4, 5]
    assert read_latest(spark, t).count() == 10
    # keep_n larger than history: no-op
    assert expire_snapshots(t, keep_n=10) == []


def test_compact_snapshot_rewrites_atomically(spark, tmp_path):
    """Compaction rewrites the current snapshot into few files as a NEW
    version (old version intact until expired); content identical."""
    import glob

    from gujarati_readability_pagewise_spark.plans.snapshots import (
        compact_snapshot,
        latest_version,
        read_latest,
        read_snapshot,
        write_snapshot,
    )

    t = str(tmp_path / "tbl")
    frag = spark.range(0, 1000).repartition(37).toDF("id")
    v1 = write_snapshot(frag, t)
    assert len(glob.glob(f"{t}/v={v1}/part-*")) == 37
    v2 = compact_snapshot(spark, t, target_files=3)
    assert v2 == v1 + 1 and latest_version(t) == v2
    assert len(glob.glob(f"{t}/v={v2}/part-*")) <= 3
    a = sorted(r["id"] for r in read_snapshot(spark, t, v1).collect())
    b = sorted(r["id"] for r in read_latest(spark, t).collect())
    assert a == b
