"""Bucketed-table co-location: shuffle-free joins on a pre-declared key.

At 10^12 rows the dominant cost of url-keyed joins (pages ⋈ labels,
pages ⋈ dedup-verdicts, re-crawl diffs) is the exchange of the big side.
Spark's bucketed tables eliminate it: both sides are written with
``bucketBy(N, key)`` (+ ``sortBy`` so sort-merge join needs no sort
either), and the join plans as a zero-Exchange SortMergeJoin — each task
reads bucket i of both tables (`tests/test_colocate.py` asserts the plan
has no Exchange).

This is the table-layout counterpart of the runtime bucketing in
``plans/checkpoint`` (which buckets by ``pmod(xxhash64(url), N)`` for
resumable writes): declare the partitioning once at write time, reuse it
across every downstream join/aggregation on the same key.  The reference
has no analogue — its joins are single-process pandas merges
(``/root/reference/scripts/predict_single_book.py:353-359``); this is what
those merges must become at crawl scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed", "read_bucketed"]


def write_bucketed(
    df: DataFrame,
    table_name: str,
    key: str = "url",
    n_buckets: int = 64,
    sort: bool = True,
) -> None:
    """Persist `df` as a bucketed (and bucket-sorted) parquet table.

    ``n_buckets`` must match across tables that will be joined — Spark
    only elides the exchange when both sides agree on (key, n_buckets).
    """
    w = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table_name)


def read_bucketed(spark: SparkSession, table_name: str) -> DataFrame:
    """Read back with bucketing metadata intact (plain ``spark.table``;
    reading the files by path would drop the bucket spec)."""
    return spark.table(table_name)
