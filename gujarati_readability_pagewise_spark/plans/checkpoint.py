"""Per-bucket checkpointed, resumable batch execution (north_rule).

The reference resumes by re-discovering the newest artifact directory by
mtime (``/root/reference/scripts/train_pagewise_xgboost.py:88-92`` glob +
latest).  At crawl scale that becomes:

* deterministic **url-hash bucketing**: ``bucket = pmod(xxhash64(url), B)``;
* **idempotent per-bucket writes**: output parquet partitioned by bucket,
  dynamic-partition-overwrite so a re-run of bucket k replaces exactly
  bucket k (no duplicates on retry);
* a **manifest table** appended one row per completed bucket with lineage
  + row/byte metrics (the north_rule's "per-partition lineage + metrics");
* **resume** = read manifest, subtract completed buckets, process the rest.

The completed-bucket set is tiny (≤ B rows) so resume filtering is a
driver-side ``isin`` — which Catalyst turns into partition pruning against
the bucketed input, not an anti-join shuffle.
"""

from __future__ import annotations

import os
import time
from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["bucket_expr", "completed_buckets", "run_checkpointed", "read_manifest"]

MANIFEST_SCHEMA = (
    "bucket int, n_rows bigint, n_text_bytes bigint, n_input_bytes bigint, "
    "wall_sec double, job_id string, finished_at timestamp, transform_id string"
)


def bucket_expr(url_col: Column, n_buckets: int) -> Column:
    return F.pmod(F.xxhash64(url_col), F.lit(n_buckets)).cast("int")


def read_manifest(spark: SparkSession, manifest_dir: str) -> DataFrame:
    # Probe the filesystem first: a fresh job has no manifest yet, and
    # letting the parquet reader discover that logs a scary (but benign)
    # path-not-found WARN on every cold start.  The try remains for
    # non-local filesystems where os.path can't see the dir.
    if "://" not in manifest_dir and not os.path.isdir(manifest_dir):
        return spark.createDataFrame([], MANIFEST_SCHEMA)
    try:
        return spark.read.schema(MANIFEST_SCHEMA).parquet(manifest_dir)
    except Exception:
        return spark.createDataFrame([], MANIFEST_SCHEMA)


def completed_buckets(spark: SparkSession, manifest_dir: str) -> set[int]:
    return {
        r["bucket"] for r in read_manifest(spark, manifest_dir).select("bucket").collect()
    }


def run_checkpointed(
    pages: DataFrame,
    transform: Callable[[DataFrame], DataFrame],
    out_dir: str,
    manifest_dir: str,
    n_buckets: int = 16,
    buckets_per_job: int = 4,
    job_id: str = "job",
    fail_after: int | None = None,
    transform_id: str = "",
) -> int:
    """Run ``transform`` over pages in bucket groups, checkpointing each.

    Returns the number of buckets processed this invocation.  A restarted
    call skips buckets present in the manifest — re-running a partially
    complete job is safe and exactly-once at bucket granularity.

    ``transform_id`` names the transform configuration (e.g. ``scrub=True``)
    and is stored per manifest row; resuming into a manifest written under a
    DIFFERENT recorded transform_id fails fast instead of silently producing
    a mixed corpus where completed buckets carry the old configuration's
    output.  Unrecorded ids — legacy manifests written before this field
    (NULL) and callers passing the default ``""`` — are treated as
    unverifiable-but-compatible: a legacy half-finished run stays resumable
    (the guard cannot prove a mismatch that was never recorded).

    ``fail_after`` (tests only) aborts after N groups to simulate a crash.
    """
    spark = pages.sparkSession
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    prior = {
        r["transform_id"]
        for r in read_manifest(spark, manifest_dir)
        .select("transform_id")
        .distinct()
        .collect()  # bounded: one row per distinct config ever written
    } - {None, ""}  # unrecorded ids cannot prove a mismatch
    if prior and transform_id and prior != {transform_id}:
        raise ValueError(
            f"manifest at {manifest_dir} was written with transform_id="
            f"{sorted(prior)!r}; resuming with "
            f"{transform_id!r} would mix configurations — use a fresh "
            "out_root/manifest or re-run with the original settings"
        )
    done = completed_buckets(spark, manifest_dir)
    todo = [b for b in range(n_buckets) if b not in done]
    bucketed = pages.withColumn("bucket", bucket_expr(F.col("url"), n_buckets))
    processed = 0
    for g in range(0, len(todo), buckets_per_job):
        group = todo[g : g + buckets_per_job]
        t0 = time.time()
        part = bucketed.filter(F.col("bucket").isin(group))
        result = transform(part)
        if "bucket" not in result.columns:
            result = result.withColumn("bucket", bucket_expr(F.col("url"), n_buckets))
        # idempotent: overwrite exactly the bucket partitions in `group`
        result.write.mode("overwrite").partitionBy("bucket").parquet(out_dir)
        # Manifest stats come from reading the JUST-WRITTEN bucket
        # partitions back (partition-pruned, 3 columns) — never from
        # re-running `transform`, whose kernel is the expensive stage and
        # must execute exactly once per row (asserted by accumulator in
        # tests).  An Observation riding the write would also work but
        # instantiates the session's non-serializable ObservationManager,
        # which poisons any later closure that captures the session (e.g.
        # Spark ML training summaries).
        written = spark.read.parquet(out_dir).filter(F.col("bucket").isin(group))
        stats = (
            written.groupBy("bucket")
            .agg(
                F.count("*").alias("n_rows"),
                F.sum(F.length("text")).alias("n_text_bytes"),
                F.sum("n_bytes").alias("n_input_bytes"),
            )
            .collect()
        )
        wall = time.time() - t0
        rows = [
            (
                int(s["bucket"]),
                int(s["n_rows"]),
                int(s["n_text_bytes"] or 0),
                int(s["n_input_bytes"] or 0),
                float(wall / max(len(group), 1)),
                job_id,
                transform_id,
            )
            for s in stats
        ]
        spark.createDataFrame(
            rows,
            "bucket int, n_rows bigint, n_text_bytes bigint, n_input_bytes bigint, "
            "wall_sec double, job_id string, transform_id string",
        ).withColumn("finished_at", F.current_timestamp()).write.mode("append").parquet(
            manifest_dir
        )
        processed += len(group)
        if fail_after is not None and processed >= fail_after:
            raise RuntimeError(f"simulated crash after {processed} buckets")
    return processed
