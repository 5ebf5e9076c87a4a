"""End-to-end production pipeline: extract -> salted summary -> metrics -> snapshot."""

from pyspark.sql import functions as F

from gujarati_readability_pagewise_spark.plans.pipeline import run_pipeline
from gujarati_readability_pagewise_spark.plans.snapshots import read_latest
from gujarati_readability_pagewise_spark.plans.reports import read_metrics
from gujarati_readability_pagewise_spark.sources.pages import gen_labels_pdf


def test_run_pipeline_end_to_end(spark, pages_df, pages_pdf, tmp_path):
    out = str(tmp_path / "job")
    labels = spark.createDataFrame(gen_labels_pdf(pages_pdf, seed=42))
    res = run_pipeline(spark, pages_df, out, labels=labels, n_buckets=8, job_id="jt")
    assert res["rows_out"] == len(pages_pdf)
    assert res["buckets_processed"] == 8
    assert res["salted_aggregation"] == 1.0  # the 32% host triggers salting
    assert res["accuracy"] > 0.8
    # artifacts on disk
    summary = spark.read.parquet(out + "/host_summary")
    assert summary.filter(F.col("host") == "big.example.gu").count() == 1
    m = read_metrics(spark, out + "/metrics")
    assert m.filter(F.col("job_id") == "jt").count() >= 8
    snap = read_latest(spark, out + "/extracted_snapshots")
    assert snap.count() == len(pages_pdf)
    assert res["snapshot"] == 1
