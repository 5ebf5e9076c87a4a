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


def test_run_pipeline_scrub_flag(spark, tmp_path):
    """scrub=True redacts planted PII in the pipeline output; default
    leaves extracted text byte-identical (the north-rule invariant)."""
    from pyspark.sql import functions as F

    from gujarati_readability_pagewise_spark.plans.pipeline import run_pipeline
    from gujarati_readability_pagewise_spark.sources.pages import gen_pages_pdf

    pdf = gen_pages_pdf(24, seed=5, corrupt_frac=0.0)
    pages = spark.createDataFrame(pdf).withColumn(
        "html",
        F.concat(
            F.col("html").cast("string"),
            F.lit("<p>mail me leak.address@example-leak.org and more words here"
                  " to keep the block long enough to survive scoring</p>"),
        ).cast("binary"),
    )
    out = run_pipeline(spark, pages, str(tmp_path / "plain"), n_buckets=4)
    assert out["rows_out"] == 24
    plain = spark.read.parquet(str(tmp_path / "plain" / "extracted"))
    assert plain.filter(F.col("text").contains("leak.address@")).count() > 0

    out2 = run_pipeline(spark, pages, str(tmp_path / "scrubbed"), n_buckets=4, scrub=True)
    assert out2["rows_out"] == 24
    red = spark.read.parquet(str(tmp_path / "scrubbed" / "extracted"))
    assert red.filter(F.col("text").contains("leak.address@")).count() == 0
    assert red.filter(F.col("text").contains("<EMAIL>")).count() > 0
