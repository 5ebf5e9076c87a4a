"""Report/metrics sinks: metrics table roundtrip, two-sheet report files."""

import csv
from pathlib import Path

from pyspark.sql import functions as F

from gujarati_readability_pagewise_spark.ml.train import default_model
from gujarati_readability_pagewise_spark.operators.aggregate import host_summary
from gujarati_readability_pagewise_spark.operators.udfs import (
    with_extraction_and_score,
)
from gujarati_readability_pagewise_spark.plans.reports import (
    read_metrics,
    write_book_report,
    write_metrics,
)


def test_metrics_table_roundtrip(spark, tmp_path):
    p = str(tmp_path / "metrics")
    write_metrics(spark, {"accuracy": 0.9, "f1_pos0": 0.8}, "job1", p)
    write_metrics(spark, {"accuracy": 0.95}, "job2", p)
    m = read_metrics(spark, p)
    assert m.count() == 3
    assert m.filter(
        (F.col("job_id") == "job1") & (F.col("metric") == "accuracy")
    ).collect()[0]["value"] == 0.9
    assert m.filter(F.col("created_at").isNotNull()).count() == 3


def test_book_report_two_sheets(spark, pages_df, tmp_path):
    scored = with_extraction_and_score(pages_df, default_model(), include_spans=False)
    one_host = scored.filter(F.col("url").contains("big.example.gu"))
    res = write_book_report(
        one_host, host_summary(one_host, label_col=None), str(tmp_path / "rep")
    )
    assert res["format"] == "csv"  # openpyxl absent in this container
    with open(res["page_predictions"]) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) > 50
    assert {"url", "pred_label", "p_nonreadable"} <= set(rows[0])
    with open(res["summary"]) as f:
        srows = list(csv.DictReader(f))
    assert len(srows) == 1 and srows[0]["host"] == "big.example.gu"
