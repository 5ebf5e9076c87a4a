"""Report & metrics sinks (SURVEY.md §2.1 K3/K4).

The reference writes ``results.json``, ``cv_results.csv``,
``performance_metrics.txt`` and a two-sheet Excel report
(``predict_single_book.py:424-429``: Page_Predictions + Summary).  The
graft's distributed analogue:

* ``write_metrics`` — a metrics **table** (parquet, appendable): one row
  per (job, metric), the queryable form of results.json (north_rule's
  metrics table);
* ``write_book_report`` — the two-sheet report: per-page predictions +
  per-host summary.  Excel if openpyxl is importable (it is not in this
  container), CSV otherwise — the layout is identical.

Driver-side by design: reports are small aggregates; only the aggregation
runs distributed.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["write_metrics", "read_metrics", "write_book_report"]

METRICS_SCHEMA = "job_id string, metric string, value double, created_at timestamp"


def write_metrics(
    spark: SparkSession, metrics: dict[str, float], job_id: str, path: str
) -> None:
    """Append one row per (job, metric).  ``path`` may be an Iceberg catalog
    ref (``cat.db.metrics`` — real transactional appends on a cluster, see
    sources/iceberg.py) or a filesystem dir (parquet append)."""
    from ..sources import iceberg as ice

    rows = [(job_id, k, float(v)) for k, v in metrics.items()]
    df = spark.createDataFrame(
        rows, "job_id string, metric string, value double"
    ).withColumn("created_at", F.current_timestamp())
    if ice.is_table_ref(path):
        ice.append_table(df, path)
    else:
        df.write.mode("append").parquet(path)


def read_metrics(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.schema(METRICS_SCHEMA).parquet(path)


def write_book_report(scored: DataFrame, summary: DataFrame, out_dir: str) -> dict[str, str]:
    """Two-sheet report: Page_Predictions + Summary (Excel or CSV fallback).

    `scored` should be pre-filtered to the report's host(s) — collecting an
    unfiltered crawl to the driver is the anti-pattern this module refuses
    to hide: it limits to 100k rows defensively.
    """
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    pages_pdf = (
        scored.select(
            "url", "extract_status", "pred_label", "p_nonreadable", "warc_ts"
        )
        .limit(100_000)
        .toPandas()
    )
    summary_pdf = summary.toPandas()
    try:  # openpyxl is not in this container; CSV is the live path
        import openpyxl  # noqa: F401

        xlsx = out / "report.xlsx"
        import pandas as pd

        with pd.ExcelWriter(xlsx, engine="openpyxl") as w:
            pages_pdf.to_excel(w, sheet_name="Page_Predictions", index=False)
            summary_pdf.to_excel(w, sheet_name="Summary", index=False)
        return {"format": "xlsx", "path": str(xlsx)}
    except ImportError:
        p1, p2 = out / "page_predictions.csv", out / "summary.csv"
        pages_pdf.to_csv(p1, index=False)
        summary_pdf.to_csv(p2, index=False)
        return {"format": "csv", "page_predictions": str(p1), "summary": str(p2)}
