"""The production job: end-to-end crawl extraction.

Run via ``python -m gujarati_readability_pagewise_spark.plans.pipeline
<pages_dir> <out_root>`` or, on a cluster, through the absolute-import
launcher ``jobs/extract_pipeline.py`` with ``spark-submit --py-files
dist/engine.zip`` (an application file cannot use relative imports).
One invocation:

1. reads the pages table (input_hint schema),
2. runs the checkpointed, bucketed extract+features+score stage
   (resume-safe: rerunning after a crash completes only missing buckets),
3. writes the host summary — through the SALTED two-stage aggregate when a
   heavy-hitter host is detected, directly otherwise,
4. appends eval metrics (if a labels table is given) and job metrics to
   the metrics table,
5. commits the extracted output as a new snapshot version.

This is SURVEY.md §7's target architecture as one runnable artifact.
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..ml.train import default_model
from ..operators.aggregate import binary_metrics, host_summary
from ..operators.skew import heavy_hitters, salted_summary
from ..operators.udfs import with_extraction_and_score
from .checkpoint import run_checkpointed
from .reports import write_metrics
from .snapshots import write_snapshot

__all__ = ["run_pipeline"]


def run_pipeline(
    spark: SparkSession,
    pages: DataFrame,
    out_root: str,
    labels: DataFrame | None = None,
    model=None,
    n_buckets: int = 16,
    job_id: str | None = None,
    scrub: bool = False,
) -> dict:
    """``scrub=True`` redacts email/IPv4/phone PII from the extracted text
    inside the same stage (functions/scrub).  Default OFF: the north-rule
    invariant is byte-identical extracted text per url, and redaction is a
    deliberate, opt-in deviation a corpus-release run turns on."""
    job_id = job_id or f"extract-{int(time.time())}"
    model = model or default_model()
    t0 = time.time()

    def _stage(df: DataFrame) -> DataFrame:
        out = with_extraction_and_score(df, model, include_spans=False)
        if scrub:
            from ..functions.scrub import scrub_pii

            out = out.withColumn("text", scrub_pii(F.col("text")))
        return out

    n_done = run_checkpointed(
        pages,
        _stage,
        out_dir=f"{out_root}/extracted",
        manifest_dir=f"{out_root}/manifest",
        n_buckets=n_buckets,
        job_id=job_id,
        # recorded per manifest row; a resume with a flipped scrub flag
        # fails fast instead of silently mixing redacted/raw buckets
        transform_id=f"scrub={scrub}",
    )
    scored = spark.read.parquet(f"{out_root}/extracted")

    hosts = scored.withColumn("host", F.parse_url("url", F.lit("HOST")))
    heavy = heavy_hitters(hosts, "host", min_share=0.2)
    if heavy.count() > 0:
        # hot host present → salted two-stage for the probability stats
        summary = salted_summary(hosts, "host", "p_nonreadable", n_salts=16)
        salted = True
    else:
        summary = host_summary(scored, label_col=None)
        salted = False
    summary.write.mode("overwrite").parquet(f"{out_root}/host_summary")

    metrics: dict[str, float] = {
        "buckets_processed": float(n_done),
        "rows_out": float(scored.count()),
        "wall_sec": time.time() - t0,
        "salted_aggregation": float(salted),
    }
    if labels is not None:
        labeled = scored.join(labels.select("url", "label"), "url", "left")
        metrics.update(binary_metrics(labeled))
    write_metrics(spark, metrics, job_id, f"{out_root}/metrics")
    snap = write_snapshot(scored, f"{out_root}/extracted_snapshots")
    return {"job_id": job_id, "snapshot": snap, **metrics}


def main(argv: list[str]) -> int:
    from ..session import get_spark

    pages_dir, out_root = argv[1], argv[2]
    spark = get_spark(app_name="pagewise-extraction-pipeline")
    pages = spark.read.parquet(pages_dir)
    result = run_pipeline(spark, pages, out_root)
    print({k: (round(v, 3) if isinstance(v, float) else v) for k, v in result.items()})
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
