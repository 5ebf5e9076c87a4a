"""spark-submit launcher for the extraction pipeline.

Usage::

    python tools/package.py
    spark-submit --master <cluster> --py-files dist/engine.zip \
        jobs/extract_pipeline.py <pages_parquet_dir> <out_root>

The application file must use absolute imports (spark-submit runs it as a
top-level script); the engine itself ships in the zip.
"""

import sys

from gujarati_readability_pagewise_spark.plans.pipeline import run_pipeline
from gujarati_readability_pagewise_spark.session import get_spark


def main(argv):
    pages_dir, out_root = argv[1], argv[2]
    spark = get_spark(app_name="pagewise-extraction-pipeline")
    result = run_pipeline(spark, spark.read.parquet(pages_dir), out_root)
    print(
        "PIPELINE_RESULT:",
        {k: (round(v, 3) if isinstance(v, float) else v) for k, v in result.items()},
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
