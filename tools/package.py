"""Build the --py-files artifact for cluster submission (north_rule:
"launched via spark-submit --py-files on multi-executor clusters").

Usage::

    python tools/package.py                 # -> dist/engine.zip
    spark-submit --py-files dist/engine.zip \
        --conf spark.sql.adaptive.enabled=true \
        --conf spark.sql.adaptive.skewJoin.enabled=true \
        your_job.py

The zip contains the ``gujarati_readability_pagewise_spark`` package only —
pure Python + numpy/pandas usage, no native extensions, so one artifact
serves every executor image that has pyspark's own deps.
"""

from __future__ import annotations

import sys
import zipfile
from pathlib import Path

PKG = "gujarati_readability_pagewise_spark"


def build(repo_root: Path | None = None, out: Path | None = None) -> Path:
    root = repo_root or Path(__file__).resolve().parent.parent
    out = out or root / "dist" / "engine.zip"
    out.parent.mkdir(parents=True, exist_ok=True)
    src = root / PKG
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for p in sorted(src.rglob("*.py")):
            z.write(p, p.relative_to(root))
    return out


if __name__ == "__main__":
    path = build()
    n = len(zipfile.ZipFile(path).namelist())
    print(f"{path} ({n} modules)")
    sys.exit(0)
