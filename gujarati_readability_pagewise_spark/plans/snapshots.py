"""Versioned-snapshot tables: race-free "read the newest" (SURVEY.md §2.1 S6).

The reference discovers its newest artifacts by glob + max(mtime)
(``/root/reference/scripts/train_pagewise_xgboost.py:88-92``,
``predict_single_book.py:316-323``) — racy under concurrent writers and
clock skew.  The graft's replacement is a poor-man's Iceberg:

* each write lands in ``table_dir/v=<N>/`` (immutable once the pointer
  flips);
* ``_latest.json`` names the current version and is replaced via
  write-temp + ``os.replace`` (atomic on POSIX) — readers see either the
  old or the new snapshot, never a half-written one;
* time travel = ``read_snapshot(version=k)``.

(With real Iceberg jars on the classpath this module is replaced by
``spark.read.option('snapshot-id', ...)``; the contract is identical.)
"""

from __future__ import annotations

import json
import os
import time
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_snapshot", "read_latest", "read_snapshot", "list_versions", "latest_version"]


def _pointer(table_dir: str) -> Path:
    return Path(table_dir) / "_latest.json"


def latest_version(table_dir: str) -> int | None:
    p = _pointer(table_dir)
    if not p.exists():
        return None
    return int(json.loads(p.read_text())["version"])


def list_versions(table_dir: str) -> list[int]:
    d = Path(table_dir)
    if not d.exists():
        return []
    return sorted(
        int(c.name.split("=", 1)[1]) for c in d.iterdir() if c.name.startswith("v=")
    )


def write_snapshot(df: DataFrame, table_dir: str) -> int:
    """Write df as the next version and atomically flip the pointer."""
    cur = latest_version(table_dir)
    nxt = (cur or 0) + 1
    target = Path(table_dir) / f"v={nxt}"
    df.write.mode("overwrite").parquet(str(target))
    tmp = _pointer(table_dir).with_suffix(".json.tmp")
    tmp.write_text(
        json.dumps({"version": nxt, "path": str(target), "committed_at": time.time()})
    )
    os.replace(tmp, _pointer(table_dir))  # atomic flip
    return nxt


def read_snapshot(spark: SparkSession, table_dir: str, version: int) -> DataFrame:
    return spark.read.parquet(str(Path(table_dir) / f"v={version}"))


def read_latest(spark: SparkSession, table_dir: str) -> DataFrame:
    v = latest_version(table_dir)
    if v is None:
        raise FileNotFoundError(f"no committed snapshot in {table_dir}")
    return read_snapshot(spark, table_dir, v)
