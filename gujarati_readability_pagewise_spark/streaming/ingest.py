"""Structured-Streaming ingest for a live crawl feed (optional surface).

The reference is strictly batch (SURVEY.md §2.10) — its nearest streaming
shape is the asyncio producer/consumer queue in the DQA module
(``document_quality_analyzer.py:510-593``).  The graft records the natural
Spark mapping for a crawl feed:

* ``readStream`` over the pages source (parquet dir here; Kafka in prod),
* recrawl dedup: ``withWatermark(warc_ts) + dropDuplicates([url])`` —
  state is bounded by the watermark horizon,
* windowed per-host arrival counts (the monitoring aggregate),
* the same Arrow extraction kernel applied per micro-batch via
  ``foreachBatch`` (exactly-once with an idempotent bucket sink).

Tests drive these with the memory sink + ``processAllAvailable()``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.pages import PAGES_SCHEMA_DDL

__all__ = ["stream_pages", "dedup_recrawls", "windowed_host_counts", "stream_extract"]


def stream_pages(spark: SparkSession, src_dir: str) -> DataFrame:
    return (
        spark.readStream.schema(PAGES_SCHEMA_DDL)
        .option("maxFilesPerTrigger", 4)
        .parquet(src_dir)
    )


def dedup_recrawls(pages: DataFrame, horizon: str = "1 hour") -> DataFrame:
    """Keep the first sighting of each url within the watermark horizon."""
    return pages.withWatermark("warc_ts", horizon).dropDuplicates(["url"])


def windowed_host_counts(
    pages: DataFrame, window: str = "10 minutes", slide: str | None = None
) -> DataFrame:
    host = F.parse_url(F.col("url"), F.lit("HOST")).alias("host")
    w = F.window("warc_ts", window, slide) if slide else F.window("warc_ts", window)
    return (
        pages.withWatermark("warc_ts", "1 hour")
        .groupBy(w.alias("win"), host)
        .agg(F.count("*").alias("n_pages"), F.sum(F.length("html")).alias("n_bytes"))
    )


def running_host_totals(pages: DataFrame) -> DataFrame:
    """Custom stateful operator: cumulative per-host page/byte totals.

    ``applyInPandasWithState`` keeps one tiny state row per host across
    micro-batches — the engine's example of a custom stateful streaming
    operator (state bounded by #hosts, emitted every batch the host
    appears in)."""
    import pandas as pd

    host = F.parse_url(F.col("url"), F.lit("HOST")).alias("host")

    def update(key, pdfs, state):
        n, b = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            b += int(pdf["html"].map(lambda x: len(x) if x is not None else 0).sum())
        state.update((n, b))
        yield pd.DataFrame(
            {"host": [key[0]], "total_pages": [n], "total_bytes": [b]}
        )

    return (
        pages.select(host, "url", "html")
        .groupBy("host")
        .applyInPandasWithState(
            update,
            outputStructType="host string, total_pages bigint, total_bytes bigint",
            stateStructType="n bigint, b bigint",
            outputMode="update",
            timeoutConf="NoTimeout",
        )
    )


def stream_extract(
    pages: DataFrame,
    model,
    sink: Callable[[DataFrame, int], None],
):
    """Micro-batch extraction: the batch kernel inside foreachBatch.

    ``sink(batch_df, epoch_id)`` receives the scored frame; pair with the
    checkpointed bucket writer for exactly-once output.
    """
    from ..operators.udfs import with_extraction_and_score

    def run(batch_df: DataFrame, epoch_id: int) -> None:
        scored = with_extraction_and_score(batch_df, model, include_spans=False)
        sink(scored, epoch_id)

    return pages.writeStream.foreachBatch(run)
