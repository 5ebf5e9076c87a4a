"""Bounded-concurrency async fan-out inside partitions (SURVEY.md §2.9 E6).

The reference's VLM-judge fans every page crop out to an LLM with an
asyncio queue, 32 workers, a semaphore and tenacity exponential backoff
(``/root/reference/quality_analysis_gemini/document_quality_analyzer.py:356-418,510-593``).
The Spark-native shape: ``mapInPandas`` where each partition runs its OWN
bounded event loop — cluster-wide concurrency = partitions × per-partition
limit, rate control stays local, and a worker failure is a task retry.

The client is injected (an ``async (row_dict) -> result`` callable) so
tests drive the machinery with a fake; no network code lives here.
"""

from __future__ import annotations

import asyncio
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame

__all__ = ["async_fanout"]


def async_fanout(
    df: DataFrame,
    judge: Callable,
    out_schema: str,
    result_col: str = "result",
    concurrency: int = 8,
    max_retries: int = 3,
    base_delay: float = 0.05,
) -> DataFrame:
    """Apply ``await judge(row_dict) -> str`` to every row, bounded + retried.

    Output = input columns named in ``out_schema`` plus ``result_col`` and
    ``attempts``.  Exponential backoff (base_delay · 2^attempt); a row that
    exhausts retries yields result NULL rather than failing the batch (the
    engine's never-fail-the-batch policy).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        async def one(sem: asyncio.Semaphore, row: dict) -> tuple[str | None, int]:
            async with sem:
                for attempt in range(max_retries + 1):
                    try:
                        return await judge(row), attempt + 1
                    except Exception:
                        if attempt == max_retries:
                            return None, attempt + 1
                        await asyncio.sleep(base_delay * (2**attempt))
            return None, max_retries + 1

        async def drive(rows: list[dict]) -> list[tuple[str | None, int]]:
            sem = asyncio.Semaphore(concurrency)
            return await asyncio.gather(*[one(sem, r) for r in rows])

        for pdf in batches:
            rows = pdf.to_dict("records")
            results = asyncio.run(drive(rows))
            out = pdf.copy()
            out[result_col] = [r[0] for r in results]
            out["attempts"] = [r[1] for r in results]
            yield out

    return df.mapInPandas(run, schema=out_schema)
