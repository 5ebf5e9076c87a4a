from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")


@pytest.fixture(scope="session")
def spark():
    from gujarati_readability_pagewise_spark.session import get_spark

    s = get_spark(app_name="pytest", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def pages_pdf():
    from gujarati_readability_pagewise_spark.sources.pages import gen_pages_pdf

    return gen_pages_pdf(400, seed=42)


@pytest.fixture(scope="session")
def pages_df(spark, pages_pdf):
    from gujarati_readability_pagewise_spark.sources.pages import PAGES_SCHEMA_DDL

    return spark.createDataFrame(
        pages_pdf[["url", "warc_ts", "html", "text", "lang"]], schema=PAGES_SCHEMA_DDL
    )
