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


def test_corpus_release_end_to_end(spark, tmp_path):
    """plans/release: curation drops the planted garbage doc, verified
    near-dup removal keeps exactly one of a planted near-identical pair,
    the scrub redacts planted PII at the fixpoint, packing coordinates
    are consistent, and the whole release is deterministic (re-run
    produces identical rows)."""
    from pyspark.sql import functions as F

    from gujarati_readability_pagewise_spark.plans.release import run_release

    base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    src = base.filter(F.col("doc_id") < 60).select("doc_id", "text")
    dup = base.filter(F.col("doc_id") == 3).select(
        (F.col("doc_id") + 10000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" tiny tail")).alias("text"),
    )
    extra = spark.createDataFrame(
        [
            (20001, "#### !!!! ???? @@@@ %%%% ^^^^ &&&& **** (((( ))))"
                     " $$$$ #### !!!! ???? @@@@ %%%%"),  # garbage: fails quality
            (20002, "write to someone@example-mail.org and 10.1.2.3,10.1.2.4 "
                     "about the well written and pleasantly long document that "
                     "keeps a perfectly ordinary words ratio across all of its "
                     "many plain sentences. it continues with more ordinary "
                     "text so the length band and quality threshold pass."),
        ],
        "doc_id long, text string",
    )
    docs = src.unionByName(dup).unionByName(extra)
    out = str(tmp_path / "rel")
    res = run_release(spark, docs, out, job_id="rel-test")
    assert res["n_input"] >= res["n_curated"] >= res["n_survivors"] == res["n_released"]
    rel = spark.read.parquet(f"{out}/released")
    ids = {r["doc_id"] for r in rel.select("doc_id").collect()}
    assert 20001 not in ids  # garbage culled by quality rule
    # near-dup pair: exactly one of (3, 10003) survives
    assert len({3, 10003} & ids) == 1
    assert 20002 in ids  # crafted to pass every curation rule
    row = rel.filter("doc_id = 20002").first()
    assert "someone@example-mail.org" not in row["text"]
    assert "<EMAIL>" in row["text"]
    assert "10.1.2.3" not in row["text"] and "10.1.2.4" not in row["text"]
    pk = rel.select("doc_id", "cum_before", "start_chunk", "end_chunk").collect()
    assert all(r["start_chunk"] <= r["end_chunk"] for r in pk)
    # deterministic re-run
    out2 = str(tmp_path / "rel2")
    run_release(spark, docs, out2, job_id="rel-test-2")
    a = sorted(map(tuple, rel.select("doc_id", "text", "start_chunk").collect()))
    b = sorted(
        map(
            tuple,
            spark.read.parquet(f"{out2}/released")
            .select("doc_id", "text", "start_chunk")
            .collect(),
        )
    )
    assert a == b
    funnel = {r["stage"]: r["n"] for r in spark.read.parquet(f"{out}/funnel").collect()}
    assert funnel["n_input"] == docs.count()


def test_corpus_release_span_cutting_stage(spark, tmp_path):
    """With cut_spans_window set, a paragraph copied between two
    otherwise-distinct surviving docs is removed from the later one and
    the funnel records the cut volume."""
    from pyspark.sql import functions as F

    from gujarati_readability_pagewise_spark.plans.release import run_release

    base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    src = base.filter(F.col("doc_id") < 40).select("doc_id", "text")
    # plant a 60-char paragraph into two docs far enough apart in content
    para = "this exact shared paragraph is certainly longer than forty chars."
    planted = src.withColumn(
        "text",
        F.when(
            F.col("doc_id").isin(7, 23),
            F.concat(F.col("text"), F.lit(" "), F.lit(para)),
        ).otherwise(F.col("text")),
    )
    out = str(tmp_path / "rel")
    res = run_release(spark, planted, out, cut_spans_window=40, job_id="rel-cut")
    assert res.get("n_span_cut_chars", 0) > 0
    rel = spark.read.parquet(f"{out}/released")
    kept = {r["doc_id"]: r["text"] for r in rel.collect()}
    if 7 in kept and 23 in kept:  # both survived doc-level dedup
        assert para in kept[7]       # first occurrence keeps the paragraph
        assert para not in kept[23]  # later copy cut


def test_corpus_release_string_keyed_corpus(spark, tmp_path):
    """run_release on a URL-keyed corpus (key_col='url') — the release_job
    shape the round-4 advice flagged: packing's string-key path must
    carry the whole chain end to end, with coordinates matching the
    UTF-8-binary-order prefix sum over the released docs."""
    from pyspark.sql import functions as F

    from gujarati_readability_pagewise_spark.plans.release import run_release

    base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs = base.filter(F.col("doc_id") < 80).select(
        F.concat(
            F.lit("https://"), F.col("source"),
            F.lit(".example.com/doc/"), F.col("doc_id").cast("string"),
        ).alias("url"),
        "text",
    )
    out = str(tmp_path / "rel_url")
    res = run_release(spark, docs, out, key_col="url", job_id="rel-url")
    assert res["n_released"] > 0
    rel = spark.read.parquet(f"{out}/released").select(
        "url", "text", "cum_before"
    ).collect()
    acc = 0
    for r in sorted(rel, key=lambda r: r["url"].encode("utf-8")):
        assert r["cum_before"] == acc
        acc += 0 if not r["text"].strip() else len(r["text"].split())
