"""Dump .explain('formatted') for bench-suite queries to plans/r06/<name>_<tag>.txt.

Usage: python tools/dump_plans.py <tag> [query ...]
With no query names, dumps the full bench-suite list.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BENCH_QUERIES = [
    "tpch_q1", "a6_group_stats", "a7_two_level_rollup", "w1_latest_per_group",
    "w4_running_sum", "j2_left_join", "dedup_exact", "text_quality",
    "similarity_topk", "dedup_verified_pairs", "graph_pagerank",
    "corpus_curation", "gopher_repetition", "dedup_sentences",
    "histogram_quantiles", "dedup_exact_substr", "sequence_packing",
]


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or BENCH_QUERIES
    import __spark_entry__ as entrymod
    from gujarati_readability_pagewise_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r06")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name=f"plans-{tag}")
    qs = entrymod.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(plan)
        print(name, "->", f"{name}_{tag}.txt")
        spark.catalog.clearCache()
    # the extraction kernel (not a declared query; the bench's scaling rows)
    from gujarati_readability_pagewise_spark.ml.train import default_model
    from gujarati_readability_pagewise_spark.operators.udfs import with_extraction_and_score
    from gujarati_readability_pagewise_spark.sources.catalog import pages_from_documents
    if not sys.argv[2:]:
        pages = pages_from_documents(spark, sf_dir, replicate=1, n_partitions=32)
        scored = with_extraction_and_score(pages, default_model(), include_spans=False)
        plan = scored._sc._jvm.PythonSQLUtils.explainString(scored._jdf.queryExecution(), "formatted")
        with open(os.path.join(out_dir, f"extract_score_kernel_{tag}.txt"), "w") as f:
            f.write(plan)
        print("extract_score_kernel ->", f"extract_score_kernel_{tag}.txt")
    spark.stop()


if __name__ == "__main__":
    main()
