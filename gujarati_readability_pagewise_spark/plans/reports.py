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

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

__all__ = [
    "write_metrics",
    "read_metrics",
    "write_book_report",
    "roc_points",
    "prediction_histogram",
    "prediction_scatter",
    "cv_results_table",
    "feature_importance_table",
]

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


# -- plot-data sinks (K5 data half) ------------------------------------------
# The reference renders 4 PNGs per experiment + 3 analysis plots
# (train_pagewise_xgboost.py:353-464, plot_prediction_distribution_general.py:
# 97-263).  matplotlib is absent here by design; the faithful engine-side
# equivalent is the AGGREGATE each plot consumes, written as a tidy
# DataFrame a notebook can render.  Each is a report-scale aggregate: the
# heavy work (scoring) is distributed; the output is thousands of rows.


def roc_points(
    scored: DataFrame,
    label_col: str = "label",
    score_col: str = "p_nonreadable",
    pos_label: int = 0,
) -> DataFrame:
    """ROC curve points: (threshold, cum_tp, cum_fp, tpr, fpr).

    sklearn ``roc_curve(y, p, pos_label=0)`` semantics (the reference's
    non-readable-positive convention, train_pagewise_xgboost.py:388-405):
    one point per distinct score, prediction positive iff score ≥ threshold.
    Distributed shape: per-score partial aggregation first (the shuffle
    carries one row per distinct score), then a BUCKETED prefix-sum over
    the sorted scores (the ``distributed_rank`` pattern from
    operators/aggregate): an unpartitioned cumulative window would move
    every distinct score to ONE partition — fine for an RF's ~hundreds of
    distinct probabilities, a driver-shaped bottleneck for near-unique
    float scores at 100×.  Here each score-range bucket cumulates in
    parallel and per-bucket totals (a tiny driver list) provide the
    offsets; values are exact integer arithmetic either way.  Class totals
    join as a 1-row broadcast."""
    d = scored.select(
        (F.col(label_col) == pos_label).cast("long").alias("pos"),
        F.col(score_col).cast("double").alias("score"),
    )
    agg = d.groupBy("score").agg(
        F.sum("pos").alias("n_pos"),
        F.sum(1 - F.col("pos")).alias("n_neg"),
    )
    n_buckets = 64
    bounds = sorted(
        set(agg.approxQuantile("score", [i / n_buckets for i in range(1, n_buckets)], 0.001))
    )
    bkt = F.lit(0)
    for bound in bounds:  # monotone in score; ties share a bucket
        bkt = bkt + F.when(F.col("score") > F.lit(bound), 1).otherwise(0)
    bucketed = agg.withColumn("_bkt", bkt)
    # suffix offsets: bucket b's cumsum starts after every HIGHER-score bucket
    totals_by_bkt = {
        r["_bkt"]: (r["tp"], r["fp"])
        for r in bucketed.groupBy("_bkt")
        .agg(F.sum("n_pos").alias("tp"), F.sum("n_neg").alias("fp"))
        .collect()  # bounded: ≤ n_buckets rows
    }
    off, tp_acc, fp_acc = {}, 0, 0
    for b in sorted(totals_by_bkt, reverse=True):
        off[b] = (tp_acc, fp_acc)
        tp_acc += totals_by_bkt[b][0]
        fp_acc += totals_by_bkt[b][1]
    off_df = agg.sparkSession.createDataFrame(
        [(b, t, f) for b, (t, f) in off.items()],
        "_bkt int, _tp_off bigint, _fp_off bigint",
    )
    w = (
        W.partitionBy("_bkt")
        .orderBy(F.desc("score"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = (
        bucketed.join(F.broadcast(off_df), "_bkt")
        .select(
            F.col("score").alias("threshold"),
            (F.sum("n_pos").over(w) + F.col("_tp_off")).alias("cum_tp"),
            (F.sum("n_neg").over(w) + F.col("_fp_off")).alias("cum_fp"),
        )
    )
    totals = F.broadcast(
        d.agg(F.sum("pos").alias("tot_p"), F.sum(1 - F.col("pos")).alias("tot_n"))
    )
    return (
        cum.crossJoin(totals)  # 1-row scalar broadcast, same as tpch_q22
        .select(
            "threshold",
            "cum_tp",
            "cum_fp",
            (F.col("cum_tp") / F.col("tot_p")).alias("tpr"),
            (F.col("cum_fp") / F.col("tot_n")).alias("fpr"),
        )
        .orderBy(F.desc("threshold"))
    )


def prediction_histogram(
    scored: DataFrame,
    label_col: str = "label",
    proba_col: str = "p_nonreadable",
    bins: int = 20,
) -> DataFrame:
    """Per-true-label probability histogram — the data behind
    prediction_distribution_histograms.png (plot_prediction_distribution_
    general.py:170-185): 20 equal bins over [0, 1], one count row per
    (true_label, bin).  One hash aggregation; map-side combinable."""
    b = F.least(F.floor(F.col(proba_col) * bins).cast("int"), F.lit(bins - 1))
    return (
        scored.groupBy(F.col(label_col).alias("true_label"), b.alias("bin"))
        .agg(F.count("*").alias("n"))
        .select(
            "true_label",
            "bin",
            (F.col("bin").cast("double") / bins).alias("bin_lo"),
            ((F.col("bin") + 1).cast("double") / bins).alias("bin_hi"),
            "n",
        )
        .orderBy("true_label", "bin")
    )


def prediction_scatter(
    scored: DataFrame,
    label_col: str = "label",
    proba_col: str = "p_nonreadable",
    seed: int = 42,
) -> DataFrame:
    """F6: the jittered scatter points behind the predictions-vs-labels
    plot (plot_prediction_distribution_general.py:125-126): x = label +
    N(0, 0.05), y = proba + N(0, 0.02).  Seeded ``randn`` — deterministic
    per partition layout, pure expression."""
    return scored.select(
        F.col(label_col).alias("true_label"),
        (F.col(label_col) + F.randn(seed) * 0.05).alias("x_jitter"),
        (F.col(proba_col) + F.randn(seed + 1) * 0.02).alias("y_jitter"),
    )


def cv_results_table(spark: SparkSession, results: list[dict]) -> DataFrame:
    """Grid-search CV results as a tidy table — the data behind
    hyperparameter_search.png (train_pagewise_xgboost.py:407-456): one row
    per parameter combination with its mean CV score.  Driver-side by
    design (the grid is tiny); only the folds' training was distributed."""
    score_keys = [k for k in results[0] if k.startswith("mean_")]
    score_key = score_keys[0]
    rows = [
        (
            i,
            "; ".join(f"{k}={r[k]}" for k in sorted(r) if not k.startswith("mean_")),
            float(r[score_key]),
        )
        for i, r in enumerate(results)
    ]
    return spark.createDataFrame(
        rows, "combo_idx int, params string, mean_score double"
    )


def feature_importance_table(spark: SparkSession, model) -> DataFrame:
    """Feature importances as a tidy table — the data behind
    feature_importance.png (train_pagewise_xgboost.py:363-370).  ``model``
    is the numpy RandomForest (A8 split-count importances)."""
    from ..functions.features import FEATURE_NAMES

    imps = model.feature_importances_()
    rows = [
        (i, FEATURE_NAMES[i] if i < len(FEATURE_NAMES) else f"f{i}", float(v))
        for i, v in enumerate(imps)
    ]
    return spark.createDataFrame(
        rows, "feature_idx int, feature string, importance double"
    ).orderBy(F.desc("importance"), F.asc("feature_idx"))
