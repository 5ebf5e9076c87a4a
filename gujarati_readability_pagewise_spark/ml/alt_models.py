"""The reference's full classifier family on Spark ML: RF / SVM / boosted.

The reference trains three interchangeable classifiers over the same
feature matrix — RandomForest (``/root/reference/scripts/
train_pagewise_rf.py:189``), an SVM behind a fitted StandardScaler
(``train_pagewise_svm.py:178-179`` persists model + ``feature_scaler.pkl``),
and XGBoost (``train_pagewise_xgboost.py:283-287``).  The graft's numpy RF
(``ml/rf.py``) is the broadcast-scoring hot path; this module provides the
other two families as Spark ML estimators so a reference user keeps their
model menu:

* ``rf``          → ``RandomForestClassifier``
* ``linear_svc``  → ``StandardScaler + LinearSVC`` pipeline (the scaler is
  part of the persisted model, exactly like the reference's scaler.pkl)
* ``gbt``         → ``GBTClassifier`` (gradient-boosted trees — Spark's
  native analogue of the XGBoost trainer)

All take a DataFrame with ``features: array<double>`` + an int/double
label, train distributed, persist via Spark ML ``save``/``load``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["FAMILIES", "train_classifier", "evaluate_accuracy"]

FAMILIES = ("rf", "linear_svc", "gbt")


def _prep(features_df: DataFrame, features_col: str, label_col: str) -> DataFrame:
    from pyspark.ml.functions import array_to_vector

    return features_df.select(
        array_to_vector(F.col(features_col).cast("array<double>")).alias("features"),
        F.col(label_col).cast("double").alias("label"),
    )


def train_classifier(
    features_df: DataFrame,
    family: str = "rf",
    features_col: str = "features",
    label_col: str = "label",
    seed: int = 42,
):
    """Fit one of the reference's three classifier families; returns a
    fitted Spark ML model (PipelineModel for linear_svc)."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import (
        GBTClassifier,
        LinearSVC,
        RandomForestClassifier,
    )
    from pyspark.ml.feature import StandardScaler

    df = _prep(features_df, features_col, label_col)
    if family == "rf":
        est = RandomForestClassifier(numTrees=50, maxDepth=8, seed=seed)
        return est.fit(df)
    if family == "linear_svc":
        scaler = StandardScaler(
            inputCol="features", outputCol="scaled", withMean=True, withStd=True
        )
        svc = LinearSVC(featuresCol="scaled", maxIter=30, regParam=0.01)
        return Pipeline(stages=[scaler, svc]).fit(df)
    if family == "gbt":
        est = GBTClassifier(maxIter=20, maxDepth=4, seed=seed)
        return est.fit(df)
    raise ValueError(f"unknown family {family!r}; pick one of {FAMILIES}")


def evaluate_accuracy(
    model,
    features_df: DataFrame,
    features_col: str = "features",
    label_col: str = "label",
) -> float:
    df = _prep(features_df, features_col, label_col)
    preds = model.transform(df)
    n = preds.count()
    ok = preds.filter(F.col("prediction") == F.col("label")).count()
    return ok / n if n else 0.0
