"""E4 resamplers: balance invariants, determinism, boundary-cleaning
behavior, and the resample→fit→broadcast-score end-to-end path."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gujarati_readability_pagewise_spark.ml.resample import (
    OVERSAMPLERS,
    UNDERSAMPLERS,
    adasyn,
    enn,
    iht,
    random_oversample,
    random_undersample,
    resample,
    smote,
    tomek_links,
)


@pytest.fixture(scope="module")
def imbalanced():
    """Two gaussian blobs, 9:1 imbalance, seeded."""
    rng = np.random.default_rng(7)
    X0 = rng.normal(0.0, 1.0, size=(180, 4))
    X1 = rng.normal(2.5, 1.0, size=(20, 4))
    X = np.vstack([X0, X1])
    y = np.concatenate([np.zeros(180, dtype=np.int32), np.ones(20, dtype=np.int32)])
    return X, y


def _counts(y):
    c, n = np.unique(y, return_counts=True)
    return dict(zip(c.tolist(), n.tolist()))


@pytest.mark.parametrize("name", sorted(OVERSAMPLERS))
def test_oversamplers_balance_and_keep_originals(imbalanced, name):
    X, y = imbalanced
    Xr, yr = resample(X, y, strategy=name, kind="over", seed=42)
    counts = _counts(yr)
    # smote/adasyn/random hit exact balance; the *_enn/_tomek combos clean
    # the boundary afterwards so the minority may shrink slightly
    assert counts[1] >= 0.85 * counts[0]
    assert counts[1] >= 150  # synthesis actually happened (was 20)
    # every original minority sample survives pure oversampling
    if name in ("smote", "adasyn", "random"):
        assert counts == {0: 180, 1: 180}
        assert len(Xr) == 360


@pytest.mark.parametrize("name", sorted(UNDERSAMPLERS))
def test_undersamplers_reduce_majority_only(imbalanced, name):
    X, y = imbalanced
    Xr, yr = resample(X, y, strategy=name, kind="under", seed=42)
    before, after = _counts(y), _counts(yr)
    assert after[1] == before[1]  # minority untouched
    assert after[0] <= before[0]  # majority never grows
    assert len(Xr) == len(yr)
    if name in ("random", "iht"):
        assert after[0] == after[1]  # these balance exactly


def test_smote_synthetics_are_interpolations(imbalanced):
    X, y = imbalanced
    Xr, yr = smote(X, y, seed=42)
    synth = Xr[len(X):]
    X1 = X[y == 1]
    lo, hi = X1.min(axis=0), X1.max(axis=0)
    # convex combinations of same-class points stay inside the class bbox
    assert (synth >= lo - 1e-9).all() and (synth <= hi + 1e-9).all()


def test_resamplers_deterministic(imbalanced):
    X, y = imbalanced
    for fn in (smote, adasyn, random_oversample, random_undersample):
        Xa, ya = fn(X, y, seed=42)
        Xb, yb = fn(X, y, seed=42)
        np.testing.assert_array_equal(Xa, Xb)
        np.testing.assert_array_equal(ya, yb)


def test_enn_and_tomek_clean_planted_boundary_noise():
    """A majority point planted inside the minority cluster must be removed
    by both cleaners; core points far from the boundary must survive."""
    rng = np.random.default_rng(3)
    X0 = rng.normal(0.0, 0.3, size=(40, 2))
    X1 = rng.normal(3.0, 0.3, size=(12, 2))
    noise = np.array([[3.0, 3.0]])  # majority label, minority territory
    X = np.vstack([X0, noise, X1])
    y = np.array([0] * 41 + [1] * 12)
    for cleaner in (enn, tomek_links):
        Xr, yr = cleaner(X, y)
        # the planted intruder is gone
        assert not any((Xr == noise[0]).all(axis=1)), cleaner.__name__
        # minority survives intact
        assert (yr == 1).sum() == 12, cleaner.__name__


def test_iht_removes_hardest_majority_first():
    rng = np.random.default_rng(5)
    X0 = rng.normal(0.0, 0.3, size=(30, 2))
    X0_hard = rng.normal(2.0, 0.2, size=(5, 2))  # majority near minority
    X1 = rng.normal(2.0, 0.2, size=(10, 2))
    X = np.vstack([X0, X0_hard, X1])
    y = np.array([0] * 35 + [1] * 10)
    Xr, yr = iht(X, y)
    assert _counts(yr) == {0: 10, 1: 10}
    # the easy (far) majority core should dominate the survivors
    survivors_maj = Xr[yr == 0]
    assert (survivors_maj[:, 0] < 1.0).sum() >= 8


def test_unknown_strategy_falls_back(imbalanced):
    X, y = imbalanced
    Xa, ya = resample(X, y, strategy="nope", kind="over", seed=42)
    Xb, yb = resample(X, y, strategy="smote", kind="over", seed=42)
    np.testing.assert_array_equal(Xa, Xb)
    Xc, yc = resample(X, y, strategy="nope", kind="under", seed=42)
    Xd, yd = resample(X, y, strategy="random", kind="under", seed=42)
    np.testing.assert_array_equal(Xc, Xd)


def test_resample_fit_broadcast_score_end_to_end(spark, pages_df, pages_pdf):
    """Reference contract: resample the TRAIN matrix, fit, broadcast-score
    the ORIGINAL (unresampled) pages — train_pagewise_xgboost_oversampled.py
    semantics (resample :182, evaluate on raw split :277-344)."""
    from gujarati_readability_pagewise_spark.ml.train import train_model
    from gujarati_readability_pagewise_spark.operators.udfs import (
        with_extraction_and_score,
    )
    from gujarati_readability_pagewise_spark.sources.pages import gen_labels_pdf

    labels = spark.createDataFrame(gen_labels_pdf(pages_pdf, seed=42))
    m = train_model(
        pages_df, labels, n_estimators=10, max_depth=6,
        resample_strategy="smote", resample_kind="over",
    )
    scored = with_extraction_and_score(pages_df, m)
    out = scored.select("url", "pred_label", "p_nonreadable").toPandas()
    assert len(out) == pages_df.count()  # scored set is the ORIGINAL corpus
    assert set(out.pred_label.unique()) <= {0, 1}
    assert out.p_nonreadable.between(0, 1).all()
