"""Class-imbalance resamplers (E4): the reference's imbalanced-learn menu
re-implemented in numpy for the driver-side labeled train matrix.

Mirrors ``/root/reference/scripts/train_pagewise_xgboost_oversampled.py:110-116``
(oversamplers: smote, adasyn, random, smote_enn, smote_tomek) and
``train_pagewise_xgboost_undersampled.py:119-129`` (undersamplers: random,
tomek, enn, renn, allknn, cnn, oss, ncr, iht) — same strategy names, same
seed-42 determinism, same contract: resampling applies to the TRAIN matrix
only; evaluation always runs on the ORIGINAL unresampled split
(``train_pagewise_xgboost_oversampled.py:277-344``).

Scale note: the labeled train set is small by design (the reference labels
~500 pages; a crawl labels a sample, never the corpus), so resampling is a
driver-side numpy transform inside the existing collect→fit→broadcast-score
pattern.  Nothing here touches a Spark plan; the resampled model broadcasts
exactly like the unresampled one (operators/udfs.py:score_with_model).

Deviations from imbalanced-learn, documented:
* ENN-family uses majority-vote of the k neighbours (imblearn's
  ``kind_sel='mode'``) rather than the all-agree default;
* IHT estimates instance hardness from k-NN class agreement instead of a
  cross-validated estimator's probabilities — same ordering contract
  (hardest majority samples removed first), no estimator dependency.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "OVERSAMPLERS",
    "UNDERSAMPLERS",
    "resample",
    "smote",
    "adasyn",
    "random_oversample",
    "random_undersample",
    "tomek_links",
    "enn",
    "renn",
    "allknn",
    "cnn",
    "oss",
    "ncr",
    "iht",
    "smote_enn",
    "smote_tomek",
]


def _knn_indices(X: np.ndarray, Q: np.ndarray, k: int, exclude_self: bool) -> np.ndarray:
    """Indices into X of the k nearest neighbours of each row of Q."""
    d2 = ((Q[:, None, :] - X[None, :, :]) ** 2).sum(axis=2)
    if exclude_self:
        # a query identical to a corpus row is "itself" only positionally;
        # callers pass Q = X so the diagonal is the self-match
        np.fill_diagonal(d2, np.inf)
    order = np.argsort(d2, kind="stable", axis=1)
    return order[:, :k]


def _classes_sorted_by_count(y: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    classes, counts = np.unique(y, return_counts=True)
    return classes, counts


def smote(
    X: np.ndarray, y: np.ndarray, k_neighbors: int = 3, seed: int = 42
) -> tuple[np.ndarray, np.ndarray]:
    """SMOTE: every non-majority class is synthesized up to the majority
    count by interpolating each sample toward a random same-class k-NN."""
    rng = np.random.default_rng(seed)
    classes, counts = _classes_sorted_by_count(y)
    target = counts.max()
    Xs, ys = [X], [y]
    for c, n in zip(classes, counts):
        need = int(target - n)
        if need <= 0:
            continue
        Xc = X[y == c]
        k = min(k_neighbors, len(Xc) - 1)
        if k < 1:  # one lone sample: duplicate it (degenerate SMOTE)
            Xs.append(np.repeat(Xc, need, axis=0))
            ys.append(np.full(need, c, dtype=y.dtype))
            continue
        nn = _knn_indices(Xc, Xc, k, exclude_self=True)
        base = rng.integers(0, len(Xc), size=need)
        pick = nn[base, rng.integers(0, k, size=need)]
        u = rng.random(size=(need, 1))
        Xs.append(Xc[base] + u * (Xc[pick] - Xc[base]))
        ys.append(np.full(need, c, dtype=y.dtype))
    return np.vstack(Xs), np.concatenate(ys)


def adasyn(
    X: np.ndarray, y: np.ndarray, n_neighbors: int = 3, seed: int = 42
) -> tuple[np.ndarray, np.ndarray]:
    """ADASYN: like SMOTE but synthesis density follows local difficulty —
    minority samples with more foreign k-NN (in the FULL set) get more
    synthetic offspring."""
    rng = np.random.default_rng(seed)
    classes, counts = _classes_sorted_by_count(y)
    target = counts.max()
    Xs, ys = [X], [y]
    k = min(n_neighbors, len(X) - 1)
    nn_all = _knn_indices(X, X, k, exclude_self=True)
    for c, n in zip(classes, counts):
        need = int(target - n)
        if need <= 0:
            continue
        idx_c = np.flatnonzero(y == c)
        Xc = X[idx_c]
        r = (y[nn_all[idx_c]] != c).mean(axis=1)
        if r.sum() == 0:
            r = np.ones_like(r)
        alloc = np.floor(need * r / r.sum()).astype(int)
        # distribute the rounding remainder deterministically by hardness
        for i in np.argsort(-r, kind="stable")[: need - alloc.sum()]:
            alloc[i] += 1
        kc = min(n_neighbors, len(Xc) - 1)
        if kc < 1:
            Xs.append(np.repeat(Xc, need, axis=0))
            ys.append(np.full(need, c, dtype=y.dtype))
            continue
        nn_c = _knn_indices(Xc, Xc, kc, exclude_self=True)
        base = np.repeat(np.arange(len(Xc)), alloc)
        pick = nn_c[base, rng.integers(0, kc, size=len(base))]
        u = rng.random(size=(len(base), 1))
        Xs.append(Xc[base] + u * (Xc[pick] - Xc[base]))
        ys.append(np.full(len(base), c, dtype=y.dtype))
    return np.vstack(Xs), np.concatenate(ys)


def random_oversample(
    X: np.ndarray, y: np.ndarray, seed: int = 42
) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    classes, counts = _classes_sorted_by_count(y)
    target = counts.max()
    Xs, ys = [X], [y]
    for c, n in zip(classes, counts):
        need = int(target - n)
        if need <= 0:
            continue
        idx_c = np.flatnonzero(y == c)
        extra = rng.choice(idx_c, size=need, replace=True)
        Xs.append(X[extra])
        ys.append(y[extra])
    return np.vstack(Xs), np.concatenate(ys)


def random_undersample(
    X: np.ndarray, y: np.ndarray, seed: int = 42
) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    classes, counts = _classes_sorted_by_count(y)
    target = counts.min()
    keep = []
    for c in classes:
        idx_c = np.flatnonzero(y == c)
        keep.append(rng.choice(idx_c, size=target, replace=False))
    keep = np.sort(np.concatenate(keep))
    return X[keep], y[keep]


def _majority_class(y: np.ndarray):
    classes, counts = _classes_sorted_by_count(y)
    return classes[np.argmax(counts)]


def tomek_links(X: np.ndarray, y: np.ndarray, **_) -> tuple[np.ndarray, np.ndarray]:
    """Remove the majority member of every Tomek link (mutual 1-NN pair of
    opposite classes) — imblearn TomekLinks default (clean majority only)."""
    nn1 = _knn_indices(X, X, 1, exclude_self=True)[:, 0]
    maj = _majority_class(y)
    drop = np.zeros(len(y), dtype=bool)
    for i in range(len(y)):
        j = nn1[i]
        if y[i] != y[j] and nn1[j] == i:
            if y[i] == maj:
                drop[i] = True
            if y[j] == maj:
                drop[j] = True
    return X[~drop], y[~drop]


def enn(
    X: np.ndarray, y: np.ndarray, n_neighbors: int = 3, **_
) -> tuple[np.ndarray, np.ndarray]:
    """Edited NN: drop majority-class samples whose k-NN majority vote
    disagrees with their label (cleans the class boundary)."""
    k = min(n_neighbors, len(X) - 1)
    if k < 1:
        return X, y
    nn = _knn_indices(X, X, k, exclude_self=True)
    maj = _majority_class(y)
    agree = (y[nn] == y[:, None]).sum(axis=1) * 2 > k
    drop = (y == maj) & ~agree
    return X[~drop], y[~drop]


def renn(
    X: np.ndarray, y: np.ndarray, n_neighbors: int = 3, max_iter: int = 100, **_
) -> tuple[np.ndarray, np.ndarray]:
    """Repeated ENN until a fixed point (or max_iter)."""
    for _i in range(max_iter):
        n_before = len(y)
        X, y = enn(X, y, n_neighbors=n_neighbors)
        if len(y) == n_before or len(np.unique(y)) < 2:
            break
    return X, y


def allknn(
    X: np.ndarray, y: np.ndarray, n_neighbors: int = 3, **_
) -> tuple[np.ndarray, np.ndarray]:
    """ENN swept over k = 1..n_neighbors (progressively stricter cleaning)."""
    for k in range(1, n_neighbors + 1):
        X, y = enn(X, y, n_neighbors=k)
        if len(np.unique(y)) < 2:
            break
    return X, y


def cnn(
    X: np.ndarray, y: np.ndarray, n_neighbors: int = 1, seed: int = 42, **_
) -> tuple[np.ndarray, np.ndarray]:
    """Condensed NN: keep all minority samples plus the majority samples a
    1-NN rule needs to classify the rest correctly (greedy single pass)."""
    rng = np.random.default_rng(seed)
    maj = _majority_class(y)
    store = list(np.flatnonzero(y != maj))
    maj_idx = np.flatnonzero(y == maj)
    store.append(int(rng.choice(maj_idx)))
    changed = True
    while changed:
        changed = False
        for i in maj_idx:
            if i in store:
                continue
            S = np.array(store)
            d2 = ((X[S] - X[i]) ** 2).sum(axis=1)
            if y[S[np.argmin(d2)]] != y[i]:
                store.append(int(i))
                changed = True
    keep = np.sort(np.array(store))
    return X[keep], y[keep]


def oss(
    X: np.ndarray, y: np.ndarray, seed: int = 42, **_
) -> tuple[np.ndarray, np.ndarray]:
    """One-sided selection: CNN condensation then Tomek-link cleaning."""
    X, y = cnn(X, y, seed=seed)
    return tomek_links(X, y)


def ncr(
    X: np.ndarray, y: np.ndarray, n_neighbors: int = 3, **_
) -> tuple[np.ndarray, np.ndarray]:
    """Neighbourhood cleaning rule: ENN on the majority class, plus drop
    majority neighbours that cause minority samples to be misclassified."""
    k = min(n_neighbors, len(X) - 1)
    if k < 1:
        return X, y
    nn = _knn_indices(X, X, k, exclude_self=True)
    maj = _majority_class(y)
    agree = (y[nn] == y[:, None]).sum(axis=1) * 2 > k
    drop = (y == maj) & ~agree
    # minority samples misclassified by their neighbourhood: drop the
    # majority members of that neighbourhood
    for i in np.flatnonzero((y != maj) & ~agree):
        for j in nn[i]:
            if y[j] == maj:
                drop[j] = True
    return X[~drop], y[~drop]


def iht(
    X: np.ndarray, y: np.ndarray, n_neighbors: int = 5, **_
) -> tuple[np.ndarray, np.ndarray]:
    """Instance-hardness threshold: remove the hardest majority samples
    (k-NN disagreement rate) until classes balance."""
    k = min(n_neighbors, len(X) - 1)
    if k < 1:
        return X, y
    nn = _knn_indices(X, X, k, exclude_self=True)
    hardness = (y[nn] != y[:, None]).mean(axis=1)
    classes, counts = _classes_sorted_by_count(y)
    target = counts.min()
    maj = _majority_class(y)
    keep = np.ones(len(y), dtype=bool)
    maj_idx = np.flatnonzero(y == maj)
    n_drop = len(maj_idx) - target
    if n_drop > 0:
        # drop hardest first; stable tie-break by index
        order = maj_idx[np.argsort(-hardness[maj_idx], kind="stable")]
        keep[order[:n_drop]] = False
    return X[keep], y[keep]


def smote_enn(
    X: np.ndarray, y: np.ndarray, seed: int = 42, **_
) -> tuple[np.ndarray, np.ndarray]:
    X, y = smote(X, y, seed=seed)
    return enn(X, y)


def smote_tomek(
    X: np.ndarray, y: np.ndarray, seed: int = 42, **_
) -> tuple[np.ndarray, np.ndarray]:
    X, y = smote(X, y, seed=seed)
    return tomek_links(X, y)


OVERSAMPLERS = {
    "smote": smote,
    "adasyn": adasyn,
    "random": random_oversample,
    "smote_enn": smote_enn,
    "smote_tomek": smote_tomek,
}

UNDERSAMPLERS = {
    "random": random_undersample,
    "tomek": tomek_links,
    "enn": enn,
    "renn": renn,
    "allknn": allknn,
    "cnn": cnn,
    "oss": oss,
    "ncr": ncr,
    "iht": iht,
}


def resample(
    X: np.ndarray,
    y: np.ndarray,
    strategy: str = "smote",
    kind: str = "over",
    seed: int = 42,
) -> tuple[np.ndarray, np.ndarray]:
    """Dispatch by the reference's strategy names; unknown names fall back
    to the family default (smote / random) exactly like the reference's
    warning path (train_pagewise_xgboost_oversampled.py:118-121)."""
    menu = OVERSAMPLERS if kind == "over" else UNDERSAMPLERS
    fn = menu.get(strategy, menu["smote" if kind == "over" else "random"])
    return fn(X, y, seed=seed)
