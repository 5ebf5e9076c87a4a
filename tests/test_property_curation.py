"""Randomized cross-check: the round-3 curation operators vs independent
pure-Python references over seeded random corpora (small vocab → forced
collisions; empties, single tokens, repeated sentences included)."""

import random
from collections import Counter

import pandas as pd
import pytest
from pyspark.sql import functions as F

from gujarati_readability_pagewise_spark.functions.repetition import (
    dedup_sentences_global,
    repetition_signals,
)
from gujarati_readability_pagewise_spark.plans.snapshots import scd2_history

VOCAB = ["alpha", "beta", "gamma", "delta", "x", "yy", "zzz"]


def _random_docs(seed: int, n: int = 150) -> list[tuple[int, str]]:
    rng = random.Random(seed)
    docs = []
    for i in range(n):
        kind = rng.random()
        if kind < 0.05:
            docs.append((i, ""))
        elif kind < 0.10:
            docs.append((i, rng.choice(VOCAB)))
        else:
            sents = []
            for _ in range(rng.randint(1, 6)):
                words = [rng.choice(VOCAB) for _ in range(rng.randint(1, 8))]
                sents.append(" ".join(words))
            # force duplicate sentences within and across docs
            if rng.random() < 0.4 and sents:
                sents.append(sents[0])
            docs.append((i, ". ".join(sents)))
    return docs


def _py_sentences(text: str) -> list[str]:
    import re

    return [p for p in re.split(r"\. ", text) if len(p) > 0]


def _py_repetition(docs):
    import re

    out = {}
    for doc_id, text in docs:
        parts = _py_sentences(text)
        if not parts:
            continue  # no sentence rows -> doc absent (matches inner agg)
        c = Counter(parts)
        n = sum(c.values())
        n_d = len(c)
        dupc = sum((k - 1) * len(s) for s, k in c.items())
        totc = sum(k * len(s) for s, k in c.items())
        toks = re.split(r"\s+", text.strip())
        grams = (
            [" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)]
            if len(toks) >= 2
            else []
        )
        grams = [g for g in grams if len(g) > 0]
        if grams:
            gc = Counter(grams)
            top = min(gc.items(), key=lambda kv: (-kv[1], kv[0]))
            frac = top[1] * len(top[0]) / len(text)
            top_gram = top[0]
        else:
            top_gram, frac = "", 0.0
        out[doc_id] = (
            n,
            (n - n_d) / n,
            dupc / totc,
            top_gram,
            frac,
            int((n - n_d) / n <= 0.30 and frac <= 0.20),
        )
    return out


def test_repetition_signals_match_python_reference(spark):
    docs = _random_docs(seed=7)
    df = spark.createDataFrame(pd.DataFrame(docs, columns=["doc_id", "text"]))
    got = {
        r["doc_id"]: (
            r["n_sents"],
            r["dup_sent_fraction"],
            r["dup_sent_char_fraction"],
            r["top_2gram"],
            r["top_2gram_char_fraction"],
            int(r["keep"]),
        )
        for r in repetition_signals(df, n_partitions=8).collect()
    }
    want = _py_repetition(docs)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == want[k], (k, got[k], want[k])


def _py_sentence_dedup(docs):
    import hashlib

    first = {}
    for doc_id, text in sorted(docs):
        for idx, s in enumerate(_py_sentences(text), start=1):
            first.setdefault(s, (doc_id, idx))
    out = {}
    for doc_id, text in docs:
        parts = _py_sentences(text)
        if not parts:
            continue
        kept = [
            s
            for idx, s in enumerate(parts, start=1)
            if first[s] == (doc_id, idx)
        ]
        out[doc_id] = (
            len(parts),
            len(kept),
            hashlib.md5(". ".join(kept).encode()).hexdigest(),
        )
    return out


def test_dedup_sentences_match_python_reference(spark):
    docs = _random_docs(seed=13)
    df = spark.createDataFrame(pd.DataFrame(docs, columns=["doc_id", "text"]))
    got = {
        r["doc_id"]: (r["n_sents"], r["n_kept"], r["text_md5"])
        for r in dedup_sentences_global(df, n_partitions=8).collect()
    }
    want = _py_sentence_dedup(docs)
    assert got == want


def _py_scd2(rows):
    by_key = {}
    for url, ts, fp in rows:
        by_key.setdefault(url, []).append((ts, fp))
    out = []
    for url, fetches in by_key.items():
        fetches.sort()
        versions = []
        for ts, fp in fetches:
            if not versions or versions[-1][1] != fp:
                versions.append((ts, fp))
        for v, (ts, fp) in enumerate(versions, start=1):
            nxt = versions[v][0] if v < len(versions) else None
            out.append((url, v, ts, nxt, fp, int(nxt is None)))
    return sorted(out)


def test_scd2_history_matches_python_reference(spark):
    rng = random.Random(42)
    rows = []
    for k in range(60):
        url = f"u{k}"
        ts = 0
        for _ in range(rng.randint(1, 8)):
            ts += rng.randint(1, 5)
            rows.append((url, ts, rng.choice("abc")))
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["url", "fetch_ts", "fp"]))
    got = sorted(
        (r["url"], r["version"], r["valid_from"], r["valid_to"], r["fp"], r["is_current"])
        for r in scd2_history(df, "url", "fetch_ts", "fp").collect()
    )
    assert got == _py_scd2(rows)
