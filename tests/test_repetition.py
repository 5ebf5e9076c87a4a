"""Gopher repetition signals, C4 global sentence dedup, bigram fluency."""

import pytest
from pyspark.sql import functions as F

from gujarati_readability_pagewise_spark.functions.repetition import (
    bigram_fluency,
    dedup_sentences_global,
    repetition_signals,
)


@pytest.fixture()
def docs(spark):
    rows = [
        # 0: clean doc, all-distinct sentences
        (0, "alpha beta gamma. delta epsilon zeta. eta theta iota."),
        # 1: spammy — one sentence repeated 3 of 4 times
        (1, "buy cheap now. buy cheap now. buy cheap now. other text here."),
        # 2: keyword stuffing — one 2-gram dominates
        (2, "best price best price best price best price best price"),
        # 3: shares a sentence with doc 0 (doc 0 wins: lower id); long
        # enough that no single unique 2-gram covers 20% of the chars
        (3, "delta epsilon zeta. completely new material appears in this "
            "sentence with many further distinct words beyond the shared part."),
        # 4: single word (no bigrams, one sentence)
        (4, "word"),
    ]
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_repetition_signals_flag_planted_spam(docs):
    sig = {r["doc_id"]: r for r in repetition_signals(docs).collect()}
    assert sig[0]["keep"] and sig[0]["dup_sent_fraction"] == 0.0
    # doc 1: 4 sentences, 2 distinct -> dup fraction 0.5 > 0.30 -> rejected
    assert sig[1]["dup_sent_fraction"] == 0.5 and not sig[1]["keep"]
    # doc 2: 'best price' (or overlap twin) covers >20% of chars -> rejected
    assert sig[2]["top_2gram_char_fraction"] > 0.20 and not sig[2]["keep"]
    assert sig[3]["keep"]
    assert sig[4]["keep"] and sig[4]["top_2gram"] == ""


def test_dedup_sentences_first_global_occurrence_wins(docs):
    out = {r["doc_id"]: r for r in dedup_sentences_global(docs).collect()}
    # doc 3 loses its duplicated first sentence to doc 0 (lower doc_id)
    assert out[3]["n_sents"] == 2 and out[3]["n_kept"] == 1
    assert out[0]["n_kept"] == 3  # winner keeps all
    # doc 1 keeps first occurrence of the repeated sentence + the other
    assert out[1]["n_sents"] == 4 and out[1]["n_kept"] == 2
    # determinism: md5 matches a hand-rebuilt doc 3
    import hashlib

    assert out[3]["text_md5"] == hashlib.md5(
        b"completely new material appears in this sentence with many "
        b"further distinct words beyond the shared part."
    ).hexdigest()


def test_bigram_fluency_scores_common_bigrams_higher(docs):
    out = {r["doc_id"]: r for r in bigram_fluency(docs).collect()}
    # doc 2's 'best price'/'price best' bigrams are corpus-frequent
    assert out[2]["mean_bigram_count"] > out[0]["mean_bigram_count"]
    assert 4 not in out  # no bigrams in a 1-token doc
    assert out[1]["n_bigrams"] == 11


def test_bigram_fluency_broadcast_head_equals_exact_join(spark):
    """The skew cure must be invisible in the values: with a planted hot
    bigram ('of the' in half the corpus), the broadcast-head split-join
    (head_k) returns exactly the plain shuffle join's rows, and the plan
    resolves the head via broadcast joins (the hot key never shuffles the
    full gram stream)."""
    rows = [
        (i, "of the " * 20 + f"unique{i} tail{i}") if i % 2 == 0
        else (i, f"rare{i} gram{i} only{i} here{i}")
        for i in range(200)
    ]
    docs = spark.createDataFrame(rows, "doc_id int, text string")
    exact = sorted(map(tuple, bigram_fluency(docs, head_k=None).collect()))
    split = bigram_fluency(docs, head_k=8)
    assert sorted(map(tuple, split.collect())) == exact
    plan = split._jdf.queryExecution().executedPlan().toString()
    # hot branch: broadcast hash join; tail restriction: broadcast anti
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "LeftAnti" in plan, plan


def test_bpe_merge_candidates_matches_python_reference(spark):
    """bpe_merge_candidates must equal the naive per-occurrence pair count
    (weighted by word frequency, within-word adjacency only), with
    deterministic tie-breaks."""
    from collections import Counter

    import pandas as pd

    from gujarati_readability_pagewise_spark.functions.textstats import (
        bpe_merge_candidates,
    )

    texts = [
        "lower lower newest newest newest widest",
        "low new newest widest widest",
        "ક્ષમા ક્ષમા ગુજરાત",  # multibyte: pairs count by CHARACTER
        "a bb a",
    ]
    docs = spark.createDataFrame(pd.DataFrame({"text": texts}))
    words = Counter(w for t in texts for w in t.split() if len(w) >= 2)
    pairs = Counter()
    for w, c in words.items():
        for i in range(len(w) - 1):
            pairs[w[i : i + 2]] += c
    exp = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = [
        (r["pair"], r["n_occurrences"])
        for r in bpe_merge_candidates(docs, k=10).orderBy("rank").collect()
    ]
    assert got == exp
