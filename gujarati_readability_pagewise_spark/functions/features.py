"""Readability feature kernel: extracted text -> fixed-length float vector.

The graft analogue of the reference's backbone embedding (image -> 384/1280-d
vector, ``/root/reference/scripts/extract_pagewise_features.py:249-348``):
page text in, fixed-order ``FEATURE_NAMES``-dimensional float64 vector out,
computed for a whole Arrow batch at once (pandas ``.str`` ops — compiled
regex executed in a C loop — never a per-row Spark UDF).

Gujarati specifics:

* **Akshara count** — orthographic syllables over the Gujarati block
  U+0A80–U+0AFF, segmented by the standard Indic cluster grammar
  (consonant + optional nukta, joined by virama U+0ACD, then optional
  matras / vowel signs / modifiers), implemented as one precompiled regex.
* **Sentence segmentation** — ``.`` ``!`` ``?`` ``…`` plus the dandas
  U+0964/U+0965 used in Gujarati prose.
* **Script purity** — share of letters that are Gujarati (quality signal:
  boilerplate and mojibake pull this down).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

__all__ = ["FEATURE_NAMES", "N_FEATURES", "compute_features", "compute_features_one"]

# Fixed feature order — tests and the RF model pin against this list.
FEATURE_NAMES = [
    "n_chars",
    "n_words",
    "n_sentences",
    "n_aksharas",
    "type_token_ratio",
    "punct_ratio",
    "script_purity",
    "digit_ratio",
    "mean_word_len",
    "mean_sentence_words",
    "stopword_ratio",
    "gujarati_char_ratio",
]
N_FEATURES = len(FEATURE_NAMES)

# --- Gujarati akshara (orthographic syllable) grammar -----------------------
_C = "[ક-હ]"          # consonants KA..HA
_NUKTA = "઼?"
_VIRAMA = "્"
_MATRA = "[ા-ૌ]?"     # dependent vowel signs
_MOD = "[ઁ-ઃૐ]*"  # candrabindu/anusvara/visarga, om
_INDEP_V = "[અ-ઔ]"    # independent vowels
# cluster = (C nukta (virama C nukta)* matra mods) | independent vowel + mods
_AKSHARA = re.compile(
    f"(?:{_C}{_NUKTA}(?:{_VIRAMA}{_C}{_NUKTA})*{_VIRAMA}?{_MATRA}{_MOD})"
    f"|(?:{_INDEP_V}{_MOD})"
)

_SENT = re.compile(r"[.!?…।॥]+")
_PUNCT = re.compile(r"[!-/:-@\[-`{-~।॥…“”‘’]")
_DIGIT = re.compile(r"[0-9૦-૯]")
_GUJ = re.compile(r"[઀-૿]")
_LETTER = re.compile(r"[^\W\d_]", re.UNICODE)
_GUJ_LETTER = re.compile(r"[અ-હૐૠૡ]")
# ALL whitespace, not just U+0020: extracted text joins blocks with "\n\n"
# and words split on every Unicode whitespace, so mean_word_len's
# non-whitespace numerator must subtract the same class.
_SPACE = re.compile(r"\s")

# Small closed stopword list (top Gujarati function words + English fillers).
_STOPWORDS = frozenset(
    [
        "છે", "અને", "તે", "એક", "આ", "માં", "ના", "ની", "નો", "નું", "પર",
        "થી", "કે", "હતી", "હતું", "હતા", "પણ", "જ", "તો", "એ", "માટે", "સાથે",
        "the", "a", "an", "and", "or", "of", "in", "on", "to", "is", "are",
        "was", "for", "with", "that", "this", "it", "as", "at", "by",
    ]
)


def compute_features_one(text: str) -> np.ndarray:
    """Feature vector for a single document (the scalar oracle for tests)."""
    return compute_features(pd.Series([text if text is not None else ""]))[0]


# --- single-char class counting via codepoint table -------------------------
# Counting `[class]` occurrences with a regex re-scans the batch once per
# class; instead we decode the whole batch to a uint32 codepoint array ONCE
# and evaluate each class on the (few hundred) unique codepoints with the
# *same compiled regex* — semantics are identical by construction, but the
# per-character work is a numpy table lookup.  This is the hot path of the
# engine (the reference's analogue is the batched backbone forward pass).

_BMP = 0x10000
# keyed by the pattern OBJECT (default identity hash) — keeping the pattern
# referenced from the key prevents the id-reuse-after-GC hazard of id() keys
_TABLE_CACHE: dict["re.Pattern", np.ndarray] = {}


def _table(pat: "re.Pattern") -> np.ndarray:
    """BMP membership table for a single-char class regex (cached per process)."""
    tab = _TABLE_CACHE.get(pat)
    if tab is None:
        tab = np.fromiter(
            (pat.fullmatch(chr(i)) is not None for i in range(_BMP)),
            dtype=bool,
            count=_BMP,
        )
        _TABLE_CACHE[pat] = tab
    return tab


_MASK_CACHE: dict[tuple, np.ndarray] = {}


def _mask_table(patterns: dict[str, "re.Pattern"]) -> np.ndarray:
    """All class tables packed into one uint8 bitmask table (bit b = class b)."""
    key = tuple(patterns.values())
    tab = _MASK_CACHE.get(key)
    if tab is None:
        assert len(patterns) <= 8
        tab = np.zeros(_BMP, dtype=np.uint8)
        for b, pat in enumerate(patterns.values()):
            tab |= _table(pat).astype(np.uint8) << b
        _MASK_CACHE[key] = tab
    return tab


def _class_counts(t: pd.Series, patterns: dict[str, "re.Pattern"]) -> dict[str, np.ndarray]:
    """Per-doc count of each single-char class, in ONE histogram pass.

    Each character maps to a bitmask of the classes it belongs to (classes
    overlap, e.g. guj ⊇ guj_letter), so `(doc_id << nbits) | mask` is a
    unique bin and one ``np.bincount`` yields the full (doc × mask)
    histogram; a tiny (2^nbits × nbits) matmul unpacks it to per-class
    counts.  ~1.4x the 6-x-``np.add.reduceat`` formulation it replaces,
    and empty docs need no special casing (their bins just stay zero).
    """
    texts = t.tolist()
    n = len(texts)
    joined = "".join(texts)
    cp = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32)
    lens = np.array([len(s) for s in texts], dtype=np.int64)
    out: dict[str, np.ndarray] = {"len": lens.astype(np.float64)}
    if len(cp) == 0:
        zero = np.zeros(n, dtype=np.float64)
        out.update({k: zero.copy() for k in patterns})
        return out
    nbits = len(patterns)
    astral_idx = np.nonzero(cp >= _BMP)[0]
    cp_lo = np.where(cp >= _BMP, 0, cp)
    combo = _mask_table(patterns)[cp_lo].astype(np.int64)
    if len(astral_idx):
        for i in astral_idx:
            ch = chr(int(cp[i]))
            m = 0
            for b, pat in enumerate(patterns.values()):
                if pat.fullmatch(ch) is not None:
                    m |= 1 << b
            combo[i] = m
    doc_id = np.repeat(np.arange(n, dtype=np.int64), lens)
    hist = np.bincount((doc_id << nbits) + combo, minlength=n << nbits)
    hist = hist.reshape(n, 1 << nbits).astype(np.float64)
    bitmat = ((np.arange(1 << nbits)[:, None] >> np.arange(nbits)[None, :]) & 1).astype(
        np.float64
    )
    counts = hist @ bitmat
    for b, name in enumerate(patterns):
        out[name] = counts[:, b]
    return out


def _stopword_count(words: list[str]) -> int:
    return sum(1 for w in words if w.lower() in _STOPWORDS)


def compute_features(texts: pd.Series) -> np.ndarray:
    """Vectorized kernel: Series[str] -> float64 array (len(texts), N_FEATURES).

    All counting goes through pandas ``.str.count`` / ``.str.len`` (compiled
    regex, C loop over the block) — no ``.apply(axis=1)``, no per-row Spark
    UDF (input_hint mandate).
    """
    t = texts.fillna("").astype(str)
    n = len(t)
    out = np.zeros((n, N_FEATURES), dtype=np.float64)

    word_lists = t.str.split()
    n_words = word_lists.str.len().fillna(0).to_numpy(dtype=np.float64)
    n_sent = t.str.count(_SENT).to_numpy(dtype=np.float64)
    cc = _class_counts(
        t,
        {
            "punct": _PUNCT,
            "digit": _DIGIT,
            "guj": _GUJ,
            "letter": _LETTER,
            "guj_letter": _GUJ_LETTER,
            "space": _SPACE,
        },
    )
    n_chars = cc["len"]
    n_punct = cc["punct"]
    n_digit = cc["digit"]
    n_guj = cc["guj"]
    n_letter = cc["letter"]

    # akshara grammar only where Gujarati codepoints exist — a doc with
    # n_guj == 0 has 0 aksharas by definition, so the guard is exact
    n_akshara = np.zeros(n, dtype=np.float64)
    has_guj = n_guj > 0
    if has_guj.any():
        n_akshara[has_guj] = t[has_guj].str.count(_AKSHARA).to_numpy(dtype=np.float64)

    # uniques / stopwords need the token lists; list-comp over the batch is
    # the pandas-internal loop shape, not a Spark per-row UDF.
    n_unique = np.array(
        [len(set(ws)) if isinstance(ws, list) else 0 for ws in word_lists],
        dtype=np.float64,
    )
    n_stop = np.array(
        [_stopword_count(ws) if isinstance(ws, list) else 0 for ws in word_lists],
        dtype=np.float64,
    )

    safe_words = np.maximum(n_words, 1.0)
    safe_chars = np.maximum(n_chars, 1.0)
    safe_sent = np.maximum(n_sent, 1.0)
    safe_letters = np.maximum(n_letter, 1.0)

    nonspace = n_chars - cc["space"]

    out[:, 0] = n_chars
    out[:, 1] = n_words
    out[:, 2] = n_sent
    out[:, 3] = n_akshara
    out[:, 4] = np.where(n_words > 0, n_unique / safe_words, 0.0)
    out[:, 5] = np.where(n_chars > 0, n_punct / safe_chars, 0.0)
    out[:, 6] = np.where(n_letter > 0, cc["guj_letter"] / safe_letters, 0.0)
    out[:, 7] = np.where(n_chars > 0, n_digit / safe_chars, 0.0)
    out[:, 8] = np.where(n_words > 0, (nonspace - n_punct) / safe_words, 0.0)
    out[:, 9] = np.where(n_sent > 0, n_words / safe_sent, 0.0)
    out[:, 10] = np.where(n_words > 0, n_stop / safe_words, 0.0)
    out[:, 11] = np.where(n_chars > 0, n_guj / safe_chars, 0.0)
    return out


