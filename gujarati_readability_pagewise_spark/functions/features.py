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
    """All class tables packed into one bitmask table (bit b = class b);
    uint8 up to 8 classes, uint16 up to 16 — one gather serves them all."""
    key = tuple(patterns.values())
    tab = _MASK_CACHE.get(key)
    if tab is None:
        assert len(patterns) <= 16
        dtype = np.uint8 if len(patterns) <= 8 else np.uint16
        tab = np.zeros(_BMP, dtype=dtype)
        for b, pat in enumerate(patterns.values()):
            tab |= _table(pat).astype(dtype) << dtype(b)
        _MASK_CACHE[key] = tab
    return tab


class _CpView:
    """The batch decoded to a uint32 codepoint array ONCE, shared by every
    per-character pass (class histogram, sentence runs, akshara starts).

    ``cp_lo`` clamps astral codepoints to 0 for BMP table lookups (chr(0)
    is in none of the classes, which is also the correct semantics for
    the run/cluster scans: an astral char breaks a virama chain exactly
    like any other out-of-class char).  ``starts`` marks each doc's first
    position so shifted-neighbor logic never reads across a doc boundary.
    """

    __slots__ = ("n", "lens", "cp", "cp_lo", "doc_id", "astral_idx", "starts", "texts")

    def __init__(self, t):
        texts = t.tolist() if hasattr(t, "tolist") else list(t)
        self.n = len(texts)
        self.texts = texts
        joined = "".join(texts)
        self.cp = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32)
        self.lens = np.array([len(s) for s in texts], dtype=np.int64)
        # fast path: no astral codepoint in the batch (the overwhelmingly
        # common case) — cp_lo aliases cp, skipping the where() copy and
        # the astral index scan; one max() reduce decides it
        if len(self.cp) == 0 or int(self.cp.max()) < _BMP:
            self.astral_idx = np.empty(0, dtype=np.int64)
            self.cp_lo = self.cp
        else:
            self.astral_idx = np.nonzero(self.cp >= _BMP)[0]
            self.cp_lo = np.where(self.cp >= _BMP, 0, self.cp)
        # int32: a batch never holds 2^25+ docs, and the narrower repeat +
        # index arithmetic halves the memory traffic of the hot histogram
        self.doc_id = np.repeat(np.arange(self.n, dtype=np.int32), self.lens)
        self.starts = np.zeros(len(self.cp), dtype=bool)
        if len(self.cp):
            offs = np.cumsum(self.lens)[:-1]
            self.starts[0] = True
            self.starts[offs[offs < len(self.cp)]] = True


def _class_counts(
    t: pd.Series, patterns: dict[str, "re.Pattern"], view: _CpView | None = None
) -> dict[str, np.ndarray]:
    """Per-doc count of each single-char class, in ONE histogram pass.

    Each character maps to a bitmask of the classes it belongs to (classes
    overlap, e.g. guj ⊇ guj_letter), so `(doc_id << nbits) | mask` is a
    unique bin and one ``np.bincount`` yields the full (doc × mask)
    histogram; a tiny (2^nbits × nbits) matmul unpacks it to per-class
    counts.  ~1.4x the 6-x-``np.add.reduceat`` formulation it replaces,
    and empty docs need no special casing (their bins just stay zero).
    """
    v = view if view is not None else _CpView(t)
    n = v.n
    out: dict[str, np.ndarray] = {"len": v.lens.astype(np.float64)}
    if len(v.cp) == 0:
        zero = np.zeros(n, dtype=np.float64)
        out.update({k: zero.copy() for k in patterns})
        return out
    nbits = len(patterns)
    combo = _mask_table(patterns)[v.cp_lo]  # uint8; int64 upcast was ~40% of this pass
    if len(v.astral_idx):
        for i in v.astral_idx:
            ch = chr(int(v.cp[i]))
            m = 0
            for b, pat in enumerate(patterns.values()):
                if pat.fullmatch(ch) is not None:
                    m |= 1 << b
            combo[i] = m
    # int32 * int32 + uint8 promotes to int32: fits for any real batch
    hist = np.bincount(
        v.doc_id * np.int32(1 << nbits) + combo, minlength=n << nbits
    )
    hist = hist.reshape(n, 1 << nbits).astype(np.float64)
    bitmat = ((np.arange(1 << nbits)[:, None] >> np.arange(nbits)[None, :]) & 1).astype(
        np.float64
    )
    counts = hist @ bitmat
    for b, name in enumerate(patterns):
        out[name] = counts[:, b]
    return out


def _prev(mask: np.ndarray, starts: np.ndarray) -> np.ndarray:
    """mask shifted one position right, False (0) at each doc's first char.

    Works on bool masks and on packed uint8 bitmasks alike — shifting the
    PACKED mask once and extracting bits from the shifted copy is the same
    as shifting each extracted bit separately (shift and bit-extract
    commute), which is how ``compute_features`` shares two shifted copies
    across all five scan classes instead of shifting five times."""
    out = np.empty_like(mask)
    out[0] = False
    out[1:] = mask[:-1]
    out[starts] = False
    return out


# Single-char classes for the fused numpy passes below — built from the
# SAME grammar fragments as the scanning regexes they replace, so the
# membership tables are identical by construction.
_SENT_CH = re.compile(r"[.!?…।॥]")
_C_CH = re.compile(_C)
_NUKTA_CH = re.compile("઼")
_VIRAMA_CH = re.compile(_VIRAMA)
_INDEP_CH = re.compile(_INDEP_V)


def _sentence_counts(v: _CpView) -> np.ndarray:
    """Per-doc count of ``[.!?…।॥]+`` runs — each maximal run of the class
    is one match, so the count is the number of RUN STARTS (in-class char
    whose predecessor, within the doc, is not in-class).  One table
    lookup + one shift replaces a findall that materialized every match.
    """
    if len(v.cp) == 0:
        return np.zeros(v.n, dtype=np.float64)
    m = _table(_SENT_CH)[v.cp_lo]
    starts_run = m & ~_prev(m, v.starts)
    return np.bincount(
        v.doc_id[starts_run], minlength=v.n
    ).astype(np.float64)


def _akshara_counts(v: _CpView) -> np.ndarray:
    """Per-doc count of ``_AKSHARA`` cluster matches without running the
    cluster regex.

    Scanning the grammar left-to-right non-overlapping, every match
    begins at exactly one of:

    * an independent vowel (the second alternation branch), or
    * a consonant NOT absorbed into the previous cluster — absorption
      happens only via the ``(virama C nukta?)*`` tail, i.e. when the
      immediately preceding char is a virama that itself directly follows
      a consonant or a consonant+nukta (an "attached" virama).  An orphan
      virama (start of doc, or after a matra/space/vowel/second virama)
      attaches to nothing, so the consonant after it starts a new
      cluster, exactly as the scanner would.

    Matras and modifiers never start a match (they only extend one), and
    out-of-grammar chars are skipped by findall — so counting the two
    start kinds IS the match count.  Equivalence with the scanning regex
    is pinned by a randomized property test over adversarial Gujarati
    strings (orphan viramas, nukta chains, astral chars, mixed scripts).
    """
    if len(v.cp) == 0:
        return np.zeros(v.n, dtype=np.float64)
    # one packed-bitmask gather for all four classes; all the shift logic
    # stays in uint8 0/1 arrays (bool astype per class was pure overhead)
    m = _mask_table(
        {"c": _C_CH, "nukta": _NUKTA_CH, "virama": _VIRAMA_CH, "indep": _INDEP_CH}
    )[v.cp_lo]
    is_c = m & 1
    is_nukta = (m & 2) >> 1
    is_virama = (m & 4) >> 2
    is_indep = (m & 8) >> 3
    prev_c = _prev(is_c, v.starts)
    prev_nukta = _prev(is_nukta, v.starts)
    prev2_c = _prev(prev_c, v.starts)
    attached_virama = is_virama & (prev_c | (prev_nukta & prev2_c))
    new_c = is_c & (1 - _prev(attached_virama, v.starts))
    starts_cluster = (new_c | is_indep) != 0
    return np.bincount(
        v.doc_id[starts_cluster], minlength=v.n
    ).astype(np.float64)


def _stopword_count(words: list[str]) -> int:
    return sum(1 for w in words if w.lower() in _STOPWORDS)


# The histogram classes (exactly the dict `_class_counts` used) and a
# second packed uint8 table for the scan classes: sentence runs, the
# akshara grammar, and the whitespace bit for the word-boundary scan.
# Two uint8 gathers per batch replace the three separate table lookups
# (a packed uint16 variant measured SLOWER: every bit extraction then
# runs 2-byte lanes with an extra astype pass; uint8 masks stay 1-byte
# and 0/1 uint8 arrays can be `.view(bool)`-ed for free).
_CLASS_PATTERNS = {
    "punct": _PUNCT,
    "digit": _DIGIT,
    "guj": _GUJ,
    "letter": _LETTER,
    "guj_letter": _GUJ_LETTER,
    "space": _SPACE,
}
_SCAN_PATTERNS = {
    "sent": _SENT_CH,
    "c": _C_CH,
    "nukta": _NUKTA_CH,
    "virama": _VIRAMA_CH,
    "indep": _INDEP_CH,
    "space": _SPACE,
}


def _astral_fix(combo: np.ndarray, view: _CpView, patterns: dict) -> None:
    """Recompute the packed mask for each astral index (BMP table maps
    them to chr(0) = no class; only classes that can match astral chars
    — `letter` — ever flip a bit)."""
    pats = list(patterns.values())
    for i in view.astral_idx:
        ch = chr(int(view.cp[i]))
        m = 0
        for b, pat in enumerate(pats):
            if pat.fullmatch(ch) is not None:
                m |= 1 << b
        combo[i] = m


def compute_features(texts: "pd.Series | list[str]") -> np.ndarray:
    """Vectorized kernel: Series[str] -> float64 array (len(texts), N_FEATURES).

    One utf-32 decode (`_CpView`) + two packed class-table gathers feed
    the class histogram, the sentence-run count, the akshara cluster
    count, and the word-boundary scan — no per-row Spark UDF (input_hint
    mandate), no per-doc pandas ``.str`` loops.

    A plain ``list[str]`` input (the Arrow kernel's path — it already
    holds the texts as a Python list) skips the Series construction +
    fillna/astype/tolist round-trip (~0.5 ms/2048-doc batch); list
    callers guarantee str-only elements (``extract_text`` never returns
    None).  The Series path remains the oracle surface for tests.
    """
    t = texts if isinstance(texts, list) else texts.fillna("").astype(str)
    n = len(t)
    out = np.zeros((n, N_FEATURES), dtype=np.float64)

    # ONE codepoint decode of the batch feeds every per-character pass.
    view = _CpView(t)
    starts = view.starts
    doc_id = view.doc_id
    n_chars = view.lens.astype(np.float64)
    if len(view.cp):
        # class histogram (identical bins to `_class_counts`:
        # (doc_id << 6) | mask is a unique bin)
        combo = _mask_table(_CLASS_PATTERNS)[view.cp_lo]  # uint8
        if len(view.astral_idx):
            _astral_fix(combo, view, _CLASS_PATTERNS)
        hist = np.bincount(
            doc_id * np.int32(64) + combo, minlength=n << 6
        )
        hist = hist.reshape(n, 64).astype(np.float64)
        bitmat = ((np.arange(64)[:, None] >> np.arange(6)[None, :]) & 1).astype(
            np.float64
        )
        counts = hist @ bitmat
        n_punct = counts[:, 0]
        n_digit = counts[:, 1]
        n_guj = counts[:, 2]
        n_letter = counts[:, 3]
        n_guj_letter = counts[:, 4]
        n_space = counts[:, 5]
        # scan classes: one packed uint8 gather; the shifted-neighbor
        # logic runs on TWO shared shifted copies of the packed mask
        # (p1 = previous char's mask, p2 = the one before) instead of
        # shifting each extracted bit separately — shift and bit-extract
        # commute (see `_prev`), so every per-class identity below is the
        # old five-shift form verbatim, just read through p1/p2.  Bits:
        # sent=1, c=2, nukta=4, virama=8, indep=16, space=32.  (astral
        # chars keep the chr(0) lookup = no scan class, exactly the
        # semantics `_sentence_counts`/`_akshara_counts` pin)
        m2 = _mask_table(_SCAN_PATTERNS)[view.cp_lo]  # uint8
        p1 = _prev(m2, starts)
        p2 = _prev(p1, starts)
        # sentence runs: starts of maximal [.!?…।॥]+ runs
        # (in sent class now, predecessor not: bit 0 of m2 & ~p1)
        starts_run = (m2 & ~p1) & 1
        n_sent = np.bincount(
            doc_id[starts_run.view(np.bool_)], minlength=n
        ).astype(np.float64)
        # akshara cluster starts (same grammar as `_akshara_counts`):
        # attached_virama = virama & (prev_c | (prev_nukta & prev2_c)),
        # computed in bit 3: (p1 << 2) moves prev-c (bit 1) to bit 3;
        # (p2 << 1) & 4 moves prev2-c to bit 2, & p1 ANDs it with
        # prev-nukta (bit 2), << 1 lifts the result to bit 3.
        attached_virama = m2 & 8 & ((p1 << 2) | ((p1 & ((p2 << 1) & 4)) << 1))
        # new_c = c & ~prev(attached): prev-attached (bit 3) >> 2 → bit 1
        new_c = m2 & 2 & ~(_prev(attached_virama, starts) >> 2)
        n_akshara = np.bincount(
            doc_id[(new_c | (m2 & 16)) != 0], minlength=n
        ).astype(np.float64)
        # word starts: non-whitespace char whose in-doc predecessor is
        # whitespace (or doc start) — exactly `str.split()`'s token count
        # (bit 5 of ~m2 & (p1 | doc-start))
        word_start = ~m2 & (p1 | (starts.view(np.uint8) << np.uint8(5))) & 32
        wlens = np.bincount(doc_id[word_start != 0], minlength=n)
        n_words = wlens.astype(np.float64)
    else:
        zero = np.zeros(n, dtype=np.float64)
        n_punct = n_digit = n_guj = n_letter = n_guj_letter = n_space = zero
        n_sent = n_akshara = n_words = zero
        wlens = np.zeros(n, dtype=np.int64)

    # uniques / stopwords via one Arrow dictionary-encode over the
    # batch's flat word stream: utf8_split_whitespace + list_flatten +
    # filter(nonempty) build the token stream without a Python str per
    # token, dictionary_encode hashes the utf8 buffers in C (measured 2x
    # pd.factorize on the bench corpus), `wlens` above assigns each
    # token to its doc, and the per-unique-word work (set membership,
    # `.lower()`) runs once per VOCABULARY entry (Zipf-small).  Guard:
    # if Arrow's whitespace set ever disagreed with `\s` (wlens) the
    # bincount length check below raises — it cannot silently misalign.
    import pyarrow as pa
    import pyarrow.compute as pc

    words = pc.list_flatten(
        pc.utf8_split_whitespace(pa.array(view.texts, type=pa.string()))
    )
    words = words.filter(pc.greater(pc.binary_length(words), 0))
    if len(words):
        d = pc.dictionary_encode(words)
        codes = d.indices.to_numpy(zero_copy_only=False)
        uniques = d.dictionary.to_pylist()
        vocab = len(uniques)
        doc_of_word = np.repeat(np.arange(n, dtype=np.int64), wlens)
        # stopword count = size of the selected-subset bincount (integer
        # counts either way; the old float-weighted bincount paid a
        # words-sized float64 gather + weighted accumulation)
        is_stop_u = np.array([u.lower() in _STOPWORDS for u in uniques], dtype=bool)
        n_stop = np.bincount(
            doc_of_word[is_stop_u[codes]], minlength=n
        ).astype(np.float64)
        # distinct words per doc: two exact plans, chosen by size (the
        # same shape-conditioned choice as a broadcast threshold).  When
        # the (doc × vocab) occupancy grid is no bigger than ~2 passes
        # over the word stream, one bincount + count_nonzero beats the
        # O(W log W) sort inside np.unique (~5x on small-vocab batches);
        # a Zipf-large vocabulary (real prose) falls through to the sort,
        # whose cost does not blow up with n*vocab.
        if n * vocab <= 2 * len(codes):
            occ = np.bincount(doc_of_word * vocab + codes, minlength=n * vocab)
            n_unique = np.count_nonzero(
                occ.reshape(n, vocab), axis=1
            ).astype(np.float64)
        else:
            pair = (doc_of_word << 32) | codes.astype(np.int64)
            n_unique = np.bincount(
                np.unique(pair) >> 32, minlength=n
            ).astype(np.float64)
    else:
        n_stop = np.zeros(n, dtype=np.float64)
        n_unique = np.zeros(n, dtype=np.float64)

    safe_words = np.maximum(n_words, 1.0)
    safe_chars = np.maximum(n_chars, 1.0)
    safe_sent = np.maximum(n_sent, 1.0)
    safe_letters = np.maximum(n_letter, 1.0)

    nonspace = n_chars - n_space

    out[:, 0] = n_chars
    out[:, 1] = n_words
    out[:, 2] = n_sent
    out[:, 3] = n_akshara
    out[:, 4] = np.where(n_words > 0, n_unique / safe_words, 0.0)
    out[:, 5] = np.where(n_chars > 0, n_punct / safe_chars, 0.0)
    out[:, 6] = np.where(n_letter > 0, n_guj_letter / safe_letters, 0.0)
    out[:, 7] = np.where(n_chars > 0, n_digit / safe_chars, 0.0)
    out[:, 8] = np.where(n_words > 0, (nonspace - n_punct) / safe_words, 0.0)
    out[:, 9] = np.where(n_sent > 0, n_words / safe_sent, 0.0)
    out[:, 10] = np.where(n_words > 0, n_stop / safe_words, 0.0)
    out[:, 11] = np.where(n_chars > 0, n_guj / safe_chars, 0.0)
    return out


