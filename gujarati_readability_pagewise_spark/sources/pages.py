"""Deterministic synthetic Common-Crawl-style pages generator.

Produces the graft's exact input table (BASELINE.json ``input_hint``)::

    (url: string, warc_ts: timestamp, html: binary, text: string, lang: string)

plus companion ``labels`` and golden tables, all as pure functions of
``(n_rows, seed)`` — the reference pins seed=42 for every split
(``/root/reference/data/train_test_split_page_level.json`` ``random_seed``).

Shape mirrors FIXTURES.md §1:

* ~35 distinct hosts (the reference's 35 books) with ONE heavy-hitter host
  (``big.example.gu``) holding ≥30 % of rows so the skew/salting path is
  actually exercised (SURVEY.md §7 hard part 3);
* HTML = boilerplate templates (nav/footer link farms, high link density)
  wrapping a Gujarati body — readable pages get long clean prose,
  non-readable pages get short/mixed/noisy bodies;
* corrupt rows: empty bytes, truncated tags, non-UTF-8 junk, no-body pages
  (the reference's corrupt-image fallback,
  ``extract_pagewise_features.py:49-69``).

Everything uses ``numpy.random.RandomState`` (fixed algorithm, stable across
numpy versions for these calls) — never ``random`` or ``rand()`` in Spark.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = ["gen_pages_pdf", "gen_labels_pdf", "PAGES_SCHEMA_DDL", "HEAVY_HOST", "hosts"]

PAGES_SCHEMA_DDL = "url string, warc_ts timestamp, html binary, text string, lang string"

HEAVY_HOST = "big.example.gu"
_N_HOSTS = 34  # + the heavy hitter = 35 "books"

# -- deterministic Gujarati vocabulary ---------------------------------------
# Build words from real akshara patterns: consonant (+matra), some conjuncts.
_CONS = [chr(c) for c in range(0x0A95, 0x0AB9 + 1) if chr(c).isalpha()]
_MATRA = ["", "ા", "િ", "ી", "ુ", "ૂ", "ે", "ો"]
_ENG = [
    "data", "page", "book", "scan", "print", "read", "text", "line", "word",
    "study", "note", "index", "cover", "title", "press", "paper", "story",
]


def _vocab(rng: np.random.RandomState, size: int = 400) -> list[str]:
    words = []
    for _ in range(size):
        n_ak = 2 + int(rng.randint(0, 3))
        w = []
        for _ in range(n_ak):
            c = _CONS[int(rng.randint(0, len(_CONS)))]
            m = _MATRA[int(rng.randint(0, len(_MATRA)))]
            if rng.randint(0, 8) == 0:  # conjunct
                w.append(c + "્" + _CONS[int(rng.randint(0, len(_CONS)))] + m)
            else:
                w.append(c + m)
        words.append("".join(w))
    return words


def hosts() -> list[str]:
    return [HEAVY_HOST] + [f"host{i:02d}.example.gu" for i in range(_N_HOSTS)]


_NAV = (
    '<nav><ul><li><a href="/">મુખ્ય</a></li><li><a href="/books">પુસ્તકો</a></li>'
    '<li><a href="/about">વિશે</a></li><li><a href="/contact">સંપર્ક</a></li>'
    '<li><a href="/archive">આર્કાઇવ</a></li><li><a href="/help">મદદ</a></li></ul></nav>'
)
_FOOTER = (
    '<footer><p><a href="/terms">શરતો</a> | <a href="/privacy">ગોપનીયતા</a> | '
    '<a href="/sitemap">સાઇટમેપ</a> | <a href="/rss">RSS</a></p>'
    "<p>copyright 2024 example press</p></footer>"
)
_SIDEBAR = (
    '<aside><h3>લિંક્સ</h3><ul>%s</ul></aside>'
)


def _sentence(rng: np.random.RandomState, vocab: list[str], lo: int, hi: int) -> str:
    n = int(rng.randint(lo, hi))
    ws = [vocab[int(rng.randint(0, len(vocab)))] for _ in range(n)]
    end = "." if rng.randint(0, 4) else "।"
    return " ".join(ws) + end


def _paragraph(rng, vocab, n_sent_lo, n_sent_hi, w_lo=6, w_hi=14) -> str:
    k = int(rng.randint(n_sent_lo, n_sent_hi))
    return " ".join(_sentence(rng, vocab, w_lo, w_hi) for _ in range(k))


def _page_html(rng, vocab, eng, readable: bool) -> tuple[bytes, int]:
    """Render one page; returns (html_bytes, label 1=readable)."""
    side_links = "".join(
        f'<li><a href="/b/{i}">{vocab[int(rng.randint(0, len(vocab)))]}</a></li>'
        for i in range(int(rng.randint(4, 9)))
    )
    parts = [
        "<html><head><title>page</title><style>body{margin:0}</style>",
        "<script>var x=1;</script></head><body>",
        _NAV,
        _SIDEBAR % side_links,
    ]
    if readable:
        for _ in range(int(rng.randint(3, 7))):
            parts.append("<p>%s</p>" % _paragraph(rng, vocab, 3, 7))
    else:
        mode = int(rng.randint(0, 3))
        if mode == 0:        # nearly empty body
            parts.append("<p>%s</p>" % _sentence(rng, vocab, 2, 5))
        elif mode == 1:      # noisy mixed-script / digit-heavy
            junk = " ".join(
                f"{eng[int(rng.randint(0, len(eng)))]} {int(rng.randint(0, 9999))} ###"
                for _ in range(int(rng.randint(12, 25)))
            )
            parts.append("<p>%s</p>" % junk)
        else:                # link farm only
            farm = " ".join(
                f'<a href="/x/{j}">{vocab[int(rng.randint(0, len(vocab)))]}</a>'
                for j in range(int(rng.randint(15, 30)))
            )
            parts.append("<div>%s</div>" % farm)
    parts.append(_FOOTER)
    parts.append("</body></html>")
    return "".join(parts).encode("utf-8"), int(readable)


def gen_pages_pdf(n_rows: int, seed: int = 42, corrupt_frac: float = 0.02) -> pd.DataFrame:
    """Pages table as pandas (columns exactly per input_hint, + hidden label).

    The returned frame carries a ``_label`` column (1=readable) used by
    :func:`gen_labels_pdf`; drop it before handing the frame to Spark as the
    ``pages`` table.
    """
    rng = np.random.RandomState(seed)
    vocab = _vocab(rng)
    all_hosts = hosts()
    # host assignment: heavy hitter gets ~32 % of rows (skew), rest uniform
    r = rng.random_sample(n_rows)
    host_idx = np.where(
        r < 0.32, 0, 1 + (rng.randint(0, _N_HOSTS, size=n_rows))
    )
    # per-host readability prior: ~55 % of hosts are "good books"
    host_quality = rng.random_sample(len(all_hosts)) < 0.55
    base_ts = np.datetime64("2024-03-01T00:00:00")

    rows = []
    for i in range(n_rows):
        h = all_hosts[int(host_idx[i])]
        readable = bool(host_quality[host_idx[i]]) ^ (rng.randint(0, 10) == 0)
        html, label = _page_html(rng, vocab, _ENG, readable)
        lang = "gu" if readable or rng.randint(0, 3) else ("en", "hi", "und")[int(rng.randint(0, 3))]
        u = rng.random_sample()
        if u < corrupt_frac:
            kind = int(rng.randint(0, 3))
            if kind == 0:
                html = b""
            elif kind == 1:
                html = html[: max(10, len(html) // 3)]  # truncated mid-tag
            else:
                html = b"\xff\xfe\x00junk" + bytes(rng.randint(0, 256, 16).astype(np.uint8))
        url = f"https://{h}/{'book%02d' % int(host_idx[i])}/page-{i:06d}.html"
        ts = base_ts + np.timedelta64(int(rng.randint(0, 90 * 24 * 3600)), "s")
        pre_text = None
        if rng.randint(0, 5) == 0:  # some rows carry stale pre-extracted text
            pre_text = "stale pre-extracted text not to be trusted"
        rows.append((url, pd.Timestamp(ts), html, pre_text, lang, label))

    pdf = pd.DataFrame(
        rows, columns=["url", "warc_ts", "html", "text", "lang", "_label"]
    )
    return pdf


def gen_labels_pdf(pages_pdf: pd.DataFrame, seed: int = 42) -> pd.DataFrame:
    """Labels table (url, label, label_bookwise) — ~10 % unlabeled (NULL),
    mirroring the reference's nullable ``Readability`` column."""
    rng = np.random.RandomState(seed + 1)
    lab = pages_pdf[["url", "_label"]].copy()
    mask = rng.random_sample(len(lab)) < 0.10
    lab["label"] = lab["_label"].astype("float64")
    lab.loc[mask, "label"] = np.nan
    host = lab["url"].str.extract(r"https://([^/]+)/", expand=False)
    book_mean = lab.groupby(host)["_label"].transform("mean")
    lab["label_bookwise"] = (book_mean > 0.5).astype("int32")
    return lab[["url", "label", "label_bookwise"]]
