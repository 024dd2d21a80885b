"""Independent single-node oracle (FIXTURES.md F3/F4/F5): pure-pandas
tokenizer + BM25, the analog of the reference's hand-built Counter in
tests/test_utils.py:49-67 and its golden top-k assertions. Used only by
tests and golden-fixture generation — never by the engine."""

from __future__ import annotations

import math
from collections import Counter

import pandas as pd

from .tokenizer import tokenize_text


def build_stats(texts: dict[int, str]):
    """doc_id->text -> (tf per doc, df, dl, N, avgdl)."""
    tfs: dict[int, Counter] = {}
    dls: dict[int, int] = {}
    df: Counter = Counter()
    for doc_id, text in texts.items():
        toks = tokenize_text(text)
        tfs[doc_id] = Counter(toks)
        dls[doc_id] = len(toks)
        df.update(set(toks))
    n = len(texts)
    avgdl = sum(dls.values()) / n if n else 0.0
    return tfs, df, dls, n, avgdl


def bm25_topk(texts: dict[int, str], query_terms: list[str], k: int = 10,
              k1: float = 1.2, b: float = 0.75) -> pd.DataFrame:
    """Exhaustive BM25 top-k, rounded + tie-broken exactly like the engine."""
    tfs, df, dls, n, avgdl = build_stats(texts)
    qset = sorted(set(query_terms))  # fixed summation order (SURVEY §7.3)
    scores = {}
    for doc_id, tf in tfs.items():
        s = 0.0
        for t in qset:
            if tf.get(t, 0) == 0 or df.get(t, 0) == 0:
                continue
            idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
            s += idf * (tf[t] * (k1 + 1.0)) / (
                tf[t] + k1 * (1.0 - b + b * dls[doc_id] / avgdl))
        if s > 0.0:
            scores[doc_id] = round(s, 6)
    rows = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return pd.DataFrame(
        {"rank": pd.array(range(1, len(rows) + 1), dtype="int64"),
         "doc_id": pd.array([r[0] for r in rows], dtype="int64"),
         "score": pd.array([r[1] for r in rows], dtype="float64")})


def term_stats(texts: dict[int, str]) -> pd.DataFrame:
    tfs, df, _, _, _ = build_stats(texts)
    cf: Counter = Counter()
    for tf in tfs.values():
        cf.update(tf)
    return pd.DataFrame(
        sorted((t, df[t], cf[t]) for t in df),
        columns=["term", "df", "cf"])


def postings(texts: dict[int, str]) -> pd.DataFrame:
    """Brute-force (term, doc_id, tf) sorted — golden for index round-trip."""
    tfs, _, _, _, _ = build_stats(texts)
    rows = []
    for doc_id, tf in tfs.items():
        for t, c in tf.items():
            rows.append((t, doc_id, c))
    rows.sort()
    return pd.DataFrame(rows, columns=["term", "doc_id", "tf"])
