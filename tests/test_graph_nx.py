"""TRUE networkx parity for the graph models (G1-G6 + the TPR
personalized-pagerank core): the engine's numpy pagerank + graph
construction vs an independent driver-side mirror of the REFERENCE's
loops (pke/unsupervised/graph_based/*.py) scored with ``nx.pagerank``
using pke's exact call signatures:

- TextRank      nx_pagerank(G, alpha=0.85, tol=0.0001, weight=None)
                (textrank.py:158)
- SingleRank    nx_pagerank(G, alpha=0.85, tol=0.0001, weight='weight')
                (singlerank.py:128-131)
- PositionRank  nx_pagerank(G, alpha=0.85, tol=0.0001,
                personalization=positions, weight='weight')
                (positionrank.py:171-175)
- TopicRank     nx_pagerank(G, alpha=0.85, weight='weight')
                (topicrank.py:219; tol = networkx default 1e-6)
- Multipartite  nx_pagerank(G)  (multipartiterank.py:223; DiGraph)
- TPR core      nx_pagerank(G, personalization=W, alpha=0.85,
                tol=0.0001, weight='weight') (single_tpr.py:189-193)

The graph-building loops below transcribe the REFERENCE's algorithms
(not the engine's) so a bug in the engine's dense pagerank or adjacency
construction cannot hide. This replaces the round-1 circular test.
"""

from __future__ import annotations

import math
from itertools import combinations

import networkx as nx
from networkx.algorithms.link_analysis.pagerank_alg import \
    _pagerank_python as nx_pagerank  # scipy absent in this sandbox; same semantics
import numpy as np
import pandas as pd
import pytest

from pke_spark.ops import graph, topicrank
from pke_spark.tokenizer import TEXT_STOPWORDS, tokenize_text

STOPSET = set(TEXT_STOPWORDS)
N_DOCS = 40


@pytest.fixture(scope="module")
def doc_texts(spark, sf_dir):
    pdf = (spark.read.parquet(f"{sf_dir}/documents.parquet")
           .limit(N_DOCS).select("doc_id", "text").toPandas())
    return dict(zip(pdf.doc_id, pdf.text))


@pytest.fixture(scope="module")
def docs_df(spark, sf_dir):
    return (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .limit(N_DOCS).cache())


# ---------------------------------------------------------------- mirrors
# of the reference's graph construction (pke file:line in comments)

def _pke_word_graph_fulltext(terms, window, weighted):
    """textrank.py:109-128 / singlerank.py:87-105: flatten doc as
    (word, valid) incl. stopwords in the window distance."""
    text = [(w, w not in STOPSET) for w in terms]
    G = nx.Graph()
    G.add_nodes_from([w for w, v in text if v])
    for i, (n1, v1) in enumerate(text):
        if not v1:
            continue
        for j in range(i + 1, min(i + window, len(text))):
            n2, v2 = text[j]
            if v2 and n1 != n2:
                if weighted:
                    if not G.has_edge(n1, n2):
                        G.add_edge(n1, n2, weight=0.0)
                    G[n1][n2]["weight"] += 1.0
                else:
                    G.add_edge(n1, n2)
    return G


def _pke_positionrank_graph(terms, positions, window):
    """positionrank.py:120-144: filtered (word, position) list, window
    over ORIGINAL positions, plus the inverse-position bias vector
    (1-based positions here = pke's 0-based + 1)."""
    text = [(w, p) for w, p in zip(terms, positions) if w not in STOPSET]
    G = nx.Graph()
    G.add_nodes_from([w for w, _ in text])
    for i, (n1, p1) in enumerate(text):
        j = i + 1
        while j < len(text) and (text[j][1] - p1) < window:
            n2 = text[j][0]
            if n1 != n2:
                if not G.has_edge(n1, n2):
                    G.add_edge(n1, n2, weight=0)
                G[n1][n2]["weight"] += 1
            j += 1
    pos_bias: dict[str, float] = {}
    for w, p in text:
        pos_bias[w] = pos_bias.get(w, 0.0) + 1.0 / p
    return G, pos_bias


def _topk_frame(doc_id, cand_scores, k):
    top = sorted(cand_scores.items(), key=lambda kv: (-round(kv[1], 6), kv[0]))[:k]
    return pd.DataFrame({
        "doc_id": doc_id,
        "rank": pd.array(range(1, len(top) + 1), dtype="int32"),
        "candidate": [t for t, _ in top],
        "score": [round(s, 6) for _, s in top]})


def _sum_runs(terms, scores):
    cands: dict[str, float] = {}
    run: list[str] = []
    for t in list(terms) + ["<END-STOP>"]:
        if t in STOPSET or t == "<END-STOP>":
            if run:
                cands.setdefault(" ".join(run),
                                 sum(scores.get(w, 0.0) for w in run))
            run = []
        else:
            run.append(t)
    return cands


def _assert_topk_equal(got: pd.DataFrame, want: pd.DataFrame):
    got = got.sort_values(["doc_id", "rank"]).reset_index(drop=True)
    want = want.sort_values(["doc_id", "rank"]).reset_index(drop=True)
    assert list(got.doc_id) == list(want.doc_id)
    assert list(got.candidate) == list(want.candidate)
    np.testing.assert_allclose(got.score.to_numpy(), want.score.to_numpy(),
                               atol=2e-6)


# ----------------------------------------------------------------- tests

def test_textrank_nx_parity(docs_df, doc_texts):
    got = graph.textrank_topk(docs_df, 5).toPandas()
    frames = []
    for doc_id, text in sorted(doc_texts.items()):
        terms = tokenize_text(text)
        G = _pke_word_graph_fulltext(terms, window=2, weighted=False)
        w = nx_pagerank(G, alpha=0.85, tol=0.0001, weight=None) if len(G) else {}
        frames.append(_topk_frame(doc_id, _sum_runs(terms, w), 5))
    _assert_topk_equal(got, pd.concat(frames, ignore_index=True))


def test_singlerank_nx_parity(docs_df, doc_texts):
    got = graph.singlerank_topk(docs_df, 5).toPandas()
    frames = []
    for doc_id, text in sorted(doc_texts.items()):
        terms = tokenize_text(text)
        G = _pke_word_graph_fulltext(terms, window=10, weighted=True)
        w = (nx_pagerank(G, alpha=0.85, tol=0.0001, weight="weight")
             if len(G) else {})
        frames.append(_topk_frame(doc_id, _sum_runs(terms, w), 5))
    _assert_topk_equal(got, pd.concat(frames, ignore_index=True))


def test_positionrank_nx_parity(docs_df, doc_texts):
    got = graph.positionrank_topk(docs_df, 5).toPandas()
    frames = []
    for doc_id, text in sorted(doc_texts.items()):
        terms = tokenize_text(text)
        positions = list(range(1, len(terms) + 1))
        G, bias = _pke_positionrank_graph(terms, positions, window=10)
        if len(G):
            norm = sum(bias.values())
            bias = {k: v / norm for k, v in bias.items()}
            w = nx_pagerank(G, alpha=0.85, tol=0.0001,
                            personalization=bias, weight="weight")
        else:
            w = {}
        frames.append(_topk_frame(doc_id, _sum_runs(terms, w), 5))
    _assert_topk_equal(got, pd.concat(frames, ignore_index=True))


def test_tpr_personalized_pagerank_core_nx_parity(doc_texts):
    """The TPR pagerank core (_pagerank_scores_custom) vs nx.pagerank
    with an arbitrary deterministic personalization map — isolates the
    custom-personalization path from the LDA model."""
    for doc_id, text in sorted(doc_texts.items())[:10]:
        terms = tokenize_text(text)
        positions = list(range(1, len(terms) + 1))
        nodes = sorted({t for t in terms if t not in STOPSET})
        if not nodes:
            continue
        pers = {t: (1.0 + (hash_stable(t) % 97)) for t in nodes}
        s = sum(pers.values())
        pers = {t: v / s for t, v in pers.items()}
        got = graph._pagerank_scores_custom(terms, positions, STOPSET,
                                            10, True, pers)
        # reference graph: singlerank-style weighted graph, window 10
        G = _pke_word_graph_fulltext(terms, window=10, weighted=True)
        want = nx_pagerank(G, personalization=pers, alpha=0.85,
                           tol=0.0001, weight="weight")
        for t in nodes:
            assert abs(got[t] - want[t]) < 2e-6, (doc_id, t)


def hash_stable(s: str) -> int:
    import zlib
    return zlib.crc32(s.encode())


def _pke_compute_gap(p_i, p_j, len_i, len_j):
    # topicrank.py:158-171
    gap = abs(p_i - p_j)
    if p_i < p_j:
        gap -= len_i - 1
    elif p_i > p_j:
        gap -= len_j - 1
    if gap == 0:
        gap = 1
    return gap


def test_topicrank_nx_parity(docs_df, doc_texts):
    got = topicrank.topicrank_topk(docs_df, 5).toPandas()
    frames = []
    for doc_id, text in sorted(doc_texts.items()):
        terms = tokenize_text(text)
        cands = topicrank._runs_with_offsets(terms, STOPSET)
        names = sorted(cands)
        if not names:
            continue
        if len(names) == 1:
            labels = [0]
        else:
            labels = topicrank._upgma_clusters(
                topicrank._jaccard_count_dist(names, cands), 0.74)
        topics: dict[int, list[str]] = {}
        for n, lab in zip(names, labels):
            topics.setdefault(lab, []).append(n)
        tids = sorted(topics)
        # build_topic_graph (topicrank.py:173-191) with networkx
        G = nx.Graph()
        G.add_nodes_from(range(len(tids)))
        for i, j in combinations(range(len(tids)), 2):
            G.add_edge(i, j, weight=0.0)
            for ci in topics[tids[i]]:
                for cj in topics[tids[j]]:
                    len_i = len(cands[ci][0])
                    len_j = len(cands[cj][0])
                    for p_i in cands[ci][1]:
                        for p_j in cands[cj][1]:
                            G[i][j]["weight"] += 1.0 / _pke_compute_gap(
                                p_i, p_j, len_i, len_j)
        w = nx_pagerank(G, alpha=0.85, weight="weight")
        scores: dict[str, float] = {}
        for i, tid in enumerate(tids):
            first = min(topics[tid], key=lambda n: min(cands[n][1]))
            scores[first] = w[i]
        frames.append(_topk_frame(doc_id, scores, 5))
    _assert_topk_equal(got, pd.concat(frames, ignore_index=True))


def test_multipartiterank_nx_parity(docs_df, doc_texts):
    got = topicrank.multipartiterank_topk(docs_df, 5).toPandas()
    alpha_mp = 1.1
    frames = []
    for doc_id, text in sorted(doc_texts.items()):
        terms = tokenize_text(text)
        cands = topicrank._runs_with_offsets(terms, STOPSET)
        names = sorted(cands)
        if not names:
            continue
        if len(names) == 1:
            labels = [0]
        else:
            labels = topicrank._upgma_clusters(
                topicrank._jaccard_count_dist(names, cands), 0.74)
        topic_of = dict(zip(names, labels))
        topics: dict[int, list[str]] = {}
        for n, lab in zip(names, labels):
            topics.setdefault(lab, []).append(n)
        # build_topic_graph (multipartiterank.py:118-147), DiGraph
        G = nx.DiGraph()
        G.add_nodes_from(names)
        for ni, nj in combinations(names, 2):
            if topic_of[ni] == topic_of[nj]:
                continue
            len_i, len_j = len(cands[ni][0]), len(cands[nj][0])
            weights = [1.0 / _pke_compute_gap(p_i, p_j, len_i, len_j)
                       for p_i in cands[ni][1] for p_j in cands[nj][1]]
            if weights:
                G.add_edge(ni, nj, weight=sum(weights))
                G.add_edge(nj, ni, weight=sum(weights))
        # weight_adjustment (multipartiterank.py:149-195), with the
        # engine's documented 1-based-position adaptation
        weighted_edges: dict[tuple[str, str], float] = {}
        for variants in topics.values():
            if len(variants) == 1:
                continue
            offsets = [min(cands[v][1]) for v in variants]
            first = variants[offsets.index(min(offsets))]
            for start, end in G.edges(first):
                boosters = [G[v][end]["weight"] for v in variants
                            if v != first and G.has_edge(v, end)]
                if boosters:
                    weighted_edges[(start, end)] = float(np.sum(boosters))
        for (ni, nj), boosters in weighted_edges.items():
            position_i = math.exp(1.0 / (1 + min(cands[ni][1])))
            G[nj][ni]["weight"] += boosters * alpha_mp * position_i
        w = nx_pagerank(G)
        frames.append(_topk_frame(doc_id, dict(w), 5))
    _assert_topk_equal(got, pd.concat(frames, ignore_index=True))


def test_textrank_top_percent_nx_parity(docs_df, doc_texts):
    """T3: top-percent keyword-run rebuild (textrank.py:160-185) vs the
    nx mirror with floor(n*T) kept words and offset tie-break."""
    import math as _math
    T = 0.33
    got = graph.textrank_top_percent(docs_df, 5, T).toPandas()
    frames = []
    for doc_id, text in sorted(doc_texts.items()):
        terms = tokenize_text(text)
        G = _pke_word_graph_fulltext(terms, window=2, weighted=False)
        if not len(G):
            continue
        w = nx_pagerank(G, alpha=0.85, tol=0.0001, weight=None)
        to_keep = int(min(_math.floor(len(G) * T), len(G)))
        kept = set(sorted(w, key=lambda t: (-w[t], t))[:to_keep])
        cands: dict[str, float] = {}
        run: list[str] = []
        start = None
        for i, t in enumerate(terms + ["<STOP>"]):
            if t in kept:
                if not run:
                    start = i + 1
                run.append(t)
            else:
                if run:
                    p = " ".join(run)
                    cands.setdefault(p, sum(w[x] for x in run) + start * 1e-8)
                run, start = [], None
        if cands:
            frames.append(_topk_frame(doc_id, cands, 5))
    want = pd.concat(frames, ignore_index=True)
    got = got[got.doc_id.isin(want.doc_id.unique())]
    _assert_topk_equal(got, want)
