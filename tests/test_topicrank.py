"""TopicRank: UPGMA clustering unit checks + Spark/driver parity."""

from __future__ import annotations

import numpy as np
import pandas as pd

from pke_spark.ops import topicrank
from pke_spark.tokenizer import TEXT_STOPWORDS, tokenize_text


def test_upgma_basic():
    # two tight pairs far apart -> 2 clusters at t=0.5
    d = np.array([
        [0.0, 0.1, 0.9, 0.9],
        [0.1, 0.0, 0.9, 0.9],
        [0.9, 0.9, 0.0, 0.2],
        [0.9, 0.9, 0.2, 0.0]])
    labels = topicrank._upgma_clusters(d, 0.5)
    assert labels[0] == labels[1] and labels[2] == labels[3]
    assert labels[0] != labels[2]


def test_upgma_all_merge():
    d = np.full((3, 3), 0.1)
    np.fill_diagonal(d, 0.0)
    labels = topicrank._upgma_clusters(d, 0.74)
    assert len(set(labels)) == 1


def test_runs_with_offsets():
    toks = tokenize_text("red fox of the red fox and green hill")
    got = topicrank._runs_with_offsets(toks, set(TEXT_STOPWORDS))
    assert got["red fox"][1] == [1, 5]
    assert got["green hill"][1] == [8]


def test_topicrank_groups_shared_stems(spark):
    df = spark.createDataFrame(
        [(1, "fast index build and the fast index merge and slow query "
             "planner of the slow query runtime")],
        "doc_id long, text string")
    got = topicrank.topicrank_topk(df, 5).toPandas()
    # 'fast index build' and 'fast index merge' share 2/4 stems
    # (jaccard distance 0.5 <= 0.74) -> one topic; likewise the 'slow
    # query *' pair -> expect exactly 2 topics, representative = first
    # occurring candidate of each
    assert len(got) == 2
    assert set(got.candidate) == {"fast index build", "slow query planner"}


def test_multipartite_runs_and_boosts(spark):
    df = spark.createDataFrame(
        [(1, "fast index build and the fast index merge and slow query "
             "planner of the slow query runtime")],
        "doc_id long, text string")
    got = topicrank.multipartiterank_topk(df, 5).toPandas()
    # all 4 candidates are ranked (candidate-level graph, no
    # representative collapse); first variants of each topic boosted
    assert len(got) == 4
    ranked = got.sort_values("rank").candidate.tolist()
    assert ranked[0] in ("fast index build", "slow query planner")


def test_multipartite_matches_driver(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(25).cache()
    pdf = docs.select("doc_id", "text").toPandas()
    got = (topicrank.multipartiterank_topk(docs, 5).toPandas()
           .sort_values(["doc_id", "rank"]).reset_index(drop=True))
    frames = []
    stopset = set(TEXT_STOPWORDS)
    for doc_id, text in sorted(zip(pdf.doc_id, pdf.text)):
        toks = tokenize_text(text)
        tdf = pd.DataFrame({"doc_id": doc_id, "pos": range(1, len(toks) + 1),
                            "term": toks})
        frames.append(topicrank._multipartite_doc(tdf, stopset, 5, 0.74, 1.1))
    want = (pd.concat(frames, ignore_index=True)
            .sort_values(["doc_id", "rank"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got.astype({"rank": "int32", "doc_id": "int64"}),
        want.astype({"rank": "int32", "doc_id": "int64"}),
        check_exact=False, atol=1e-9)


def test_topicrank_matches_driver(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(40).cache()
    pdf = docs.select("doc_id", "text").toPandas()
    got = (topicrank.topicrank_topk(docs, 5).toPandas()
           .sort_values(["doc_id", "rank"]).reset_index(drop=True))
    frames = []
    stopset = set(TEXT_STOPWORDS)
    for doc_id, text in sorted(zip(pdf.doc_id, pdf.text)):
        toks = tokenize_text(text)
        tdf = pd.DataFrame({"doc_id": doc_id, "pos": range(1, len(toks) + 1),
                            "term": toks})
        frames.append(topicrank._topicrank_doc(tdf, stopset, 5, 0.74))
    want = (pd.concat(frames, ignore_index=True)
            .sort_values(["doc_id", "rank"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got.astype({"rank": "int32", "doc_id": "int64"}),
        want.astype({"rank": "int32", "doc_id": "int64"}),
        check_exact=False, atol=1e-9)
