"""Distribution invariance for graph ranking: the Spark applyInPandas
pipeline equals a driver-side recomputation with the SAME engine code
(`graph._rank_doc`) — this proves tokenize/partition/groupBy plumbing,
NOT PageRank correctness. True correctness parity against networkx with
pke's exact call signatures lives in tests/test_graph_nx.py."""

from __future__ import annotations

import pandas as pd
import pytest

from pke_spark.ops import graph
from pke_spark.tokenizer import TEXT_STOPWORDS, tokenize_text


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50).cache()


def _driver_topk(texts: dict[int, str], k: int, window: int, weighted: bool,
                 personalize: bool) -> pd.DataFrame:
    stopset = set(TEXT_STOPWORDS)
    frames = []
    for doc_id, text in sorted(texts.items()):
        toks = tokenize_text(text)
        pdf = pd.DataFrame({"doc_id": doc_id,
                            "pos": range(1, len(toks) + 1),
                            "term": toks})
        frames.append(graph._rank_doc(pdf, stopset, window, weighted,
                                      personalize, k))
    return pd.concat(frames, ignore_index=True)


@pytest.mark.parametrize("fn,window,weighted,personalize", [
    (graph.textrank_topk, 2, False, False),
    (graph.singlerank_topk, 10, True, False),
    (graph.positionrank_topk, 10, True, True),
])
def test_graph_models_match_driver(spark, docs, fn, window, weighted,
                                   personalize):
    pdf = docs.select("doc_id", "text").toPandas()
    texts = dict(zip(pdf.doc_id, pdf.text))
    got = (fn(docs, 5).toPandas()
           .sort_values(["doc_id", "rank"]).reset_index(drop=True))
    want = (_driver_topk(texts, 5, window, weighted, personalize)
            .sort_values(["doc_id", "rank"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got.astype({"rank": "int32", "doc_id": "int64"}),
        want.astype({"rank": "int32", "doc_id": "int64"}),
        check_exact=False, atol=1e-9)


def test_textrank_sanity(spark):
    df = spark.createDataFrame(
        [(1, "spark engine builds the spark index and the spark engine runs")],
        "doc_id long, text string")
    got = graph.textrank_topk(df, 3).toPandas()
    assert len(got) >= 1
    # 'spark' is the most connected word; top candidate should contain it
    assert "spark" in got.iloc[0].candidate
