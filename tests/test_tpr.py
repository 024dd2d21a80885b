"""TopicalPageRank smoke + contract (LDA fixpoint -> no value oracle;
assert structure, determinism of the fitted pipeline within a session,
and that topical personalization changes the ranking vs plain
SingleRank for at least some docs)."""

from __future__ import annotations

from pke_spark.ops import graph, tpr


def test_tpr_contract(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(40).cache()
    got = tpr.topical_pagerank_topk(docs, 5).toPandas()
    assert set(got.columns) == {"doc_id", "rank", "candidate", "score"}
    assert got.doc_id.nunique() == 40
    for _, g in got.groupby("doc_id"):
        assert g["rank"].tolist() == list(range(1, len(g) + 1))
        assert (g["score"] >= 0).all()
        assert g.candidate.is_unique


def test_tpr_differs_from_singlerank(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(40).cache()
    a = tpr.topical_pagerank_topk(docs, 5).toPandas()
    b = graph.singlerank_topk(docs, 5).toPandas()
    merged = a.merge(b, on=["doc_id", "rank"], suffixes=("_tpr", "_sr"))
    # personalization must matter somewhere (scores differ even where
    # candidates agree)
    assert (merged.score_tpr - merged.score_sr).abs().max() > 1e-9
