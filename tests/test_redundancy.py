"""get_n_best greedy redundancy removal parity (pke/base.py:129-206)."""

from __future__ import annotations

from pke_spark.ops import keyphrase


def test_greedy_subsequence_removal(spark):
    # weights force order: "big data engine" > "data engine" (contained,
    # dropped) > "engine room" (kept: not a contiguous subsequence) >
    # "big data" (contained in #1, dropped) > "room" (contained in
    # "engine room", dropped)
    rows = [
        (1, "big data engine", 5.0),
        (1, "data engine", 4.0),
        (1, "engine room", 3.0),
        (1, "big data", 2.0),
        (1, "room", 1.0),
        (2, "alpha", 1.0),
    ]
    df = spark.createDataFrame(rows, "doc_id long, candidate string, weight double")
    got = keyphrase.redundancy_topk(df, 3).toPandas()
    d1 = got[got.doc_id == 1].sort_values("rank")
    assert d1.candidate.tolist() == ["big data engine", "engine room"]
    assert got[got.doc_id == 2].candidate.tolist() == ["alpha"]


def test_kpminer_dedup_runs(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(30)
    got = keyphrase.kpminer_dedup(docs, 5).toPandas()
    # contract: per-doc ranks are 1..n without gaps, no duplicates
    for _, g in got.groupby("doc_id"):
        assert g["rank"].tolist() == list(range(1, len(g) + 1))
        assert g.candidate.is_unique
