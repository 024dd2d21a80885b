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


def test_tpr_model_roundtrip(spark, sf_dir, tmp_path):
    """K2 round-trip: serve-from-disk == serve-from-memory (same model),
    which is the determinism claim behind the committed fixture
    (pke_spark/models/tpr_sf001) and the frozen golden."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(40).cache()
    model_dir = str(tmp_path / "tpr_model")
    model = tpr.train_tpr(docs, model_dir=model_dir)
    served_mem = tpr.topical_pagerank_topk(docs, 5, model=model).toPandas()
    loaded = tpr.load_tpr(spark, model_dir)
    served_disk = tpr.topical_pagerank_topk(docs, 5, model=loaded).toPandas()
    key = ["doc_id", "rank"]
    a = served_mem.sort_values(key).reset_index(drop=True)
    b = served_disk.sort_values(key).reset_index(drop=True)
    assert a.equals(b)


def test_tpr_committed_fixture_loads(spark, sf_dir):
    """The committed artifact (scripts/train_tpr_fixture.py) must load
    and serve any corpus (OOV words fall back to min-W, as in
    single_tpr.py:175-179)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(10).cache()
    model = tpr.load_tpr_cached(spark)
    got = tpr.topical_pagerank_topk(docs, 5, model=model).toPandas()
    assert got.doc_id.nunique() == 10


def test_pke_lda_pickle_interop(spark, sf_dir, tmp_path):
    """pke artifact interop (utils.py:309-327): save/load the exact
    gzip-pickle tuple format, then serve topical_pagerank from it
    (mean-field inference adapter), deterministically."""
    import gzip
    import pickle

    import numpy as np

    rng_vocab = ["build", "index", "merge", "token", "query", "score",
                 "shard", "block", "delta", "posting"]
    k, v = 4, len(rng_vocab)
    # deterministic synthetic sklearn-LDA state (components_ > 0)
    comp = 1.0 + (np.arange(k * v, dtype=np.float64).reshape(k, v) % 7)
    exp_dc = np.exp(np.log(comp) - np.log(comp.sum(axis=1))[:, None])
    path = str(tmp_path / "lda.pickle.gz")
    tpr.save_lda_pickle(path, rng_vocab, comp, exp_dc, 1.0 / k)

    # byte-format parity: a plain pickle.load sees pke's 4-tuple
    with gzip.open(path, "rb") as f:
        tup = pickle.load(f)
    assert len(tup) == 4 and list(tup[0]) == rng_vocab

    d, c2, e2, p2 = tpr.load_lda_pickle(path)
    assert d == rng_vocab and np.allclose(c2, comp) and p2 == 1.0 / k

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(12).cache()
    model = tpr.load_tpr_pke(spark, path)
    a = tpr.topical_pagerank_topk(docs, 5, model=model).toPandas() \
        .sort_values(["doc_id", "rank"]).reset_index(drop=True)
    assert a.doc_id.nunique() == 12
    b = tpr.topical_pagerank_topk(docs, 5, model=model).toPandas() \
        .sort_values(["doc_id", "rank"]).reset_index(drop=True)
    assert a.equals(b)  # deterministic inference
