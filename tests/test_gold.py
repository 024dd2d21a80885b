"""Gold loaders (S6): JSON + SemEval formats, '+' variants, stemming
normalization, LOO exclusion; leave-one-out Kea training (M5) and
MinMax scaling (A11)."""

from __future__ import annotations

import json

from pke_spark import gold
from pke_spark.ops import supervised


def test_load_references_json(spark, tmp_path):
    p = tmp_path / "refs.json"
    p.write_text(json.dumps({
        "d1": [["machine learning", "ml models"], ["neural nets"]],
        "d2": [["data engine"]],
    }))
    got = {(r.doc_id, r.gold)
           for r in gold.load_references(spark, str(p)).collect()}
    assert got == {("d1", "machine learning"), ("d1", "ml models"),
                   ("d1", "neural nets"), ("d2", "data engine")}


def test_load_references_semeval_plus_variants(spark, tmp_path):
    p = tmp_path / "refs.final"
    p.write_text("doc-1 : alpha beta,gamma+gammas\n"
                 "doc-2 : delta engine\n")
    got = {(r.doc_id, r.gold)
           for r in gold.load_references(spark, str(p)).collect()}
    assert got == {("doc-1", "alpha beta"), ("doc-1", "gamma"),
                   ("doc-1", "gammas"), ("doc-2", "delta engine")}


def test_load_references_normalize_and_exclude(spark, tmp_path):
    p = tmp_path / "refs.final"
    p.write_text("a : running engines,caresses\nb : ponies\n")
    got = {(r.doc_id, r.gold) for r in gold.load_references(
        spark, str(p), normalize=True, excluded_doc="b").collect()}
    # porter: running->run, engines->engin, caresses->caress
    assert got == {("a", "run engin"), ("a", "caress")}


def test_loo_folds(spark, tmp_path):
    p = tmp_path / "refs.final"
    p.write_text("x : kp one\ny : kp two\nz : kp three\n")
    g = gold.load_references(spark, str(p))
    folds = gold.loo_folds(g)
    assert [d for d, _, _ in folds] == ["x", "y", "z"]
    for d, train, held in folds:
        assert held.filter(held.doc_id != d).count() == 0
        assert train.filter(train.doc_id == d).count() == 0
        assert train.count() + held.count() == 3


def test_kea_loo_and_minmax(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(8).cache()
    g = supervised.weak_gold(docs).withColumnRenamed("term", "gold")
    res = supervised.kea_fit_predict_loo(docs, g, k=3, minmax=True).collect()
    # docs whose candidates all die in the F1 filter produce no ranks;
    # every doc WITH candidates must be covered by its own fold
    with_cands = {r.doc_id for r in
                  supervised.kea_features(docs).select("doc_id")
                  .distinct().collect()}
    assert with_cands  # fixture must exercise at least one fold
    assert {r.doc_id for r in res} == with_cands
    for r in res:
        assert 1 <= r.rank <= 3
        assert 0.0 <= r.p_keyphrase <= 1.0


def test_scale_minmax_bounds(spark):
    df = spark.createDataFrame(
        [(1, 2.0, 7.0), (2, 4.0, 7.0), (3, 10.0, 7.0)], "id int, a double, b double")
    out = {r.id: (r.a, r.b)
           for r in supervised.scale_minmax(df, ["a", "b"]).collect()}
    assert out[1] == (0.0, 0.0) and out[3] == (1.0, 0.0)
    assert abs(out[2][0] - 0.25) < 1e-12  # (4-2)/(10-2)
