"""Semantic property tests for dedup / similarity / keyphrase ops
(the DuckDB-equality gate is covered by scripts/check_oracle.py and the
driver; these assert the *meaning*: planted duplicates found, LSH
recall, simhash locality)."""

from __future__ import annotations

import numpy as np
import pytest

from pke_spark.ops import dedup, keyphrase, similarity


@pytest.fixture(scope="module")
def small_docs(spark):
    rows = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "alpha beta gamma delta epsilon zeta"),          # exact dup of 1
        (3, "alpha beta gamma delta epsilon eta"),           # near dup of 1
        (4, "totally different words here nothing shared"),
        (5, "alpha beta gamma delta epsilon zeta extra"),    # near dup of 1
        (6, "lorem ipsum dolor sit amet consectetur"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_dedup_exact_finds_planted_dup(small_docs):
    pdf = dedup.dedup_exact(small_docs).toPandas().set_index("doc_id")
    assert pdf.loc[1, "group_size"] == 2
    assert pdf.loc[2, "canonical_doc_id"] == 1
    assert pdf.loc[4, "group_size"] == 1


def test_minhash_est_tracks_true_jaccard(small_docs):
    pairs = dedup.minhash_lsh_pairs(small_docs).toPandas()
    pairs = pairs.set_index(["doc_a", "doc_b"])["est_jaccard"]
    # exact dup pair must be found with est 1.0
    assert pairs.get((1, 2)) == 1.0
    # unrelated docs must not beat the dup pair
    for (a, b), v in pairs.items():
        if (a, b) != (1, 2):
            assert v <= 1.0
    # near dup (1,3): 5/7 shared tokens -> high est if banded together
    if (1, 3) in pairs.index:
        assert pairs.get((1, 3)) >= 0.3


def test_simhash_locality(small_docs):
    pdf = dedup.simhash(small_docs).toPandas().set_index("doc_id")["simhash"]
    assert pdf[1] == pdf[2]  # identical docs, identical fingerprint
    ham_near = bin(int(pdf[1]) ^ int(pdf[3])).count("1")
    ham_far = bin(int(pdf[1]) ^ int(pdf[4])).count("1")
    assert ham_near <= ham_far


def test_ngram_jaccard_exact_pair(small_docs):
    pairs = dedup.ngram_jaccard_pairs(small_docs, threshold=0.99).toPandas()
    assert {(r.doc_a, r.doc_b) for r in pairs.itertuples()} >= {(1, 2)}


def test_ann_lsh_recall(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qv = [round(float(np.sin(i * 0.7 + 0.3)), 6) for i in range(64)]
    brute = similarity.ann_cosine_topk(emb, qv, 10).toPandas()
    approx = similarity.ann_lsh_topk(emb, qv, 10).toPandas()
    recall = len(set(brute.vec_id) & set(approx.vec_id)) / 10
    assert recall >= 0.5, f"LSH recall {recall} too low"
    # approx results are exactly re-ranked: scores must match brute
    merged = approx.merge(brute, on="vec_id", suffixes=("_a", "_b"))
    assert (merged.cos_a - merged.cos_b).abs().max() < 1e-9


def test_ngram_candidates_counts(spark):
    df = spark.createDataFrame(
        [(1, "red fox jumps")], "doc_id long, text string")
    got = keyphrase.ngram_candidates(df).toPandas()
    # unigrams: red fox jumps; bigrams: red fox, fox jumps; trigram: 1
    assert set(got.candidate) == {"red", "fox", "jumps", "red fox",
                                  "fox jumps", "red fox jumps"}
    assert got.tf.tolist() == [1] * 6


def test_candidate_runs_stoplist_split(spark):
    df = spark.createDataFrame(
        [(1, "red fox of the green hill")], "doc_id long, text string")
    got = keyphrase.candidate_runs(df).toPandas()
    assert set(got.candidate) == {"red fox", "green hill"}
