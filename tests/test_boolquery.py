"""Boolean-filtered BM25: fixture semantics + DataFrame-vs-index parity.

The DataFrame path is oracle-gated by the driver (boolean_search
entry); these tests pin the clause semantics on a hand-built corpus
with independently known answers and prove the index-backed driver path
(`wand.boolean_search`) returns row-for-row the same ranking, including
clause edge cases (absent must term, everything excluded, repeated
clause terms, must==score overlap).
"""

from __future__ import annotations

import pytest

from pke_spark.index.build import IndexReader, build_index
from pke_spark.index import wand
from pke_spark.ops import boolquery as BQ

FIXTURE = [
    (1, "x y z x"),     # has x,y,z
    (2, "x x q"),       # x only (+q)
    (3, "y z q"),       # y,z no x
    (4, "x y q q"),     # x,y + q
    (5, "x y"),         # x,y clean
]


@pytest.fixture(scope="module")
def fix_docs(spark):
    return spark.createDataFrame(FIXTURE, "doc_id long, text string")


@pytest.fixture(scope="module")
def fix_ix(spark, fix_docs, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("boolix"))
    build_index(fix_docs, d, n_parts=2, n_salts=2)
    return IndexReader(spark, d)


def test_must_filters(fix_docs):
    rows = BQ.boolean_bm25_topk(fix_docs, ["x", "y"], k=10).collect()
    assert {r.doc_id for r in rows} == {1, 4, 5}


def test_must_not_excludes(fix_docs):
    rows = BQ.boolean_bm25_topk(fix_docs, ["x", "y"], must_not=["q"],
                                k=10).collect()
    assert {r.doc_id for r in rows} == {1, 5}


def test_should_reranks_without_filtering(fix_docs):
    rows = BQ.boolean_bm25_topk(fix_docs, ["x"], should=["z"],
                                k=10).collect()
    assert {r.doc_id for r in rows} == {1, 2, 4, 5}
    # doc 1 is the only x-doc with z; z is rare -> its idf dominates
    assert rows[0].doc_id == 1


def test_absent_must_term_empty(fix_docs, fix_ix):
    assert not BQ.boolean_bm25_topk(fix_docs, ["nosuch"], k=10).collect()
    assert wand.boolean_search(fix_ix, ["nosuch"], k=10) == []


def test_everything_excluded(fix_docs, fix_ix):
    assert not BQ.boolean_bm25_topk(fix_docs, ["q"], must_not=["x", "y"],
                                    k=10).collect()
    assert wand.boolean_search(fix_ix, ["q"], must_not=["x", "y"],
                               k=10) == []


def test_conflicting_clauses_raise(fix_docs, fix_ix):
    with pytest.raises(ValueError):
        BQ.boolean_bm25_topk(fix_docs, ["x"], must_not=["x"])
    with pytest.raises(ValueError):
        wand.boolean_search(fix_ix, ["x"], must_not=["x"])


CASES = [
    (["x", "y"], [], []),
    (["x", "y"], ["z"], ["q"]),
    (["x"], ["y", "z"], []),
    (["x", "x"], ["y"], ["q", "q"]),  # repeated clause terms
    (["x"], ["x"], []),               # must==should overlap
]


@pytest.mark.parametrize("must,should,mnot", CASES)
def test_index_parity(fix_docs, fix_ix, must, should, mnot):
    df = BQ.boolean_bm25_topk(fix_docs, must, should, mnot, 10).collect()
    expect = [(int(r.rank), int(r.doc_id), float(r.score)) for r in df]
    assert wand.boolean_search(fix_ix, must, should, mnot, 10) == expect


def test_index_parity_sf(spark, sf_dir, tmp_path_factory):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    d = str(tmp_path_factory.mktemp("boolsf"))
    build_index(docs.selectExpr("doc_id", "text"), d)
    ix = IndexReader(spark, d)
    for must, should, mnot in ((["spark", "join"], ["window"], ["vector"]),
                               (["table"], [], ["spark"])):
        df = BQ.boolean_bm25_topk(docs, must, should, mnot, 10).collect()
        expect = [(int(r.rank), int(r.doc_id), float(r.score)) for r in df]
        assert wand.boolean_search(ix, must, should, mnot, 10) == expect
