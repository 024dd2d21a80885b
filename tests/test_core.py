"""Engine core vs independent pure-pandas oracle on the synthetic
source-code corpus (input_hint shape), plus the per-row sha256
invariant (north rule) and entry() smoke."""

from __future__ import annotations

import hashlib

import pandas as pd
import pytest

import __spark_entry__ as entry_mod
from pke_spark.corpus import synth_corpus, with_doc_ids
from pke_spark.ops import core
from pke_spark import oracle

N_DOCS = 120


@pytest.fixture(scope="module")
def corpus(spark):
    c = with_doc_ids(synth_corpus(spark, N_DOCS, partitions=4)).cache()
    c.count()
    pdf = c.select("doc_id", "content").toPandas()
    return c, dict(zip(pdf.doc_id, pdf.content))


def test_sha256_invariant(corpus):
    """content_sha computed by Spark equals hashlib over the same rows."""
    c, _ = corpus
    pdf = c.select("content", "content_sha").toPandas()
    for _, r in pdf.head(50).iterrows():
        assert hashlib.sha256(r.content.encode()).hexdigest() == r.content_sha


def test_doc_ids_unique(corpus):
    c, texts = corpus
    assert len(texts) == N_DOCS


def test_term_stats_vs_oracle(corpus):
    c, texts = corpus
    docs = c.select("doc_id", c.content.alias("text"))
    got = (core.term_stats(docs).toPandas()
           .sort_values("term").reset_index(drop=True))
    want = oracle.term_stats(texts)
    pd.testing.assert_frame_equal(
        got.astype({"df": "int64", "cf": "int64"}), want.astype({"df": "int64", "cf": "int64"}))


def test_bm25_vs_oracle(corpus):
    c, texts = corpus
    docs = c.select("doc_id", c.content.alias("text"))
    for q in (["build", "index"], ["def"], ["uniq", "tok", "7"],
              ["decode", "varint", "cursor"], ["nosuchtermxyz"]):
        got = core.bm25_topk(docs, q, 10).toPandas()
        want = oracle.bm25_topk(texts, q, 10)
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True).astype({"rank": "int64", "doc_id": "int64"}),
            want.astype({"rank": "int64", "doc_id": "int64"}),
            check_exact=False, atol=1e-9, obj=f"query={q}")


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert df.columns == ["rank", "doc_id", "score"]
    assert len(rows) >= 0
