"""pke DF-artifact round-trip (analog of tests/test_utils.py:49-67 in
the reference: compute_document_frequency == hand-built Counter incl.
--NB_DOC--)."""

from __future__ import annotations

from pke_spark import artifacts, oracle
from pke_spark.ops import core


def test_df_tsv_roundtrip(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(60).cache()
    stats = core.term_stats(docs)
    n_docs = docs.count()
    p = str(tmp_path / "df-counts.tsv.gz")
    artifacts.write_df_tsv_gz(stats, n_docs, p)

    freqs, n2 = artifacts.read_df_tsv_gz(p)
    assert n2 == n_docs
    pdf = docs.select("doc_id", "text").toPandas()
    want = oracle.term_stats(dict(zip(pdf.doc_id, pdf.text)))
    assert freqs == dict(zip(want.term, want.df))

    df2, n3 = artifacts.df_table_to_spark(spark, p)
    assert n3 == n_docs
    assert df2.count() == len(freqs)
