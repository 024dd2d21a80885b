"""read_iceberg_corpus: snapshot-pinned Iceberg read with parquet
fallback (north rule: lineage carries the input snapshot-id). The
sandbox has no Iceberg runtime jar, so the fallback path is what runs
here; the iceberg branch is exercised up to the classpath failure."""

from __future__ import annotations

import pytest

from pke_spark.corpus import (CORPUS_SCHEMA, read_iceberg_corpus,
                              synth_corpus, with_doc_ids)
from pke_spark.index.build import build_index, read_manifest


@pytest.fixture(scope="module")
def corpus_dir(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ice") / "corpus")
    synth_corpus(spark, 200, partitions=4).write.parquet(path)
    return path


def test_fallback_reads_corpus_shape(spark, corpus_dir):
    df, snap = read_iceberg_corpus(spark, corpus_dir)
    assert snap == f"parquet:{corpus_dir}"
    assert df.columns == ["repo", "path", "commit", "lang", "content"]
    assert df.count() == 200


def test_snapshot_string_lands_in_manifest(spark, corpus_dir, tmp_path):
    df, snap = read_iceberg_corpus(spark, corpus_dir)
    docs = with_doc_ids(df).select("doc_id", df.content.alias("text"))
    ix = str(tmp_path / "ix")
    build_index(docs, ix, n_parts=2, n_salts=2, input_snapshot=snap)
    m = read_manifest(spark, ix)
    snaps = {r.input_snapshot for r in m.collect()}
    assert snaps == {snap}


def test_pinned_read_refuses_unpinned_fallback(spark, corpus_dir):
    """An explicitly snapshot-pinned read must NOT silently downgrade
    to an un-pinned parquet scan when the Iceberg source is missing."""
    with pytest.raises(RuntimeError, match="refusing"):
        read_iceberg_corpus(spark, corpus_dir, snapshot_id=12345)
