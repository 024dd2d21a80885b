"""Physical-plan audits: the properties that matter at 100 TB must be
visible in the executed plan, not just intended — predicate pushdown to
the parquet scan, column pruning through UDF boundaries, broadcast
joins for small sides, no nested-loop products anywhere."""

from __future__ import annotations

import pytest

from pke_spark.corpus import synth_corpus, with_doc_ids
from pke_spark.index.build import IndexReader, build_index
from pke_spark.ops import core, keyphrase


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bm25_broadcasts_and_no_nested_loop(spark, docs):
    plan = _plan(core.bm25_topk(docs, ["spark", "join"], 10))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    # the only nested-loop allowed is the broadcast of the 1-row global
    # stats aggregate (n, avgdl)
    assert plan.count("BroadcastNestedLoopJoin") <= 1


def test_token_counts_prunes_document_columns(spark, docs):
    plan = _plan(core.token_counts(docs))
    # only doc_id and text may reach the scan; lang/repo/path pruned
    import re
    m = re.search(r"ReadSchema: ([^\n]*)", plan)
    assert m, plan
    assert "lang" not in m.group(1) and "repo" not in m.group(1)


def test_index_term_filter_pushed_to_parquet(spark, tmp_path):
    c = with_doc_ids(synth_corpus(spark, 200, partitions=4))
    d = str(tmp_path / "ix")
    build_index(c.select("doc_id", c.content.alias("text")), d,
                n_parts=4, n_salts=4, hot_threshold=50, block_size=32)
    ix = IndexReader(spark, d, cache=False)
    plan = _plan(ix.term_postings(["def", "build"]))
    assert "PushedFilters: [In(term" in plan, plan


def test_tfidf_single_count_free(spark, docs):
    # N comes from a broadcast 1-row aggregate INSIDE the plan: building
    # the DataFrame must launch no Spark job (lazy) — a docs.count()
    # call would run one eagerly
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup() or [])
    df = keyphrase.tfidf_topk(docs, 3)
    after = len(tracker.getJobIdsForGroup() or [])
    assert after == before
    assert "BroadcastNestedLoopJoin" in _plan(df) or \
        "BroadcastHashJoin" in _plan(df)


def test_phrase_no_selfjoin_chain(spark, docs):
    # the phrase plan is the offset-shift trick: ONE aggregation over
    # the filtered token stream — never an (n-1)-deep self-join chain
    # that would shuffle the token table once per phrase term
    from pke_spark.ops import phrase as P
    plan = _plan(P.phrase_topk(docs, ["slow", "hash", "batch"], 10))
    assert "CartesianProduct" not in plan
    assert plan.count("SortMergeJoin") == 0
    # exactly the broadcast of the tiny term->offset map
    assert "BroadcastHashJoin" in plan


def test_positions_sidecar_scan_pruned(spark, docs, tmp_path):
    # term predicate must reach the sidecar's parquet scan, and the
    # scan must not read the unqueried metadata columns (df, shard)
    from pke_spark.index import positions as PX
    d = str(tmp_path / "posix")
    PX.build_positions(docs.limit(50), d)
    plan = _plan(PX.term_positions(spark, d, ["merge", "slow"]))
    assert "PushedFilters: [In(term" in plan, plan
    import re
    m = re.search(r"ReadSchema: ([^\n]*)", plan)
    assert m and "df" not in m.group(1) and "shard" not in m.group(1)


def test_boolean_clauses_broadcast(spark, docs):
    from pke_spark.ops import boolquery as BQ
    plan = _plan(BQ.boolean_bm25_topk(docs, ["spark", "join"],
                                      ["window"], ["vector"], 10))
    assert "CartesianProduct" not in plan
    # must_not is an anti join against a filtered (small) doc set
    assert "LeftAnti" in plan
