"""Physical-plan audits for the query-language surface (fielded /
expansion / query-string / snippets): the scale-critical properties —
metadata predicates pushed to the parquet scan, tiny sides broadcast,
no cartesian products, a bounded number of shuffles — asserted on the
executed plan, in the style of test_plans.py."""

from __future__ import annotations

import re

import pytest

from pke_spark.ops import fielded, querylang, snippets, termexpand


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filtered_bm25_predicate_pushed(spark, docs):
    plan = _plan(fielded.filtered_bm25_topk(
        docs, ["spark", "join"], "lang = 'en'", 10))
    # the metadata predicate must reach a parquet scan as a pushed
    # filter — the candidate set is pruned at the source, not post-scan
    assert re.search(r"PushedFilters: \[[^\]]*EqualTo\(lang,en\)", plan), plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_filtered_bm25_filter_scan_prunes_text(spark, docs):
    plan = _plan(fielded.filtered_bm25_topk(
        docs, ["spark"], "lang = 'en'", 10))
    # the filter branch's scan must read only (doc_id, lang) — the
    # document text is tokenized once, on the token-stream branch only
    schemas = re.findall(r"ReadSchema: ([^\n]*)", plan)
    filter_scans = [s for s in schemas if "lang" in s]
    assert filter_scans, plan
    assert all("text" not in s for s in filter_scans), filter_scans


def test_facet_counts_broadcasts_matched_ids(spark, docs):
    plan = _plan(fielded.facet_counts(docs, ["spark", "join"], "lang"))
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_prefix_expansion_is_broadcast_into_scoring(spark, docs):
    # the expansion set (<= max_expansions rows) must enter the token
    # filter as a broadcast, never a shuffled join
    plan = _plan(termexpand.prefix_bm25_topk(docs, "s", 10))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_querystring_constraints_are_semi_anti_joins(spark, docs):
    plan = _plan(querylang.querystring_topk(
        docs, '+spark join -vector lang:en "merge slow"', 10))
    # MUST/phrase/filter = LeftSemi, MUST_NOT = LeftAnti, all on doc_id
    assert "LeftSemi" in plan, plan
    assert "LeftAnti" in plan, plan
    assert re.search(r"PushedFilters: \[[^\]]*EqualTo\(lang,en\)", plan), plan
    assert "CartesianProduct" not in plan


def test_querystring_range_filter_pushed(spark, docs):
    plan = _plan(querylang.querystring_topk(
        docs, 'spark join n_chars:[200 TO 1500]', 10))
    # both range bounds reach the documents parquet scan as pushed
    # filters — at 100 TB this is partition/row-group pruning, not a
    # post-scan filter
    assert re.search(
        r"PushedFilters: \[[^\]]*GreaterThanOrEqual\(n_chars,200\)", plan), \
        plan
    assert re.search(
        r"PushedFilters: \[[^\]]*LessThanOrEqual\(n_chars,1500\)", plan), \
        plan
    assert "CartesianProduct" not in plan


def test_querystring_boosts_stay_broadcast(spark, docs):
    # the boost map is query-sized: it must enter scoring as a
    # broadcast join, and add no shuffle beyond the unboosted plan
    unboosted = _plan(querylang.querystring_topk(docs, "spark join", 10))
    boosted = _plan(querylang.querystring_topk(docs, "spark^2 join", 10))
    assert "CartesianProduct" not in boosted
    n_shuffles = lambda p: p.count("Exchange") - p.count("BroadcastExchange")
    assert n_shuffles(boosted) <= n_shuffles(unboosted), \
        (n_shuffles(boosted), n_shuffles(unboosted))


def test_querystring_msm_is_one_broadcast_semi_join(spark, docs):
    plan = _plan(querylang.querystring_topk(
        docs, "spark join window merge", 10, min_should_match=2))
    # the clause map is broadcast; the msm gate lands as a LeftSemi on
    # doc_id (one extra aggregation over the clause-term token stream)
    assert "LeftSemi" in plan, plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_slop_phrase_no_cartesian(spark, docs):
    # the span-near chain is per-term-filtered equi-joins on doc_id
    # with the window bound on top — never a cartesian product
    plan = _plan(querylang.querystring_topk(
        docs, '"merge slow window"~3 spark', 10))
    assert "CartesianProduct" not in plan
    assert "LeftSemi" in plan


def test_wildcard_expansion_is_broadcast(spark, docs):
    plan = _plan(querylang.querystring_topk(docs, "spark ta?le*", 10))
    # the expansion set (<= max_expansions rows) enters scoring as a
    # broadcast; the dictionary scan is gated by the literal prefix
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "StartsWith(term, ta)" in plan or "startswith" in plan.lower()


def test_count_collector_skips_scoring(spark, docs):
    plan = _plan(querylang.querystring_count(docs, "spark join lang:en"))
    # no BM25 math anywhere in the count plan: no log(), no avg(dl)
    assert "LOG(" not in plan.upper().replace(" ", "")
    assert "CartesianProduct" not in plan


def test_snippets_match_table_is_broadcast_filtered(spark, docs):
    plan = _plan(snippets.snippet_windows(docs, ["spark", "join"], 10))
    # both the query terms and the top-k ids gate the match-position
    # table via broadcast joins; the window self-join is an equi-join
    # on doc_id over that tiny table (range predicate on top), so no
    # cartesian anywhere
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastHashJoin") >= 2, plan
