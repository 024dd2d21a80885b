"""Fielded search, term expansion, and snippets: clause semantics on a
hand-built fixture + DuckDB-twin parity (the same comparison the
driver gate runs, at fixture scale)."""

import duckdb
import pytest

from pke_spark.ops import fielded, snippets, termexpand


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "spark join window fast table", "en", "s1"),
        (2, "spark join vector table", "en", "s1"),
        (3, "join window table tablet tabulate", "en", "s2"),
        (4, "spark join window", "fr", "s2"),
        (5, "merge slow spark join spark", "en", "s1"),
        (6, "window window window spork", "fr", "s2"),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string")


@pytest.fixture(scope="module")
def con(docs, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("fielded") / "docs.parquet")
    docs.coalesce(1).write.parquet(d)
    c = duckdb.connect()
    c.execute(f"CREATE VIEW documents AS SELECT * FROM "
              f"read_parquet('{d}/*.parquet')")
    return c


def _cmp(sdf, con, sql):
    got = sdf.toPandas()
    got = got[sorted(got.columns)].sort_values(
        list(sorted(got.columns))).reset_index(drop=True)
    want = con.execute(sql).df()
    want = want[sorted(want.columns)].sort_values(
        list(sorted(want.columns))).reset_index(drop=True)
    assert got.shape == want.shape
    for c in got.columns:
        a, b = got[c], want[c]
        if a.dtype.kind == "f":
            assert (a.round(6) == b.round(6)).all(), c
        else:
            assert (a.astype(str) == b.astype(str)).all(), c


# ----------------------------------------------------------- fielded

def test_filter_restricts_candidates_not_stats(docs):
    full = {r.doc_id: r.score for r in
            __import__("pke_spark.ops.core", fromlist=["core"])
            .bm25_topk(docs, ["spark", "join"], 10).collect()}
    filt = fielded.filtered_bm25_topk(docs, ["spark", "join"],
                                      "lang = 'en'", 10).collect()
    # only en docs appear…
    assert {r.doc_id for r in filt} == {1, 2, 3, 5}
    # …but their scores are IDENTICAL to the unfiltered query's
    # (full-corpus stats — Lucene filter semantics)
    for r in filt:
        assert r.score == full[r.doc_id]


def test_filtered_matches_twin(docs, con):
    for pred in ["lang = 'en'", "source = 's2'",
                 "lang = 'fr' AND source = 's2'", "doc_id < 4"]:
        _cmp(fielded.filtered_bm25_topk(docs, ["spark", "window"], pred, 10),
             con, fielded.filtered_bm25_topk_sql(["spark", "window"], pred, 10))


def test_facets(docs, con):
    got = fielded.facet_counts(docs, ["spark"], "lang", 10).collect()
    # docs 1,2,4,5 contain spark: en x3, fr x1
    assert [(r.facet, r.n_docs) for r in got] == [("en", 3), ("fr", 1)]
    _cmp(fielded.facet_counts(docs, ["spark"], "source", 10),
         con, fielded.facet_counts_sql(["spark"], "source", 10))


# -------------------------------------------------------- termexpand

def test_prefix_expansion_semantics(docs):
    exp = [r.term for r in
           termexpand.expand_prefix(docs, "tab", 32).collect()]
    # df-ranked: table (3 docs) first, then tie df=1 broken by term asc
    assert exp == ["table", "tablet", "tabulate"]
    capped = [r.term for r in
              termexpand.expand_prefix(docs, "tab", 2).collect()]
    assert capped == ["table", "tablet"]


def test_fuzzy_expansion_semantics(docs):
    exp = [(r.term, r.dist) for r in
           termexpand.expand_fuzzy(docs, "spark", 1, 1, 32).collect()]
    # exact term first (distance 0), then 1-edit neighbors
    assert exp == [("spark", 0), ("spork", 1)]
    # prefix_len gates the dictionary scan: 'spork' vs prefix 'spa'
    exp = [r.term for r in
           termexpand.expand_fuzzy(docs, "spark", 1, 3, 32).collect()]
    assert exp == ["spark"]


def test_expansion_queries_match_twin(docs, con):
    _cmp(termexpand.prefix_bm25_topk(docs, "tab", 10),
         con, termexpand.prefix_bm25_topk_sql("tab", 10))
    _cmp(termexpand.prefix_bm25_topk(docs, "tab", 10, max_expansions=2),
         con, termexpand.prefix_bm25_topk_sql("tab", 10, max_expansions=2))
    _cmp(termexpand.fuzzy_bm25_topk(docs, "spark", 1, 10),
         con, termexpand.fuzzy_bm25_topk_sql("spark", 1, 10))
    _cmp(termexpand.fuzzy_bm25_topk(docs, "window", 2, 10),
         con, termexpand.fuzzy_bm25_topk_sql("window", 2, 10))


def test_expansion_guards(docs):
    with pytest.raises(ValueError, match="empty prefix"):
        termexpand.expand_prefix(docs, "", 10)
    with pytest.raises(ValueError, match="max_edits"):
        termexpand.expand_fuzzy(docs, "spark", 0)
    # no matching terms -> empty result, not an error
    assert termexpand.prefix_bm25_topk(docs, "zzz", 10).count() == 0


# ---------------------------------------------------------- snippets

def test_snippet_picks_densest_window(spark):
    docs = spark.createDataFrame(
        [(1, "spark x x x x x x x x x join spark fast y", "en", "s")],
        "doc_id long, text string, lang string, source string")
    out = snippets.snippet_windows(docs, ["spark", "join", "fast"],
                                   k=5, width=4).collect()
    assert len(out) == 1
    r = out[0]
    # best 4-token window is [11..14]: join spark fast -> 3 distinct
    assert (r.win_start, r.win_end, r.n_terms) == (11, 14, 3)


def test_snippet_tie_breaks_earliest(spark):
    docs = spark.createDataFrame(
        [(1, "a spark join b c d spark join e", "en", "s")],
        "doc_id long, text string, lang string, source string")
    r = snippets.snippet_windows(docs, ["spark", "join"],
                                 k=5, width=3).collect()[0]
    assert (r.win_start, r.n_terms) == (2, 2)


def test_snippets_match_twin(docs, con):
    _cmp(snippets.snippet_windows(docs, ["spark", "join", "window"], 10, 4),
         con, snippets.snippet_windows_sql(["spark", "join", "window"], 10, 4))
