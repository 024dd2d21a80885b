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
    assert pq.prefixes == ["tab"]
    assert pq.fuzzies == [("spar", 1), ("batch", 2)]


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


def test_literal_score_terms_order_and_dedup():
    pq = parse_querystring('+spark join "spark fast" spark')
    assert pq.literal_score_terms == ["spark", "join", "fast"]


def test_parse_rejections():
    with pytest.raises(ValueError, match="no scoring clause"):
        parse_querystring("-only -negative")
    with pytest.raises(ValueError, match="no scoring clause"):
        parse_querystring("lang:en")
    with pytest.raises(ValueError, match="negated phrases"):
        parse_querystring('-"a b" x')
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
    # prefix expands (win* -> window) and scores as should
    ids = _ids(querystring_topk(fixture_docs, "win*"))
    assert set(ids) == {1, 3, 4, 6}
    # fuzzy: spakr~1 is 2 edits from spark, spak~1 is 1
    ids = _ids(querystring_topk(fixture_docs, "spak~1"))
    assert set(ids) == {1, 2, 4, 5}


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
               '+join "spark join" win*']:
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
        st.sampled_from(["should", "must", "not", "phrase", "prefix",
                         "fuzzy", "filter"]),
        min_size=n, max_size=n))
    if not any(k in ("should", "must", "phrase", "prefix", "fuzzy")
               for k in kinds):
        kinds.append("should")
    # MUST_NOT may not overlap score terms: draw disjoint vocab halves
    for k in kinds:
        w = draw(_word)
        if k == "should":
            clauses.append(w)
        elif k == "must":
            clauses.append("+" + w)
        elif k == "not":
            clauses.append("-z" + w)  # 'z' prefix keeps it disjoint
        elif k == "phrase":
            w2 = draw(_word)
            clauses.append(f'"{w} {w2}"')
        elif k == "prefix":
            clauses.append(w + "*")
        elif k == "fuzzy":
            clauses.append(w + "~" + draw(st.sampled_from(["", "1", "2"])))
        elif k == "filter":
            clauses.append("lang:" + w)
    return " ".join(clauses)


@settings(max_examples=200, deadline=None)
@given(_querystrings())
def test_parse_total_on_valid_grammar(qs):
    pq = parse_querystring(qs)
    assert isinstance(pq, ParsedQuery)
    # every clause landed in exactly one bucket
    n_clauses = len(qs.split())
    n_parsed = (len(pq.must) + len(pq.should) + len(pq.must_not)
                + len(pq.phrases) + len(pq.soft_phrases)
                + len(pq.prefixes) + len(pq.fuzzies) + len(pq.filters))
    # phrases consume two whitespace-separated words
    assert n_parsed == n_clauses - len(pq.phrases) - len(pq.soft_phrases)
    # the parser's own invariants
    assert not (set(pq.must_not) & set(pq.literal_score_terms))
    assert pq.literal_score_terms or pq.prefixes or pq.fuzzies
    for t, e in pq.fuzzies:
        assert e in (1, 2)


@settings(max_examples=300, deadline=None)
@given(st.text(min_size=0, max_size=40))
def test_parse_never_crashes_on_arbitrary_input(s):
    # arbitrary input either parses or raises ValueError — never any
    # other exception type (the serving front door's contract)
    try:
        parse_querystring(s)
    except ValueError:
        pass
