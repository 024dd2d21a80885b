"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship BM25 top-10 on sf0.001.
``queries()`` — one entry per implemented operator (SURVEY.md §2).
``oracle_sql()`` — DuckDB twins for everything SQL-expressible.
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, "/root/repo")

import math  # noqa: E402

from pke_spark import golden  # noqa: E402
from pke_spark.ops import (boolquery, core, dedup, events,  # noqa: E402
                           fielded, grammar, graph, keyphrase, mlt,
                           phrase, querylang, similarity, snippets,
                           stemmed, supervised, termexpand, textstats,
                           topicrank, tpr, wingnus, yake)


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def _bm25_after_delete(s: SparkSession, d: str) -> DataFrame:
    """Index delete path end-to-end: build -> tombstone every doc with
    doc_id % 17 == 3 -> purge -> Block-Max WAND top-10. The purge
    recomputes n_docs/avgdl/df exactly from the surviving postings, so
    the DuckDB twin is simply BM25 over documents minus the deleted
    rows (`bm25_topk_sql` with a filtered subselect). Materialized to
    literal rows so the temp index dir can be removed eagerly."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from pke_spark.index.build import IndexReader, build_index
    from pke_spark.index.delete import delete_docs, purge_deleted
    from pke_spark.index.wand import search

    docs = _docs(s, d).select("doc_id", "text")
    ixd = tempfile.mkdtemp(prefix="pke_bm25_del_")
    try:
        build_index(docs, ixd, n_parts=8, n_salts=8)
        delete_docs(s, ixd,
                    docs.filter(F.col("doc_id") % 17 == 3).select("doc_id"))
        purge_deleted(s, ixd)
        rows = search(IndexReader(s, ixd), BM25_QUERY, 10)
    finally:
        shutil.rmtree(ixd, ignore_errors=True)
    return _rows_df(s, [(int(r), int(dd), float(sc)) for r, dd, sc in rows],
                    "rank int, doc_id long, score double")

# Fixed reference query set (FIXTURES.md F2): multi-term, hot single
# term, and a term absent from the corpus (empty result).
BM25_QUERY = ["spark", "join", "window"]
BM25_HOT_QUERY = ["table"]
BM25_MISS_QUERY = ["zzqqxunseen"]

# fixed ANN query vector (literal on both sides; embeddings are 64-dim)
ANN_QUERY_VEC = [round(math.sin(i * 0.7 + 0.3), 6) for i in range(64)]

# fixed positional queries (phrase = adjacent in order; proximity =
# ordered pair within a token window). The repeated-term phrase is
# included deliberately — it exercises the distinct-offset matching.
PHRASE_QUERY = ["merge", "slow"]
PHRASE_QUERY3 = ["slow", "hash", "batch"]
PHRASE_QUERY_REP = ["batch", "batch"]
PROX_QUERY = ("spark", "join", 5)

# fixed boolean query: require both, boost one, exclude one
BOOL_QUERY = (["spark", "join"], ["window"], ["vector"])

# fielded-retrieval fixtures: a pushable metadata predicate (Lucene
# filter semantics — full-corpus stats) and a facet field
FIELD_PREDICATE = "lang = 'en'"
FACET_COL = "lang"

# term-expansion fixtures: 's*' expands to several vocabulary terms
# (df-ranked, capped); 'sparc'~1 is the canonical misspelling->match
PREFIX_QUERY = "s"
FUZZY_QUERY = ("sparc", 1)
WILDCARD_QUERY = "ta?le*"
REGEX_QUERY = "so[rc]t.*"

# query-string front door: MUST + SHOULD + MUST_NOT + phrase + field
# filter + prefix + fuzzy in one Lucene-lite string
QUERYSTRING = '+spark join -vector lang:en "merge slow" tab* sor~1'
# clause boosts (sum-of-clauses weights, incl. a boosted expansion and
# a duplicated term) + a numeric range filter
QUERYSTRING_BOOSTED = '+spark^2 join merge^0.5 join tab*^3 ' \
                      'n_chars:[200 TO 1500]'
# minimum_should_match: candidates must satisfy >= 2 of the 4 SHOULD
# clauses (3 bare terms + 1 boosted term)
QUERYSTRING_MSM = ('spark join window merge^2', 2)
# negated phrase: exclude the exact sequence; its terms may still
# appear individually
QUERYSTRING_NOTPHRASE = 'spark join -"merge slow"'
# sloppy phrase: terms in order within 2 extra tokens of stretch
# (SpanNearQuery inOrder=true)
QUERYSTRING_SLOP = '"merge slow"~2 spark'
# disjunction groups: +(required any-of), (SHOULD group)^boost,
# -(excluded members)
QUERYSTRING_GROUPS = '+(merge slow) (table sort)^2 spark -(vector)'
# Lucene classic-parser keyword connectives (round-5 sugar): rewrites
# to '+spark +join window -vector lang:en'
QUERYSTRING_CONNECTIVES = 'spark AND join OR window NOT vector lang:en'
# batched execution: every grammar feature across a query SET, ONE job
QUERYSTRING_BATCH = {"q1": QUERYSTRING, "q2": QUERYSTRING_BOOSTED,
                     "q3": QUERYSTRING_NOTPHRASE}


def _querystring_batch_sql() -> str:
    from pke_spark.ops import querylang
    parts = [
        f"SELECT '{qid}' AS query_id, * FROM "
        f"({querylang.querystring_sql(qs, 10)})"
        for qid, qs in sorted(QUERYSTRING_BATCH.items())]
    return ("SELECT * FROM (" + " UNION ALL ".join(parts)
            + ") ORDER BY query_id, rank")


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


_SERVED: dict = {}


def _served_reader(spark: SparkSession, sf_dir: str):
    """One dense index + positional sidecar per sf_dir, built into a
    temp dir and cached for the process lifetime — the serving-path
    gate entries (querystring/prefix/fuzzy/snippets _indexed) all
    query the same index, as a serving tier would."""
    if sf_dir not in _SERVED:
        import atexit
        import shutil
        import tempfile

        from pke_spark.index.build import IndexReader, build_index
        from pke_spark.index.positions import build_positions

        d = tempfile.mkdtemp(prefix="pke_gate_ix_")
        atexit.register(shutil.rmtree, d, ignore_errors=True)
        docs = _docs(spark, sf_dir).select("doc_id", "text")
        build_index(docs, d, n_parts=8, n_salts=8, dense_doc_ids=True)
        build_positions(docs, d, n_salts=8)
        _SERVED[sf_dir] = IndexReader(spark, d)
    return _SERVED[sf_dir]


def _rows_df(s: SparkSession, rows, schema: str) -> DataFrame:
    from pke_spark.rows import rows_df
    return rows_df(s, rows, schema)


def _querystring_indexed(s: SparkSession, d: str) -> DataFrame:
    from pke_spark.index.serving import querystring_search_indexed
    rows = querystring_search_indexed(
        _served_reader(s, d), QUERYSTRING, 10,
        docs_parquet=f"{d}/documents.parquet")
    return _rows_df(s, rows, "rank int, doc_id long, score double")


def _querystring_boosted_indexed(s: SparkSession, d: str) -> DataFrame:
    from pke_spark.index.serving import querystring_search_indexed
    rows = querystring_search_indexed(
        _served_reader(s, d), QUERYSTRING_BOOSTED, 10,
        docs_parquet=f"{d}/documents.parquet")
    return _rows_df(s, rows, "rank int, doc_id long, score double")


def _querystring_batch(s: SparkSession, d: str) -> DataFrame:
    from pke_spark.index.serving import querystring_topk_batch
    return querystring_topk_batch(
        _served_reader(s, d), QUERYSTRING_BATCH, 10,
        docs_parquet=f"{d}/documents.parquet")


def _querystring_count_indexed(s: SparkSession, d: str) -> DataFrame:
    from pke_spark.index.serving import querystring_count_indexed
    n = querystring_count_indexed(
        _served_reader(s, d), QUERYSTRING,
        docs_parquet=f"{d}/documents.parquet")
    return _rows_df(s, [(n,)], "n_hits long")


def _querystring_sort_indexed(s: SparkSession, d: str) -> DataFrame:
    from pke_spark.index.serving import querystring_sort_indexed
    rows = querystring_sort_indexed(
        _served_reader(s, d), QUERYSTRING, "n_chars", False, 10,
        docs_parquet=f"{d}/documents.parquet")
    return _rows_df(s, rows, "rank int, doc_id long, n_chars long")


def _querystring_msm_indexed(s: SparkSession, d: str) -> DataFrame:
    from pke_spark.index.serving import querystring_search_indexed
    rows = querystring_search_indexed(
        _served_reader(s, d), QUERYSTRING_MSM[0], 10,
        docs_parquet=f"{d}/documents.parquet",
        min_should_match=QUERYSTRING_MSM[1])
    return _rows_df(s, rows, "rank int, doc_id long, score double")


def _prefix_indexed(s: SparkSession, d: str) -> DataFrame:
    from pke_spark.index.serving import prefix_search
    rows = prefix_search(_served_reader(s, d), PREFIX_QUERY, 10)
    return _rows_df(s, rows, "rank int, doc_id long, score double")


def _fuzzy_indexed(s: SparkSession, d: str) -> DataFrame:
    from pke_spark.index.serving import fuzzy_search
    rows = fuzzy_search(_served_reader(s, d), FUZZY_QUERY[0],
                        FUZZY_QUERY[1], 10)
    return _rows_df(s, rows, "rank int, doc_id long, score double")


def _wildcard_indexed(s: SparkSession, d: str) -> DataFrame:
    from pke_spark.index.serving import wildcard_search
    rows = wildcard_search(_served_reader(s, d), WILDCARD_QUERY, 10)
    return _rows_df(s, rows, "rank int, doc_id long, score double")


def _regex_indexed(s: SparkSession, d: str) -> DataFrame:
    from pke_spark.index.serving import regex_search
    rows = regex_search(_served_reader(s, d), REGEX_QUERY, 10)
    return _rows_df(s, rows, "rank int, doc_id long, score double")


# More-Like-This source doc: min(doc_id) — sf-independent and identical
# to the oracle's (SELECT min(doc_id) FROM documents)
def _mlt_src(s: SparkSession, d: str) -> int:
    return _docs(s, d).selectExpr("min(doc_id)").first()[0]


def _mlt_corpus(s: SparkSession, d: str) -> DataFrame:
    return mlt.mlt_topk(_docs(s, d), _mlt_src(s, d), 10)


def _mlt_indexed(s: SparkSession, d: str) -> DataFrame:
    from pke_spark.index.serving import more_like_this_indexed
    rows = more_like_this_indexed(_served_reader(s, d), _mlt_src(s, d), 10)
    return _rows_df(s, rows, "rank int, doc_id long, score double")


def _facets_indexed(s: SparkSession, d: str) -> DataFrame:
    from pke_spark.index.serving import facet_counts_indexed
    rows = facet_counts_indexed(_served_reader(s, d), BM25_QUERY,
                                FACET_COL, f"{d}/documents.parquet")
    return _rows_df(s, rows, "facet string, n_docs long")


def _snippets_indexed(s: SparkSession, d: str) -> DataFrame:
    from pke_spark.index.serving import snippet_search
    rows = snippet_search(_served_reader(s, d), BM25_QUERY, 10)
    return _rows_df(
        s, rows, "rank int, doc_id long, score double, "
        "win_start long, win_end long, n_terms long")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: exhaustive BM25 top-10 over sf0.001 documents."""
    return core.bm25_topk(_docs(spark, "/root/testdata/sf0.001"), BM25_QUERY, k=10)


def _variants(*members) -> Callable[[SparkSession, str], DataFrame]:
    """Composite gate entry: union the member queries under a `variant`
    label column. Members are (variant_name, fn) or
    (variant_name, fn, rename_map); rename_map maps member column
    names onto the composite's shared schema. The driver gate compares
    order-insensitively with columns sorted by name, so the union is a
    faithful conjunction of the per-member comparisons."""
    def run(s: SparkSession, d: str) -> DataFrame:
        from pyspark.sql import functions as F
        outs = []
        for m in members:
            name, fn = m[0], m[1]
            ren = m[2] if len(m) > 2 else {}
            df = fn(s, d)
            for old, new in ren.items():
                df = df.withColumnRenamed(old, new)
            outs.append(df.select(F.lit(name).alias("variant"), "*"))
        out = outs[0]
        for x in outs[1:]:
            out = out.unionByName(x)
        return out
    return run


def _union_variants(pairs) -> DataFrame:
    """`_variants`' union over PREBUILT member DataFrames — used by the
    composites whose members share one materialized token table (the
    composite is a single declared query; sharing the per-query
    intermediate across its members is the same plan sharing the DuckDB
    twin gets from its UNION ALL of CTE-bearing oracles)."""
    from pyspark.sql import functions as F
    outs = [df.select(F.lit(name).alias("variant"), "*")
            for name, df in pairs]
    out = outs[0]
    for x in outs[1:]:
        out = out.unionByName(x)
    return out


def _bm25_variants(s: SparkSession, d: str) -> DataFrame:
    from pke_spark.ops.core import corpus_tokens
    docs = _docs(s, d)
    toks = corpus_tokens(docs)
    return _union_variants([
        ("topk", core.bm25_topk(docs, BM25_QUERY, 10, toks=toks)),
        ("hot", core.bm25_topk(docs, BM25_HOT_QUERY, 10, toks=toks)),
        ("miss", core.bm25_topk(docs, BM25_MISS_QUERY, 10, toks=toks)),
        ("filtered", fielded.filtered_bm25_topk(
            docs, BM25_QUERY, FIELD_PREDICATE, 10, toks=toks)),
        ("after_delete", _bm25_after_delete(s, d)),
    ])


def _querystring_variants(s: SparkSession, d: str) -> DataFrame:
    from pke_spark.ops.core import corpus_tokens
    docs = _docs(s, d)
    toks = corpus_tokens(docs)
    qt = querylang.querystring_topk
    return _union_variants([
        ("search", qt(docs, QUERYSTRING, 10, toks=toks)),
        ("boosted", qt(docs, QUERYSTRING_BOOSTED, 10, toks=toks)),
        ("msm", qt(docs, QUERYSTRING_MSM[0], 10,
                   min_should_match=QUERYSTRING_MSM[1], toks=toks)),
        ("notphrase", qt(docs, QUERYSTRING_NOTPHRASE, 10, toks=toks)),
        ("slop", qt(docs, QUERYSTRING_SLOP, 10, toks=toks)),
        ("groups", qt(docs, QUERYSTRING_GROUPS, 10, toks=toks)),
        ("connectives", qt(docs, QUERYSTRING_CONNECTIVES, 10, toks=toks)),
    ])


def _expansion_bm25(s: SparkSession, d: str) -> DataFrame:
    from pke_spark.ops.core import corpus_tokens
    docs = _docs(s, d)
    toks = corpus_tokens(docs)
    return _union_variants([
        ("prefix", termexpand.prefix_bm25_topk(
            docs, PREFIX_QUERY, 10, toks=toks)),
        ("fuzzy", termexpand.fuzzy_bm25_topk(
            docs, FUZZY_QUERY[0], FUZZY_QUERY[1], 10, toks=toks)),
        ("wildcard", termexpand.wildcard_bm25_topk(
            docs, WILDCARD_QUERY, 10, toks=toks)),
        ("regex", termexpand.regex_bm25_topk(
            docs, REGEX_QUERY, 10, toks=toks)),
    ])


def _candidate_variants(s: SparkSession, d: str) -> DataFrame:
    from pke_spark.ops.core import corpus_tokens
    docs = _docs(s, d)
    toks = corpus_tokens(docs)
    return _union_variants([
        ("runs", keyphrase.candidate_runs(docs, toks=toks)),
        ("ngram", keyphrase.ngram_candidates(docs, toks=toks)),
        ("grammar", grammar.grammar_candidates(docs, toks=toks)),
    ])


def _variants_sql(*members) -> str:
    """DuckDB twin of _variants: UNION ALL BY NAME over the member
    oracles, each tagged with its variant label. Members are
    (variant_name, sql) or (variant_name, sql, select_list) where
    select_list re-projects the member onto the shared schema."""
    parts = []
    for m in members:
        name, sql = m[0], m[1]
        sel = m[2] if len(m) > 2 else "*"
        parts.append(f"SELECT '{name}' AS variant, {sel} FROM ({sql})")
    return " UNION ALL BY NAME ".join(parts)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # ORDER MATTERS: the driver correctness gate records only the FIRST
    # 50 entries in dict order (VERDICT r4 "what's wrong" #1). The 31
    # families that were pushed past the cap in round 4 (graph / YAKE /
    # supervised / dedup / ANN / events / textstats) come FIRST so
    # CORRECTNESS_r05 records a green row for each; the round-4-verified
    # families follow, consolidated into `variant`-labelled composites
    # (each composite unions the exact per-entry results, so one green
    # row certifies every member). Total is capped at 50.
    #
    # Entries retired from the gate — each has a green CORRECTNESS_r04
    # row on record AND live pytest coverage: doc_lengths (trivial
    # projection of token_counts; tests/test_core.py), bigrams (n=2
    # special case of ngram_candidates; tests/test_keyphrase.py),
    # stemmed_candidates (tests/test_stemmed.py),
    # querystring_count_indexed / querystring_sort_indexed (row-for-row
    # parity with the gated corpus-side collectors is asserted in
    # tests/test_serving_lang.py).
    return {
        # --- group A: the 31 entries that lacked a driver-gate row in
        # CORRECTNESS_r04 (gate capped at 50), unchanged names ---
        # graph ranking + greedy redundancy: iterative/sequential per doc,
        # not SQL-expressible -> rows-only driver check; parity asserted
        # in tests/test_graph.py against driver-side networkx
        "textrank": lambda s, d: graph.textrank_topk(_docs(s, d), 5),
        "textrank_toppct": lambda s, d: graph.textrank_top_percent(
            _docs(s, d), 5, 0.33),
        "singlerank": lambda s, d: graph.singlerank_topk(_docs(s, d), 5),
        "positionrank": lambda s, d: graph.positionrank_topk(_docs(s, d), 5),
        "kpminer_dedup": lambda s, d: keyphrase.kpminer_dedup(_docs(s, d), 5),
        "topicrank": lambda s, d: topicrank.topicrank_topk(_docs(s, d), 5),
        "multipartiterank": lambda s, d: topicrank.multipartiterank_topk(
            _docs(s, d), 5),
        # serving path against the committed LDA artifact — the
        # reference's own design (pke loads a pre-trained pickle,
        # utils.py:309-327; it never trains in-query), and distributed
        # EM-LDA training is float-sum-order nondeterministic, so only
        # the serving path is golden-freezable. Training is exercised
        # by tests/test_tpr.py and timed separately in bench.py.
        "topical_pagerank": lambda s, d: tpr.topical_pagerank_topk(
            _docs(s, d), 5, model=tpr.load_tpr_cached(s)),
        "dedup_exact": lambda s, d: dedup.dedup_exact(_docs(s, d)),
        "minhash_lsh": lambda s, d: dedup.minhash_lsh_pairs(_docs(s, d)),
        "dedup_clusters": lambda s, d: dedup.dedup_clusters(_docs(s, d)),
        "simhash": lambda s, d: dedup.simhash(_docs(s, d)),
        "ngram_jaccard": lambda s, d: dedup.ngram_jaccard_pairs(_docs(s, d)),
        "ann_cosine_topk": lambda s, d: similarity.ann_cosine_topk(
            _emb(s, d), ANN_QUERY_VEC, 10),
        "embedding_dups": lambda s, d: similarity.embedding_cosine_pairs(
            _emb(s, d), 0.45),
        "embedding_dups_lsh": lambda s, d: similarity.embedding_dup_pairs_lsh(
            _emb(s, d), 0.45),
        "ann_lsh_topk": lambda s, d: similarity.ann_lsh_topk(
            _emb(s, d), ANN_QUERY_VEC, 10),
        # IVF: deterministic spherical-kmeans coarse quantizer + probed
        # exact rerank (rows-only -> frozen golden; recall vs brute
        # force asserted in tests/test_similarity_lsh.py)
        "ann_ivf_topk": lambda s, d: similarity.ann_ivf_topk(
            _emb(s, d), ANN_QUERY_VEC, 10),
        "events_windowed": lambda s, d: events.events_windowed(_events(s, d)),
        "events_sessionized": lambda s, d: events.events_sessionized(
            _events(s, d)),
        "events_json_stats": lambda s, d: events.events_json_stats(
            _events(s, d)),
        "langid": lambda s, d: textstats.langid(_docs(s, d)),
        "quality_score": lambda s, d: textstats.quality_score(_docs(s, d)),
        "token_count_stats": lambda s, d: textstats.token_count_stats(_docs(s, d)),
        "fingerprint": lambda s, d: textstats.fingerprint(_docs(s, d)),
        "yake_lite": lambda s, d: yake.yake_lite(_docs(s, d), 5),
        # full YAKE (5 features + context windows + Levenshtein dedup):
        # not SQL-expressible -> rows-only; golden parity vs a reference
        # transcription in tests/test_yake_full.py
        "yake_full": lambda s, d: yake.yake_full(_docs(s, d), 5),
        "wingnus_features": lambda s, d: wingnus.wingnus_features(_docs(s, d)),
        # Spark-ML NaiveBayes ranking: not SQL-expressible -> rows-only
        "kea_predict": lambda s, d: supervised.kea_fit_predict(_docs(s, d), 5),
        "wingnus_predict": lambda s, d: wingnus.wingnus_predict(_docs(s, d), 5),
        "eval_prf": lambda s, d: supervised.eval_prf(_docs(s, d), 5),
        # --- group B: round-4-verified families (green rows in
        # CORRECTNESS_r04), consolidated into composites ---
        "token_count_variants": _variants(
            ("raw", lambda s, d: core.token_counts(_docs(s, d)),
             {"term": "token"}),
            ("stemmed", lambda s, d: stemmed.token_counts_stemmed(
                _docs(s, d)), {"stem": "token"})),
        "term_stats": lambda s, d: core.term_stats(_docs(s, d)),
        "bm25_variants": _bm25_variants,
        "positional_variants": _variants(
            ("phrase2", lambda s, d: phrase.phrase_topk(
                _docs(s, d), PHRASE_QUERY, 10), {"phrase_tf": "matches"}),
            ("phrase3", lambda s, d: phrase.phrase_topk(
                _docs(s, d), PHRASE_QUERY3, 10), {"phrase_tf": "matches"}),
            ("phrase_rep", lambda s, d: phrase.phrase_topk(
                _docs(s, d), PHRASE_QUERY_REP, 10), {"phrase_tf": "matches"}),
            ("proximity", lambda s, d: phrase.proximity_topk(
                _docs(s, d), *PROX_QUERY, 10), {"pair_count": "matches"})),
        "boolean_search": lambda s, d: boolquery.boolean_bm25_topk(
            _docs(s, d), *BOOL_QUERY, 10),
        "facet_variants": _variants(
            ("corpus", lambda s, d: fielded.facet_counts(
                _docs(s, d), BM25_QUERY, FACET_COL)),
            ("indexed", _facets_indexed)),
        "expansion_bm25": _expansion_bm25,
        "snippet_variants": _variants(
            ("corpus", lambda s, d: snippets.snippet_windows(
                _docs(s, d), BM25_QUERY, 10)),
            ("indexed", _snippets_indexed)),
        "querystring_variants": _querystring_variants,
        "querystring_explain": lambda s, d: querylang.querystring_explain(
            _docs(s, d), QUERYSTRING_BOOSTED, 10),
        "querystring_count": lambda s, d: querylang.querystring_count(
            _docs(s, d), QUERYSTRING),
        "querystring_sort": lambda s, d: querylang.querystring_sort_topk(
            _docs(s, d), QUERYSTRING, "n_chars", False, 10),
        # index-backed serving twins: same grammar/fixtures compiled
        # onto the inverted index + positional sidecar + term
        # dictionary (pke_spark/index/serving.py); they share the
        # DataFrame ops' derived DuckDB oracles verbatim
        "serving_indexed": _variants(
            ("querystring", _querystring_indexed),
            ("boosted", _querystring_boosted_indexed),
            ("msm", _querystring_msm_indexed),
            ("prefix", _prefix_indexed),
            ("fuzzy", _fuzzy_indexed),
            ("wildcard", _wildcard_indexed),
            ("regex", _regex_indexed)),
        "more_like_this": _variants(
            ("corpus", _mlt_corpus),
            ("indexed", _mlt_indexed)),
        "querystring_batch": _querystring_batch,
        "weighted_topk_variants": _variants(
            ("kpminer", lambda s, d: keyphrase.kpminer(_docs(s, d), 5)),
            ("tfidf_stemmed", lambda s, d: stemmed.tfidf_stemmed_topk(
                _docs(s, d), 3), {"stem": "candidate"})),
        "tfidf_topk": lambda s, d: keyphrase.tfidf_topk(_docs(s, d), 3),
        "candidate_variants": _candidate_variants,
        "firstphrases": lambda s, d: keyphrase.firstphrases(_docs(s, d), 5),
    }


def oracle_sql() -> dict[str, str]:
    return {
        "token_count_variants": _variants_sql(
            ("raw", core.token_counts_sql(), "doc_id, term AS token, tf"),
            ("stemmed", stemmed.token_counts_stemmed_sql(),
             "doc_id, stem AS token, tf")),
        "term_stats": core.term_stats_sql(),
        "bm25_variants": _variants_sql(
            ("topk", core.bm25_topk_sql(BM25_QUERY, 10)),
            ("hot", core.bm25_topk_sql(BM25_HOT_QUERY, 10)),
            ("miss", core.bm25_topk_sql(BM25_MISS_QUERY, 10)),
            ("filtered", fielded.filtered_bm25_topk_sql(
                BM25_QUERY, FIELD_PREDICATE, 10)),
            ("after_delete", core.bm25_topk_sql(
                BM25_QUERY, 10,
                table="(SELECT * FROM documents"
                      " WHERE NOT (doc_id % 17 = 3))"))),
        "positional_variants": _variants_sql(
            ("phrase2", phrase.phrase_topk_sql(PHRASE_QUERY, 10),
             "doc_id, phrase_tf AS matches"),
            ("phrase3", phrase.phrase_topk_sql(PHRASE_QUERY3, 10),
             "doc_id, phrase_tf AS matches"),
            ("phrase_rep", phrase.phrase_topk_sql(PHRASE_QUERY_REP, 10),
             "doc_id, phrase_tf AS matches"),
            ("proximity", phrase.proximity_topk_sql(*PROX_QUERY, 10),
             "doc_id, pair_count AS matches")),
        "boolean_search": boolquery.boolean_bm25_topk_sql(*BOOL_QUERY, 10),
        "facet_variants": _variants_sql(
            ("corpus", fielded.facet_counts_sql(BM25_QUERY, FACET_COL)),
            ("indexed", fielded.facet_counts_sql(BM25_QUERY, FACET_COL))),
        "expansion_bm25": _variants_sql(
            ("prefix", termexpand.prefix_bm25_topk_sql(PREFIX_QUERY, 10)),
            ("fuzzy", termexpand.fuzzy_bm25_topk_sql(
                FUZZY_QUERY[0], FUZZY_QUERY[1], 10)),
            ("wildcard", termexpand.wildcard_bm25_topk_sql(
                WILDCARD_QUERY, 10)),
            ("regex", termexpand.regex_bm25_topk_sql(REGEX_QUERY, 10))),
        "snippet_variants": _variants_sql(
            ("corpus", snippets.snippet_windows_sql(BM25_QUERY, 10)),
            ("indexed", snippets.snippet_windows_sql(BM25_QUERY, 10))),
        "querystring_variants": _variants_sql(
            ("search", querylang.querystring_sql(QUERYSTRING, 10)),
            ("boosted", querylang.querystring_sql(QUERYSTRING_BOOSTED, 10)),
            ("msm", querylang.querystring_sql(
                QUERYSTRING_MSM[0], 10,
                min_should_match=QUERYSTRING_MSM[1])),
            ("notphrase", querylang.querystring_sql(
                QUERYSTRING_NOTPHRASE, 10)),
            ("slop", querylang.querystring_sql(QUERYSTRING_SLOP, 10)),
            ("groups", querylang.querystring_sql(QUERYSTRING_GROUPS, 10)),
            ("connectives", querylang.querystring_sql(
                QUERYSTRING_CONNECTIVES, 10))),
        "querystring_explain": querylang.querystring_explain_sql(
            QUERYSTRING_BOOSTED, 10),
        "querystring_count": querylang.querystring_count_sql(QUERYSTRING),
        "querystring_sort": querylang.querystring_sort_sql(
            QUERYSTRING, "n_chars", False, 10),
        "serving_indexed": _variants_sql(
            ("querystring", querylang.querystring_sql(QUERYSTRING, 10)),
            ("boosted", querylang.querystring_sql(QUERYSTRING_BOOSTED, 10)),
            ("msm", querylang.querystring_sql(
                QUERYSTRING_MSM[0], 10,
                min_should_match=QUERYSTRING_MSM[1])),
            ("prefix", termexpand.prefix_bm25_topk_sql(PREFIX_QUERY, 10)),
            ("fuzzy", termexpand.fuzzy_bm25_topk_sql(
                FUZZY_QUERY[0], FUZZY_QUERY[1], 10)),
            ("wildcard", termexpand.wildcard_bm25_topk_sql(
                WILDCARD_QUERY, 10)),
            ("regex", termexpand.regex_bm25_topk_sql(REGEX_QUERY, 10))),
        "more_like_this": _variants_sql(
            ("corpus", mlt.mlt_topk_sql(
                "(SELECT min(doc_id) FROM documents)", 10)),
            ("indexed", mlt.mlt_topk_sql(
                "(SELECT min(doc_id) FROM documents)", 10))),
        "querystring_batch": _querystring_batch_sql(),
        "weighted_topk_variants": _variants_sql(
            ("kpminer", keyphrase.kpminer_sql(5)),
            ("tfidf_stemmed", stemmed.tfidf_stemmed_topk_sql(3),
             "doc_id, rank, stem AS candidate, tf, weight")),
        "tfidf_topk": keyphrase.tfidf_topk_sql(3),
        "candidate_variants": _variants_sql(
            ("runs", keyphrase.candidate_runs_sql()),
            ("ngram", keyphrase.ngram_candidates_sql()),
            ("grammar", grammar.grammar_candidates_sql())),
        "firstphrases": keyphrase.firstphrases_sql(5),
        "dedup_exact": dedup.dedup_exact_sql(),
        "dedup_clusters": dedup.dedup_clusters_sql(),
        "minhash_lsh": dedup.minhash_lsh_pairs_sql(),
        "simhash": dedup.simhash_sql(),
        "ngram_jaccard": dedup.ngram_jaccard_pairs_sql(),
        "ann_cosine_topk": similarity.ann_cosine_topk_sql(ANN_QUERY_VEC, 10),
        "embedding_dups": similarity.embedding_cosine_pairs_sql(0.45),
        "embedding_dups_lsh": similarity.embedding_dup_pairs_lsh_sql(0.45),
        # ann_lsh_topk: bucketing not SQL-expressible -> rows-only check;
        # recall vs brute force asserted in tests/test_similarity.py
        "events_windowed": events.events_windowed_sql(),
        "events_sessionized": events.events_sessionized_sql(),
        "events_json_stats": events.events_json_stats_sql(),
        "langid": textstats.langid_sql(),
        "quality_score": textstats.quality_score_sql(),
        "token_count_stats": textstats.token_count_stats_sql(),
        "fingerprint": textstats.fingerprint_sql(),
        "yake_lite": yake.yake_lite_sql(5),
        "wingnus_features": wingnus.wingnus_features_sql(),
        "eval_prf": supervised.eval_prf_sql(5),
        # Frozen-golden oracles for the 12 non-SQL-derivable queries
        # (PageRank family, greedy dedup, NB/LDA models): sf0.01 outputs
        # frozen after cross-parallelism determinism checks, served as
        # VALUES literals. Regression oracles, not derivations — the
        # independent derivations are the pytest mirrors (networkx
        # parity, reference transcriptions, numpy-NB, ANN recall). See
        # pke_spark/golden.py.
        **golden.golden_oracles(),
    }


def oracle_kinds() -> dict[str, str]:
    """Provenance label per queries() entry, so gate output can tell
    regression snapshots from independent derivations (ADVICE r3):
    'derived' = DuckDB SQL independently re-derives the result;
    'frozen_golden' = VALUES literal frozen from the engine's own
    verified sf0.01 output (regression oracle; the independent
    derivation is a pytest mirror — networkx parity, reference
    transcription, numpy-NB, ANN recall);
    'rows_only' = no SQL twin (driver records the weaker check).
    """
    frozen = set(golden.golden_names())
    out = {}
    sqls = oracle_sql()
    for name in queries():
        if name in frozen:
            out[name] = "frozen_golden"
        elif name in sqls:
            out[name] = "derived"
        else:
            out[name] = "rows_only"
    return out
