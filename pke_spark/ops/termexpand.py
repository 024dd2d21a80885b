"""Multi-term query expansion: prefix (wildcard) and fuzzy BM25.

Lucene's PrefixQuery / FuzzyQuery: a query atom that is not a literal
term expands against the TERM DICTIONARY into a bounded set of real
terms, then scores as an OR (bag-of-expanded-terms BM25 — identical
scoring constants, rounding, and tie-breaking to ``core.bm25_topk``).

Expansion semantics (shared by Spark and the DuckDB twins, and by the
index-backed driver path in ``index/wand.py``):

- ``prefix``: vocabulary terms with the given prefix, ranked
  (df DESC, term ASC), capped at ``max_expansions`` (Lucene's
  MultiTermQuery rewrite cap — highest-df terms win, deterministic).
- ``fuzzy``: vocabulary terms within ``max_edits`` Levenshtein edits
  of the query term whose first ``prefix_len`` chars match (Lucene's
  FuzzyQuery prefixLength — keeps the dictionary scan bounded),
  ranked (distance ASC, df DESC, term ASC), capped at
  ``max_expansions``. The exact query term itself, when present in
  the vocabulary, is distance 0 and always survives the cap first.

Plan shape at scale: the vocabulary is the term-stats aggregation the
index already maintains (A1); the prefix filter is a sargable range
(term >= p AND term < p || U+10FFFF) that parquet row-group min/max
stats prune, and the fuzzy scan is pre-gated by the same prefix range
plus a length band (|len(term) - len(q)| <= max_edits) before any
edit-distance evaluation (JVM-side ``levenshtein``). The chosen
expansion set is <= max_expansions rows -> broadcast back into the
token-stream filter, so scoring costs exactly one bm25_topk over a
small OR set. No driver collect anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..tokenizer import duckdb_toks_cte, sql_quote

_sq = sql_quote
from .core import B, K1


def _bm25_over_expansion(docs: DataFrame, expanded: DataFrame,
                         k: int, k1: float, b: float,
                         toks: DataFrame | None = None) -> DataFrame:
    """BM25 top-k where the query-term set is a (term) DataFrame of
    <= max_expansions rows (broadcast into the token-stream filter)."""
    from .core import bm25_rank_over
    return bm25_rank_over(docs, expanded, k, k1, b, toks=toks)


def _vocab(docs: DataFrame, profile: str = "code",
           toks: DataFrame | None = None) -> DataFrame:
    """(term, df) over the corpus — the A1 term dictionary. ``toks``:
    an already-materialized token table (``core.corpus_tokens``) so the
    expansion's vocab agg shares the query's single tokenize pass."""
    if toks is None:
        from ..tokenizer import tokens_exploded
        toks = tokens_exploded(docs, profile=profile)
    return (toks
            .select("doc_id", "term").distinct()
            .groupBy("term").agg(F.count("*").alias("df")))


def expand_prefix(docs: DataFrame, prefix: str,
                  max_expansions: int = 32,
                  profile: str = "code",
                  toks: DataFrame | None = None) -> DataFrame:
    """(term, df) expansion set for a prefix query."""
    if not prefix:
        raise ValueError("empty prefix would expand the whole vocabulary")
    return (_vocab(docs, profile, toks)
            .filter(F.col("term").startswith(prefix))
            .orderBy(F.desc("df"), F.asc("term"))
            .limit(max_expansions))


def expand_fuzzy(docs: DataFrame, term: str, max_edits: int = 1,
                 prefix_len: int = 1, max_expansions: int = 32,
                 profile: str = "code",
                 toks: DataFrame | None = None) -> DataFrame:
    """(term, df, dist) expansion set for a fuzzy query."""
    if max_edits < 1:
        raise ValueError("max_edits must be >= 1 (0 is a TermQuery)")
    v = _vocab(docs, profile, toks)
    if prefix_len > 0:
        v = v.filter(F.col("term").startswith(term[:prefix_len]))
    v = v.filter(
        F.abs(F.length("term") - F.lit(len(term))) <= max_edits)
    v = v.withColumn("dist", F.levenshtein(F.col("term"), F.lit(term))) \
         .filter(F.col("dist") <= max_edits)
    return v.orderBy(F.asc("dist"), F.desc("df"), F.asc("term")) \
            .limit(max_expansions)


def wildcard_like(pattern: str) -> str:
    """Translate a Lucene wildcard pattern (``*`` any run, ``?`` one
    char) to a SQL LIKE pattern — the one translation site, shared by
    Spark, the DuckDB twins, and the index dictionary reads. Literal
    LIKE metacharacters are escaped with ``\\`` (both engines use
    ``ESCAPE '\\'``)."""
    out = []
    for ch in pattern:
        if ch == "*":
            out.append("%")
        elif ch == "?":
            out.append("_")
        elif ch in "%_\\":
            out.append("\\" + ch)
        else:
            out.append(ch)
    return "".join(out)


def wildcard_prefix(pattern: str) -> str:
    """Literal prefix before the first wildcard — the sargable range
    gate for the dictionary scan. Empty means a leading wildcard."""
    for i, ch in enumerate(pattern):
        if ch in "*?":
            return pattern[:i]
    return pattern


def _check_wildcard(pattern: str) -> None:
    if not any(ch in "*?" for ch in pattern):
        raise ValueError(f"wildcard pattern {pattern!r} has no wildcard "
                         f"(a plain term is a TermQuery)")
    if not wildcard_prefix(pattern):
        raise ValueError(
            f"leading-wildcard pattern {pattern!r} is rejected: it "
            f"forces a full dictionary scan (Lucene's "
            f"allowLeadingWildcard=false default)")


def expand_wildcard(docs: DataFrame, pattern: str,
                    max_expansions: int = 32,
                    profile: str = "code",
                    toks: DataFrame | None = None) -> DataFrame:
    """(term, df) expansion set for a wildcard query (``te?t``,
    ``t*ble``): dictionary terms matching the whole pattern, gated by
    the sargable literal-prefix range before the LIKE evaluation,
    ranked (df DESC, term ASC), capped."""
    _check_wildcard(pattern)
    return (_vocab(docs, profile, toks)
            .filter(F.col("term").startswith(wildcard_prefix(pattern)))
            .filter(F.col("term").like(wildcard_like(pattern)))
            .orderBy(F.desc("df"), F.asc("term"))
            .limit(max_expansions))


def regex_prefix(pattern: str) -> str:
    """Leading literal run of a regex ([a-z0-9] chars not followed by
    a quantifier) — best-effort sargable gate; empty = full scan.

    A TOP-LEVEL alternation anywhere in the pattern voids the prefix:
    in ``spark|hadoop`` the leading run 'spark' is NOT a prefix of
    every match ('hadoop' matches too), so the gate must not apply.
    Alternations inside groups (``sp(a|b)rk``) are fine — the literal
    run stops at '(' before them."""
    depth = 0
    in_class = False
    i = 0
    while i < len(pattern):
        ch = pattern[i]
        if ch == "\\":
            i += 2
            continue
        if in_class:
            if ch == "]":
                in_class = False
        elif ch == "[":
            in_class = True
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth = max(0, depth - 1)
        elif ch == "|" and depth == 0:
            return ""  # top-level alternation: no common prefix
        i += 1
    out = []
    for i, ch in enumerate(pattern):
        if not (ch.isalnum() and ch == ch.lower()):
            break
        if i + 1 < len(pattern) and pattern[i + 1] in "*?+{":
            break  # quantifier applies to this char: not a literal run
        out.append(ch)
    return "".join(out)


def expand_regex(docs: DataFrame, pattern: str,
                 max_expansions: int = 32,
                 profile: str = "code",
                 toks: DataFrame | None = None) -> DataFrame:
    """(term, df) expansion set for a RegexpQuery: dictionary terms
    whose WHOLE text matches the pattern (Lucene semantics), ranked
    (df DESC, term ASC), capped. Patterns must stay in the common
    Spark-Java/DuckDB regex subset (no lookaround); validated with
    re.compile up front. A leading literal run becomes a sargable
    range gate; a pattern with none scans the dictionary — exactly
    Lucene's automaton-intersection worst case."""
    import re as _re
    if not pattern:
        raise ValueError("empty regex")
    try:
        _re.compile(pattern)
    except _re.error as e:
        raise ValueError(f"bad regex {pattern!r}: {e}") from e
    v = _vocab(docs, profile, toks)
    pfx = regex_prefix(pattern)
    if pfx:
        v = v.filter(F.col("term").startswith(pfx))
    return (v.filter(F.col("term").rlike("^(?:" + pattern + ")$"))
            .orderBy(F.desc("df"), F.asc("term"))
            .limit(max_expansions))


def prefix_bm25_topk(docs: DataFrame, prefix: str, k: int = 10,
                     max_expansions: int = 32,
                     k1: float = K1, b: float = B,
                     toks: DataFrame | None = None) -> DataFrame:
    """(rank, doc_id, score): BM25 top-k for the wildcard query
    ``prefix*``."""
    if toks is None:
        from .core import corpus_tokens
        toks = corpus_tokens(docs)
    return _bm25_over_expansion(
        docs, expand_prefix(docs, prefix, max_expansions, toks=toks),
        k, k1, b, toks=toks)


def fuzzy_bm25_topk(docs: DataFrame, term: str, max_edits: int = 1,
                    k: int = 10, prefix_len: int = 1,
                    max_expansions: int = 32,
                    k1: float = K1, b: float = B,
                    toks: DataFrame | None = None) -> DataFrame:
    """(rank, doc_id, score): BM25 top-k for the fuzzy query
    ``term~max_edits``."""
    if toks is None:
        from .core import corpus_tokens
        toks = corpus_tokens(docs)
    return _bm25_over_expansion(
        docs, expand_fuzzy(docs, term, max_edits, prefix_len,
                           max_expansions, toks=toks), k, k1, b, toks=toks)


def wildcard_bm25_topk(docs: DataFrame, pattern: str, k: int = 10,
                       max_expansions: int = 32,
                       k1: float = K1, b: float = B,
                       toks: DataFrame | None = None) -> DataFrame:
    """(rank, doc_id, score): BM25 top-k for a wildcard query."""
    if toks is None:
        from .core import corpus_tokens
        toks = corpus_tokens(docs)
    return _bm25_over_expansion(
        docs, expand_wildcard(docs, pattern, max_expansions, toks=toks),
        k, k1, b, toks=toks)


def regex_bm25_topk(docs: DataFrame, pattern: str, k: int = 10,
                    max_expansions: int = 32,
                    k1: float = K1, b: float = B,
                    toks: DataFrame | None = None) -> DataFrame:
    """(rank, doc_id, score): BM25 top-k for a RegexpQuery."""
    if toks is None:
        from .core import corpus_tokens
        toks = corpus_tokens(docs)
    return _bm25_over_expansion(
        docs, expand_regex(docs, pattern, max_expansions, toks=toks),
        k, k1, b, toks=toks)


# --------------------------------------------------------------- DuckDB

_BM25_TAIL = """tc AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks
       WHERE term IN (SELECT term FROM expanded) GROUP BY doc_id, term),
dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM toks GROUP BY doc_id),
g AS (SELECT count(*)::BIGINT AS n, avg(dl) AS avgdl FROM dl),
stats AS (SELECT term, count(*)::BIGINT AS df FROM tc GROUP BY term),
scored AS (
  SELECT tc.doc_id,
         round(sum( ln(1 + (g.n - s.df + 0.5)/(s.df + 0.5))
              * (tc.tf * ({k1} + 1.0))
              / (tc.tf + {k1} * (1.0 - {b} + {b} * dl.dl / g.avgdl)) ), 6) AS score
  FROM tc
  JOIN stats s USING (term)
  JOIN dl USING (doc_id)
  CROSS JOIN g
  GROUP BY tc.doc_id)
SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INTEGER) AS rank,
       doc_id, score
FROM scored
ORDER BY score DESC, doc_id ASC
LIMIT {k}"""




def prefix_bm25_topk_sql(prefix: str, k: int = 10,
                         max_expansions: int = 32,
                         k1: float = K1, b: float = B) -> str:
    return f"""WITH {duckdb_toks_cte()},
vocab AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM toks GROUP BY term),
expanded AS (SELECT term FROM vocab
             WHERE starts_with(term, {_sq(prefix)})
             ORDER BY df DESC, term ASC LIMIT {max_expansions}),
{_BM25_TAIL.format(k1=k1, b=b, k=k)}"""


def wildcard_expanded_sql(pattern: str, max_expansions: int) -> str:
    """The ``expanded`` CTE body for a wildcard pattern (shared with
    the querystring twin)."""
    _check_wildcard(pattern)
    return (f"SELECT term FROM vocab "
            f"WHERE starts_with(term, {_sq(wildcard_prefix(pattern))}) "
            f"AND term LIKE {_sq(wildcard_like(pattern))} ESCAPE '\\' "
            f"ORDER BY df DESC, term ASC LIMIT {int(max_expansions)}")


def regex_expanded_sql(pattern: str, max_expansions: int) -> str:
    """The ``expanded`` CTE body for a regex pattern (shared with the
    querystring twin)."""
    pfx = regex_prefix(pattern)
    gate = f"WHERE starts_with(term, {_sq(pfx)}) AND " if pfx else "WHERE "
    return (f"SELECT term FROM vocab "
            f"{gate}regexp_full_match(term, {_sq(pattern)}) "
            f"ORDER BY df DESC, term ASC LIMIT {int(max_expansions)}")


def wildcard_bm25_topk_sql(pattern: str, k: int = 10,
                           max_expansions: int = 32,
                           k1: float = K1, b: float = B) -> str:
    return f"""WITH {duckdb_toks_cte()},
vocab AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM toks GROUP BY term),
expanded AS ({wildcard_expanded_sql(pattern, max_expansions)}),
{_BM25_TAIL.format(k1=k1, b=b, k=k)}"""


def regex_bm25_topk_sql(pattern: str, k: int = 10,
                        max_expansions: int = 32,
                        k1: float = K1, b: float = B) -> str:
    return f"""WITH {duckdb_toks_cte()},
vocab AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM toks GROUP BY term),
expanded AS ({regex_expanded_sql(pattern, max_expansions)}),
{_BM25_TAIL.format(k1=k1, b=b, k=k)}"""


def fuzzy_bm25_topk_sql(term: str, max_edits: int = 1, k: int = 10,
                        prefix_len: int = 1, max_expansions: int = 32,
                        k1: float = K1, b: float = B) -> str:
    pfx = ""
    if prefix_len > 0:
        pfx = f"AND starts_with(term, {_sq(term[:prefix_len])})"
    return f"""WITH {duckdb_toks_cte()},
vocab AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM toks GROUP BY term),
expanded AS (SELECT term FROM vocab
             WHERE abs(length(term) - {len(term)}) <= {max_edits} {pfx}
               AND levenshtein(term, {_sq(term)}) <= {max_edits}
             ORDER BY levenshtein(term, {_sq(term)}) ASC, df DESC, term ASC
             LIMIT {max_expansions}),
{_BM25_TAIL.format(k1=k1, b=b, k=k)}"""
