"""Phrase and proximity search over the documents table.

A full-text engine that cannot answer "these words, in this order,
adjacent" is not complete: phrase queries are the capability positional
postings exist for (Lucene's ``.pos`` stream; the reference pipeline's
n-gram candidate selection, pke/base.py ngram_selection, is the batch
analogue — every surface n-gram IS an adjacency fact). Two execution
paths share these semantics:

- the pure-DataFrame scorers here (oracle-gated against DuckDB, the
  driver correctness gate), and
- the positional-sidecar index path (``pke_spark/index/positions.py``),
  parity-tested against this module, which answers the same queries
  without re-tokenizing the corpus.

Semantics (both paths, and the DuckDB oracles):

- ``phrase_topk(terms)``: a match at start position p in doc d means
  token(d, p + i) == terms[i] for every i. ``phrase_tf`` counts match
  start positions; top-k by (phrase_tf DESC, doc_id ASC).
- ``proximity_topk(a, b, window)``: counts ordered pairs of positions
  (pa, pb) with ``1 <= pb - pa <= window`` — "a followed by b within
  window tokens".

Plan shape at scale (phrase): the token stream is filtered to the
phrase's terms FIRST (broadcast join against the tiny term->offset map),
so only matching tokens reach the shuffle; a match start is then a
(doc_id, pos - offset) group containing all ``len(terms)`` distinct
offsets — ONE shuffled groupBy, no self-join chain (an n-term phrase as
n-1 self-joins would shuffle the token table n times). The final top-k
is a TakeOrderedAndProject, never a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..rows import rows_df

from ..tokenizer import duckdb_toks_cte, tokens_exploded


def _term_offsets(spark, terms: list[str]) -> DataFrame:
    return rows_df(spark, [(t, i) for i, t in enumerate(terms)],
                   "term string, off int")


def phrase_from_positions(pos: DataFrame, terms: list[str],
                          k: int = 10) -> DataFrame:
    """Phrase top-k from a (doc_id, pos, term) stream (any source: the
    tokenizer, or the positional sidecar's decoded fragments).

    Handles repeated terms in the phrase ("batch batch"): the offset map
    has one row per (term, offset) pair, so a token row fans out to every
    offset its term occupies, and a start position matches only when all
    ``n`` DISTINCT offsets are present at it.
    """
    if not terms:
        raise ValueError("phrase query needs at least one term")
    n = len(terms)
    hits = (pos.join(F.broadcast(_term_offsets(pos.sparkSession, terms)),
                     "term")
            .select("doc_id", (F.col("pos") - F.col("off")).alias("start"),
                    "off"))
    starts = (hits.groupBy("doc_id", "start")
              .agg(F.countDistinct("off").alias("n_off"))
              .where(F.col("n_off") == n))
    scored = starts.groupBy("doc_id").agg(F.count("*").alias("phrase_tf"))
    return scored.orderBy(F.desc("phrase_tf"), F.asc("doc_id")).limit(k)


def proximity_from_positions(pos: DataFrame, term_a: str, term_b: str,
                             window: int = 5, k: int = 10) -> DataFrame:
    """Proximity top-k from a (doc_id, pos, term) stream.

    Both position streams are filtered to their single term before the
    doc_id equi-join, so the join input is the two terms' postings, not
    the corpus; the range predicate is applied on top of the equi-join
    (no cartesian)."""
    a = pos.where(F.col("term") == term_a).select("doc_id",
                                                  F.col("pos").alias("pa"))
    b = pos.where(F.col("term") == term_b).select("doc_id",
                                                  F.col("pos").alias("pb"))
    pairs = a.join(b, "doc_id").where(
        (F.col("pb") - F.col("pa") >= 1) & (F.col("pb") - F.col("pa") <= window))
    scored = pairs.groupBy("doc_id").agg(F.count("*").alias("pair_count"))
    return scored.orderBy(F.desc("pair_count"), F.asc("doc_id")).limit(k)


def spannear_ids_from_positions(pos: DataFrame, terms: list[str],
                                slop: int) -> DataFrame:
    """(doc_id) docs containing ``terms`` IN ORDER with total stretch
    <= ``slop``: exists positions q0 < q1 < ... < q_{n-1} with
    term(q_i) == terms[i] and q_{n-1} - q0 <= n - 1 + slop — Lucene's
    SpanNearQuery(inOrder=true) semantics (NOT the reordering sloppy
    PhraseQuery). slop=0 degenerates to the exact phrase; use the
    start-alignment matcher for that (one groupBy, no join chain).

    Plan: each step's position stream is filtered to its single term
    before the doc_id equi-join (postings-sized input, no cartesian),
    and every step carries the window bound (p_i - p0 <= n-1+slop) so
    intermediate growth is capped by tokens-in-window, not doc
    length."""
    n = len(terms)
    if n < 2:
        raise ValueError("span-near needs >= 2 terms")
    if slop < 1:
        raise ValueError("slop must be >= 1 (0 is an exact phrase)")
    bound = n - 1 + slop
    cur = (pos.where(F.col("term") == terms[0])
           .select("doc_id", F.col("pos").alias("p0")))
    for i in range(1, n):
        nxt = (pos.where(F.col("term") == terms[i])
               .select("doc_id", F.col("pos").alias(f"p{i}")))
        cur = (cur.join(nxt, "doc_id")
               .where((F.col(f"p{i}") > F.col(f"p{i - 1}"))
                      & (F.col(f"p{i}") - F.col("p0") <= bound)))
    return cur.select("doc_id").distinct()


def spannear_ids_sql(terms: list[str], slop: int) -> str:
    """DuckDB twin of ``spannear_ids_from_positions`` — a SELECT body
    producing matching doc_ids off the ``toks`` CTE."""
    n = len(terms)
    if n < 2:
        raise ValueError("span-near needs >= 2 terms")
    from ..tokenizer import sql_quote
    bound = n - 1 + slop
    joins, conds = [], [f"t0.term = {sql_quote(terms[0])}"]
    for i in range(1, n):
        joins.append(
            f"JOIN toks t{i} ON t{i}.doc_id = t0.doc_id "
            f"AND t{i}.pos > t{i - 1}.pos "
            f"AND t{i}.pos - t0.pos <= {bound}")
        conds.append(f"t{i}.term = {sql_quote(terms[i])}")
    return (f"SELECT DISTINCT t0.doc_id FROM toks t0 "
            + " ".join(joins) + " WHERE " + " AND ".join(conds))


def phrase_topk(docs: DataFrame, terms: list[str], k: int = 10) -> DataFrame:
    """Exact-phrase top-k over the raw corpus:
    (doc_id, phrase_tf), phrase_tf DESC, doc_id ASC."""
    return phrase_from_positions(tokens_exploded(docs), terms, k)


def proximity_topk(docs: DataFrame, term_a: str, term_b: str,
                   window: int = 5, k: int = 10) -> DataFrame:
    """Ordered within-window pair count over the raw corpus:
    (doc_id, pair_count)."""
    return proximity_from_positions(tokens_exploded(docs), term_a, term_b,
                                    window, k)


# --------------------------------------------------------------- DuckDB

def phrase_topk_sql(terms: list[str], k: int = 10,
                    table: str = "documents") -> str:
    n = len(terms)
    vals = ", ".join(f"('{t.replace(chr(39), chr(39) * 2)}', {i})"
                     for i, t in enumerate(terms))
    return f"""WITH {duckdb_toks_cte(table=table)},
m(term, off) AS (SELECT * FROM (VALUES {vals})),
hits AS (SELECT doc_id, pos - off AS start, off FROM toks JOIN m USING (term)),
starts AS (SELECT doc_id, start FROM hits
           GROUP BY doc_id, start HAVING count(DISTINCT off) = {n})
SELECT doc_id, count(*)::BIGINT AS phrase_tf FROM starts GROUP BY doc_id
ORDER BY phrase_tf DESC, doc_id ASC LIMIT {k}"""


def proximity_topk_sql(term_a: str, term_b: str, window: int = 5,
                       k: int = 10, table: str = "documents") -> str:
    ea = term_a.replace("'", "''")
    eb = term_b.replace("'", "''")
    return f"""WITH {duckdb_toks_cte(table=table)},
a AS (SELECT doc_id, pos AS pa FROM toks WHERE term = '{ea}'),
b AS (SELECT doc_id, pos AS pb FROM toks WHERE term = '{eb}')
SELECT doc_id, count(*)::BIGINT AS pair_count
FROM a JOIN b USING (doc_id)
WHERE pb - pa BETWEEN 1 AND {window}
GROUP BY doc_id
ORDER BY pair_count DESC, doc_id ASC LIMIT {k}"""
