"""Fielded retrieval: metadata-filtered BM25 and facet counts.

Lucene's two everyday companions to the scored query:

- **filter clause** (``IndexSearcher.search(query, filter)`` /
  BooleanClause.FILTER): a non-scoring predicate over stored document
  fields (here the ``documents`` metadata columns ``lang`` /
  ``source`` / ``n_chars``) that restricts the CANDIDATE set while
  corpus-level statistics (N, avgdl, df) stay those of the FULL index
  — exactly Lucene's semantics, where a filter never changes term
  stats. The reference's analog is pke's language-gated candidate
  selection (base.py stoplist gating): a hard gate on which documents
  /candidates may score, never on the DF table.
- **facets**: counts of MATCHING documents per field value (a doc
  matches when it contains >=1 query term — the same candidate set
  BM25's OR semantics scores).

Both are pure DataFrame compositions with DuckDB SQL twins that share
the predicate string verbatim.

Plan shape at scale: the metadata predicate is applied to the
``documents`` scan (parquet predicate pushdown + column pruning to
(doc_id, <field>)), and joins tc_q on doc_id — the shuffle tc_q
already needs. Term stats stay full-corpus and query-term-filtered
(broadcast). Facet counting shuffles only matched (doc_id) rows, then
a tiny facet-value aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..tokenizer import duckdb_toks_cte, sql_str_list, tokens_exploded
from ..rows import rows_df
from .core import B, K1

#: metadata columns a filter predicate may reference (shared by the
#: Spark and DuckDB sides; anything else in the predicate is a bug)
FILTER_COLS = ("doc_id", "lang", "source", "n_chars")


def filtered_bm25_topk(docs: DataFrame, query_terms: list[str],
                       predicate: str, k: int = 10,
                       k1: float = K1, b: float = B,
                       toks: DataFrame | None = None) -> DataFrame:
    """BM25 top-k over documents satisfying a metadata ``predicate``
    (a SQL boolean expression over FILTER_COLS, e.g. ``lang = 'en'``).

    Lucene filter semantics: N / avgdl / df are computed over the FULL
    corpus; the predicate only restricts which documents may appear in
    the result. Identical scoring constants, rounding, and (score DESC,
    doc_id ASC) tie-breaking to ``core.bm25_topk``.
    """
    from .core import bm25_rank_over
    q = rows_df(docs.sparkSession, [(t,) for t in query_terms],
                "term string")
    # the filter: pushable predicate on the documents scan, pruned to
    # (doc_id) after evaluation
    cand = docs.filter(F.expr(predicate)).select("doc_id")
    return bm25_rank_over(
        docs, q, k, k1, b,
        constrain=lambda tc: tc.join(cand, "doc_id", "left_semi"),
        toks=toks)


def facet_counts(docs: DataFrame, query_terms: list[str],
                 facet_col: str, topn: int = 10) -> DataFrame:
    """(facet, n_docs) for the ``topn`` most frequent values of
    ``facet_col`` among documents matching >=1 query term, ordered
    (n_docs DESC, facet ASC). Lucene's FacetsCollector over the
    query's full match set — counts ALL matches, not just top-k."""
    spark = docs.sparkSession
    q = rows_df(spark, [(t,) for t in query_terms], "term string")
    matched = (tokens_exploded(docs).join(F.broadcast(q), "term")
               .select("doc_id").distinct())
    return (matched.join(docs.select("doc_id", facet_col), "doc_id")
            .groupBy(F.col(facet_col).alias("facet"))
            .agg(F.count("*").alias("n_docs"))
            .orderBy(F.desc("n_docs"), F.asc("facet"))
            .limit(topn))


# --------------------------------------------------------------- DuckDB

def filtered_bm25_topk_sql(query_terms: list[str], predicate: str,
                           k: int = 10, k1: float = K1, b: float = B
                           ) -> str:
    qlist = ", ".join("'" + t.replace("'", "''") + "'" for t in query_terms)
    return f"""WITH {duckdb_toks_cte()},
q AS (SELECT unnest([{qlist}]) AS term),
tc AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks
       JOIN q USING (term) GROUP BY doc_id, term),
dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM toks GROUP BY doc_id),
g AS (SELECT count(*)::BIGINT AS n, avg(dl) AS avgdl FROM dl),
stats AS (SELECT term, count(*)::BIGINT AS df FROM tc GROUP BY term),
cand AS (SELECT doc_id FROM documents WHERE {predicate}),
scored AS (
  SELECT tc.doc_id,
         round(sum( ln(1 + (g.n - s.df + 0.5)/(s.df + 0.5))
              * (tc.tf * ({k1} + 1.0))
              / (tc.tf + {k1} * (1.0 - {b} + {b} * dl.dl / g.avgdl)) ), 6) AS score
  FROM tc
  JOIN stats s USING (term)
  JOIN dl USING (doc_id)
  CROSS JOIN g
  WHERE tc.doc_id IN (SELECT doc_id FROM cand)
  GROUP BY tc.doc_id)
SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INTEGER) AS rank,
       doc_id, score
FROM scored
ORDER BY score DESC, doc_id ASC
LIMIT {k}"""


def facet_counts_sql(query_terms: list[str], facet_col: str,
                     topn: int = 10) -> str:
    qlist = sql_str_list(query_terms)
    return f"""WITH {duckdb_toks_cte()},
matched AS (SELECT DISTINCT doc_id FROM toks WHERE term IN {qlist})
SELECT d.{facet_col} AS facet, count(*)::BIGINT AS n_docs
FROM matched JOIN documents d USING (doc_id)
GROUP BY d.{facet_col}
ORDER BY n_docs DESC, facet ASC
LIMIT {topn}"""
