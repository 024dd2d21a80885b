"""More-Like-This: rank documents by similarity to a source document.

Lucene's ``MoreLikeThis`` query builder (public API:
``org.apache.lucene.queries.mlt.MoreLikeThis``): select the source
document's most interesting terms and search them as an unboosted
SHOULD query. Domain adaptation, documented:

- *interestingness* = ``tf * idf`` with THIS engine's BM25 idf
  (``ln(1 + (N - df + 0.5)/(df + 0.5))``) rather than Lucene's classic
  ``log(N/(df+1)) + 1`` — one idf everywhere keeps every scorer
  bit-comparable across the corpus, index, and DuckDB oracle paths;
- term selection is total-ordered: round(tscore, 6) DESC, term ASC —
  the engine-wide W4 tie-break discipline, so the selected term set is
  host- and partition-independent;
- gates are Lucene's: ``min_term_freq`` (source-doc tf), and
  ``min_doc_freq`` (corpus df), ``max_query_terms`` cap;
- the source document itself is excluded from the result set (the
  caller asking "more like X" already has X) — Lucene leaves this to
  the caller; here it is a ``constrain`` anti-filter so corpus
  statistics stay untouched, matching the kernel's Lucene-filter rule.

Plan shape at scale: the source doc's term vector is one
predicate-pushdown point read (corpus: a filtered tokenize of ONE doc;
index serving: a doc_id-pruned segments read), the term-selection
top-N is driver-size (≤ doc length), and the search itself is the
shared ``bm25_rank_over`` kernel — broadcast query terms, one shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..tokenizer import duckdb_toks_cte, tokens_exploded
from .core import B, K1, bm25_rank_over

MAX_QUERY_TERMS = 25
MIN_TERM_FREQ = 2
MIN_DOC_FREQ = 2


def mlt_terms(docs: DataFrame, doc_id: int,
              max_query_terms: int = MAX_QUERY_TERMS,
              min_term_freq: int = MIN_TERM_FREQ,
              min_doc_freq: int = MIN_DOC_FREQ,
              profile: str = "code",
              toks=None) -> DataFrame:
    """(term, tscore): the source doc's interesting terms, selected by
    round(tf * idf, 6) DESC, term ASC, gated and capped per Lucene's
    MoreLikeThis knobs."""
    if toks is None:
        toks = tokens_exploded(docs, profile=profile)
    src = (toks.where(F.col("doc_id") == int(doc_id))
           .groupBy("term").agg(F.count("*").alias("tf"))
           .where(F.col("tf") >= int(min_term_freq)))
    # df / N over the FULL corpus (stats are never constrained);
    # filtering the token stream to the source doc's terms before the
    # df aggregation keeps the big side one semi-joined pass
    df_t = (toks.join(F.broadcast(src.select("term")), "term")
            .groupBy("term")
            .agg(F.countDistinct("doc_id").alias("df"))
            .where(F.col("df") >= int(min_doc_freq)))
    # N = docs with >= 1 token (the dl-table count every scorer and
    # the DuckDB twin use), not the raw row count — a tokenless doc is
    # invisible to the index and must be invisible to idf too
    n = toks.select(F.countDistinct("doc_id")).first()[0]
    idf = F.log(F.lit(1.0) + (F.lit(float(n)) - F.col("df") + 0.5)
                / (F.col("df") + 0.5))
    return (src.join(df_t, "term")
            .select("term",
                    F.round(F.col("tf") * idf, 6).alias("tscore"))
            .orderBy(F.desc("tscore"), F.asc("term"))
            .limit(int(max_query_terms)))


def mlt_topk(docs: DataFrame, doc_id: int, k: int = 10,
             max_query_terms: int = MAX_QUERY_TERMS,
             min_term_freq: int = MIN_TERM_FREQ,
             min_doc_freq: int = MIN_DOC_FREQ,
             k1: float = K1, b: float = B) -> DataFrame:
    """(rank, doc_id, score): BM25 top-k of the documents most like
    ``doc_id``, source doc excluded."""
    from .core import corpus_tokens
    toks = corpus_tokens(docs)
    q = mlt_terms(docs, doc_id, max_query_terms, min_term_freq,
                  min_doc_freq, toks=toks).select("term")
    return bm25_rank_over(
        docs, q, k, k1, b,
        constrain=lambda tc: tc.where(F.col("doc_id") != int(doc_id)),
        toks=toks)


# --------------------------------------------------------------- DuckDB

def mlt_topk_sql(doc_id_expr: str, k: int = 10,
                 max_query_terms: int = MAX_QUERY_TERMS,
                 min_term_freq: int = MIN_TERM_FREQ,
                 min_doc_freq: int = MIN_DOC_FREQ,
                 k1: float = K1, b: float = B,
                 table: str = "documents") -> str:
    """DuckDB twin of ``mlt_topk``. ``doc_id_expr`` is any scalar SQL
    expression (a literal, or e.g. ``(SELECT min(doc_id) FROM
    documents)`` for an sf-independent entry)."""
    return f"""WITH {duckdb_toks_cte(table=table)},
tc AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY doc_id, term),
dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM toks GROUP BY doc_id),
g AS (SELECT count(*)::BIGINT AS n, avg(dl) AS avgdl FROM dl),
stats AS (SELECT term, count(*)::BIGINT AS df FROM tc GROUP BY term),
src AS (SELECT term, tf FROM tc
        WHERE doc_id = {doc_id_expr} AND tf >= {int(min_term_freq)}),
q AS (SELECT src.term,
             round(src.tf * ln(1 + (g.n - s.df + 0.5)/(s.df + 0.5)), 6)
               AS tscore
      FROM src JOIN stats s USING (term) CROSS JOIN g
      WHERE s.df >= {int(min_doc_freq)}
      ORDER BY tscore DESC, src.term ASC
      LIMIT {int(max_query_terms)}),
scored AS (
  SELECT tc.doc_id,
         round(sum( ln(1 + (g.n - s.df + 0.5)/(s.df + 0.5))
              * (tc.tf * ({k1} + 1.0))
              / (tc.tf + {k1} * (1.0 - {b} + {b} * dl.dl / g.avgdl)) ), 6) AS score
  FROM tc
  JOIN q USING (term)
  JOIN stats s USING (term)
  JOIN dl USING (doc_id)
  CROSS JOIN g
  WHERE tc.doc_id != {doc_id_expr}
  GROUP BY tc.doc_id)
SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INTEGER) AS rank,
       doc_id, score
FROM scored
ORDER BY score DESC, doc_id ASC
LIMIT {int(k)}"""
