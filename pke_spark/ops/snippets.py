"""Snippet extraction: best highlight window per top-k BM25 hit.

Lucene's UnifiedHighlighter core loop, re-expressed relationally: for
each of the query's top-k documents, find the ``width``-token window
containing the most DISTINCT query terms; ties broken by the earliest
window start. Returns token-coordinate spans (the same 1-based ``pos``
the positional sidecar stores), which is what a serving layer needs to
slice stored text.

The optimal window can always be anchored at some query-term match
position, so candidate windows are generated only at match anchors —
per top-k doc that's O(matches^2) pairs with matches tiny, never a
corpus-wide pass.

Plan shape at scale: top-k runs first (the standard bm25_topk
TakeOrderedAndProject); its k doc_ids and the query terms are both
broadcast into the token-stream filter, so the match-position table is
k docs' query-term hits only. The anchor/member self-join is an
equi-join on doc_id over that tiny table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..tokenizer import duckdb_toks_cte, sql_str_list
from ..rows import rows_df
from .core import B, K1, bm25_topk, corpus_tokens


def snippet_windows(docs: DataFrame, query_terms: list[str],
                    k: int = 10, width: int = 20,
                    k1: float = K1, b: float = B) -> DataFrame:
    """(rank, doc_id, score, win_start, win_end, n_terms) for the BM25
    top-k; win_* are 1-based token positions, n_terms = distinct query
    terms inside the best window."""
    spark = docs.sparkSession
    toks = corpus_tokens(docs)  # shared by the scorer and the windows
    top = bm25_topk(docs, query_terms, k, k1, b, toks=toks)
    q = rows_df(spark, [(t,) for t in query_terms], "term string")
    ids = top.select("doc_id")
    mp = (toks
          .join(F.broadcast(q), "term")
          .join(F.broadcast(ids), "doc_id"))
    anchors = mp.select("doc_id", F.col("pos").alias("win_start")).distinct()
    members = mp.select("doc_id", "pos", "term")
    wins = (anchors.join(members, "doc_id")
            .filter((F.col("pos") >= F.col("win_start")) &
                    (F.col("pos") < F.col("win_start") + width))
            .groupBy("doc_id", "win_start")
            .agg(F.countDistinct("term").alias("n_terms")))
    pick = Window.partitionBy("doc_id").orderBy(
        F.desc("n_terms"), F.asc("win_start"))
    best = (wins.withColumn("rn", F.row_number().over(pick))
            .filter(F.col("rn") == 1).drop("rn"))
    return (top.join(best, "doc_id")
            .select("rank", "doc_id", "score",
                    F.col("win_start").cast("long"),
                    (F.col("win_start") + width - 1).cast("long")
                    .alias("win_end"),
                    F.col("n_terms").cast("long"))
            .orderBy("rank"))


# --------------------------------------------------------------- DuckDB

def snippet_windows_sql(query_terms: list[str], k: int = 10,
                        width: int = 20, k1: float = K1, b: float = B
                        ) -> str:
    qlist = sql_str_list(query_terms)
    return f"""WITH {duckdb_toks_cte()},
tc AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks
       WHERE term IN {qlist} GROUP BY doc_id, term),
dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM toks GROUP BY doc_id),
g AS (SELECT count(*)::BIGINT AS n, avg(dl) AS avgdl FROM dl),
stats AS (SELECT term, count(*)::BIGINT AS df FROM tc GROUP BY term),
scored AS (
  SELECT tc.doc_id,
         round(sum( ln(1 + (g.n - s.df + 0.5)/(s.df + 0.5))
              * (tc.tf * ({k1} + 1.0))
              / (tc.tf + {k1} * (1.0 - {b} + {b} * dl.dl / g.avgdl)) ), 6) AS score
  FROM tc JOIN stats s USING (term) JOIN dl USING (doc_id) CROSS JOIN g
  GROUP BY tc.doc_id),
top AS (
  SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INTEGER) AS rank,
         doc_id, score
  FROM scored ORDER BY score DESC, doc_id ASC LIMIT {k}),
mp AS (SELECT doc_id, pos, term FROM toks
       WHERE term IN {qlist}
         AND doc_id IN (SELECT doc_id FROM top)),
wins AS (
  SELECT a.doc_id, a.pos AS win_start,
         count(DISTINCT m.term)::BIGINT AS n_terms
  FROM (SELECT DISTINCT doc_id, pos FROM mp) a
  JOIN mp m ON m.doc_id = a.doc_id
          AND m.pos >= a.pos AND m.pos < a.pos + {width}
  GROUP BY a.doc_id, a.pos),
best AS (
  SELECT doc_id, win_start, n_terms,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY n_terms DESC, win_start ASC) AS rn
  FROM wins)
SELECT t.rank, t.doc_id, t.score,
       b.win_start::BIGINT AS win_start,
       (b.win_start + {width} - 1)::BIGINT AS win_end,
       b.n_terms
FROM top t JOIN best b ON b.doc_id = t.doc_id AND b.rn = 1
ORDER BY t.rank"""
