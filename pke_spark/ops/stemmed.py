"""Stemmed-mode operators (P1/P6): the engine's analog of pke's default
``normalization='stemming'`` pipeline (pke/base.py:110-127) — tokens are
Porter-stemmed before candidate grouping, candidates are keyed by the
stemmed phrase, and the surface form of the first occurrence is kept for
output (pke/base.py:189-198 get_n_best surface semantics).

Spark side: the Porter stemmer runs as a vectorized pandas UDF over the
token stream (Arrow batches, distinct-memoized per batch — no per-row
Python).

Oracle side: DuckDB cannot run Python and the fts ``stem()`` extension
is unavailable offline, so each oracle inlines a (term -> stem) VALUES
map computed by the SAME ``porter_stem`` over the oracle corpus's
vocabulary. The oracle therefore hard-verifies the DISTRIBUTED DATAFLOW
(tokenize -> stem join -> group -> rank); the stemmer function itself is
verified independently against the published Porter vectors in
tests/test_stemmer.py.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from ..stemmer import porter_stem, stem_series
from ..tokenizer import (TEXT_STOPWORDS, duckdb_toks_cte, sql_str_list,
                         tokens_exploded)

def _stem_porter(s):
    return stem_series(s)  # single-arg shim: pandas_udf needs 1:1 sig


_stem_udf = F.pandas_udf(_stem_porter, StringType())

ORACLE_SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR",
                               "/root/testdata/sf0.01")


# ---------------------------------------------------------------- Spark

def stemmed_tokens(docs: DataFrame) -> DataFrame:
    """(doc_id, pos, term, stem) — the token stream with P1 applied."""
    return tokens_exploded(docs).withColumn("stem", _stem_udf("term"))


def token_counts_stemmed(docs: DataFrame) -> DataFrame:
    """(doc_id, stem, tf) — A3 on stems."""
    return (stemmed_tokens(docs)
            .groupBy("doc_id", "stem").agg(F.count("*").alias("tf")))


def tfidf_stemmed_topk(docs: DataFrame, k: int = 3) -> DataFrame:
    """Per-doc top-k stems by TF x IDF with pke's +1 smoothing — the
    TfIdf model in its default (stemmed) normalization."""
    tc = token_counts_stemmed(docs)
    stats = tc.groupBy("stem").agg(F.count("*").alias("df"))
    nrow = docs.agg(F.count("*").cast("double").alias("n"))
    weight = F.round(
        F.col("tf") * F.log2((F.col("n") + 1.0) / (F.col("df") + 1.0)), 6)
    w = Window.partitionBy("doc_id").orderBy(F.desc("weight"), F.asc("stem"))
    return (tc.join(stats, "stem")
            .crossJoin(F.broadcast(nrow))
            .withColumn("weight", weight)
            .withColumn("rank", F.row_number().over(w).cast("int"))
            .filter(F.col("rank") <= k)
            .select("doc_id", "rank", "stem", "tf", "weight"))


def stemmed_candidates(docs: DataFrame,
                       stoplist: tuple[str, ...] = TEXT_STOPWORDS
                       ) -> DataFrame:
    """(doc_id, candidate, surface, tf, first_offset, n_words) —
    candidate runs KEYED BY THE STEMMED PHRASE (P6 stem join), stoplist
    gate on the surface token (pke checks words, not stems,
    pke/base.py:424), surface = first occurrence's surface phrase."""
    toks = stemmed_tokens(docs)
    w = Window.partitionBy("doc_id").orderBy("pos") \
        .rowsBetween(Window.unboundedPreceding, 0)
    runs = (toks
            .withColumn("flag", (~F.col("term").isin(*stoplist)).cast("int"))
            .withColumn("run_id", F.sum(1 - F.col("flag")).over(w))
            .filter(F.col("flag") == 1))
    phrases = runs.groupBy("doc_id", "run_id").agg(
        F.array_join(
            F.transform(F.array_sort(F.collect_list(F.struct("pos", "stem"))),
                        lambda s: s.stem), " ").alias("candidate"),
        F.array_join(
            F.transform(F.array_sort(F.collect_list(F.struct("pos", "term"))),
                        lambda s: s.term), " ").alias("surface"),
        F.min("pos").cast("long").alias("start_pos"),
        F.count("*").alias("n_words"))
    return (phrases.groupBy("doc_id", "candidate").agg(
        F.count("*").alias("tf"),
        F.min("start_pos").alias("first_offset"),
        F.min_by("surface", "start_pos").alias("surface"),
        F.max("n_words").alias("n_words"))
        .select("doc_id", "candidate", "surface", "tf", "first_offset",
                "n_words"))


# --------------------------------------------------------------- DuckDB

def _oracle_vocab(sf_dir: str) -> list[str]:
    import duckdb
    expr_cte = duckdb_toks_cte(
        table=f"read_parquet('{sf_dir}/documents.parquet')")
    rows = duckdb.connect().execute(
        f"WITH {expr_cte} SELECT DISTINCT term FROM toks ORDER BY term"
    ).fetchall()
    return [r[0] for r in rows]


def _stem_map_cte(sf_dir: str | None = None) -> str:
    """stems(term, stem) VALUES map over the oracle corpus vocabulary,
    computed with the engine's own porter_stem (see module docstring for
    the epistemics)."""
    vocab = _oracle_vocab(sf_dir or ORACLE_SF_DIR)
    rows = ", ".join(
        "('" + t.replace("'", "''") + "', '"
        + porter_stem(t).replace("'", "''") + "')" for t in vocab)
    return (f"stems(term, stem) AS (SELECT * FROM (VALUES {rows}) "
            "AS v(term, stem))")


def _stoks_cte(sf_dir: str | None = None) -> str:
    """toks + stem-joined token stream (COALESCE to the surface term for
    any token outside the map's vocabulary)."""
    return f"""{duckdb_toks_cte()},
{_stem_map_cte(sf_dir)},
stoks AS (
  SELECT t.doc_id, t.pos, t.term, coalesce(s.stem, t.term) AS stem
  FROM toks t LEFT JOIN stems s USING (term))"""


def token_counts_stemmed_sql(sf_dir: str | None = None) -> str:
    return f"""WITH {_stoks_cte(sf_dir)}
SELECT doc_id, stem, count(*)::BIGINT AS tf FROM stoks GROUP BY doc_id, stem"""


def tfidf_stemmed_topk_sql(k: int = 3, sf_dir: str | None = None) -> str:
    return f"""WITH {_stoks_cte(sf_dir)},
tc AS (SELECT doc_id, stem, count(*)::BIGINT AS tf FROM stoks GROUP BY 1, 2),
stats AS (SELECT stem, count(*)::BIGINT AS df FROM tc GROUP BY 1),
n AS (SELECT count(*)::BIGINT AS n FROM documents),
ranked AS (
  SELECT tc.doc_id, tc.stem, tc.tf,
         round(tc.tf * log2((n.n + 1.0) / (s.df + 1.0)), 6) AS weight,
         CAST(row_number() OVER (PARTITION BY tc.doc_id
              ORDER BY round(tc.tf * log2((n.n + 1.0) / (s.df + 1.0)), 6) DESC,
                       tc.stem ASC) AS INTEGER) AS rank
  FROM tc JOIN stats s USING (stem) CROSS JOIN n)
SELECT doc_id, rank, stem, tf, weight FROM ranked WHERE rank <= {k}"""


def stemmed_candidates_sql(stoplist: tuple[str, ...] = TEXT_STOPWORDS,
                           sf_dir: str | None = None) -> str:
    return f"""WITH {_stoks_cte(sf_dir)},
flagged AS (
  SELECT doc_id, pos, term, stem,
         CASE WHEN term IN {sql_str_list(stoplist)} THEN 0 ELSE 1 END AS flag
  FROM stoks),
runs AS (
  SELECT *, sum(1 - flag) OVER (PARTITION BY doc_id ORDER BY pos
           ROWS UNBOUNDED PRECEDING) AS run_id
  FROM flagged),
phrases AS (
  SELECT doc_id, run_id, string_agg(stem, ' ' ORDER BY pos) AS candidate,
         string_agg(term, ' ' ORDER BY pos) AS surface,
         min(pos)::BIGINT AS start_pos, count(*)::BIGINT AS n_words
  FROM runs WHERE flag = 1 GROUP BY doc_id, run_id)
SELECT doc_id, candidate, count(*)::BIGINT AS tf,
       min(start_pos)::BIGINT AS first_offset,
       min_by(surface, start_pos) AS surface,
       max(n_words)::BIGINT AS n_words
FROM phrases GROUP BY doc_id, candidate"""
