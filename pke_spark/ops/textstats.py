"""Text-analysis operators over the documents table: language-ID
(marker-token heuristic), quality scoring, token counting, and document
fingerprinting (shingle min-hash) — training-data-pipeline extensions,
each with a DuckDB oracle twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..tokenizer import TEXT_STOPWORDS, duckdb_toks_cte, sql_str_list
from ..rows import rows_df

LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "is", "and", "of"),
    "es": ("el", "la", "de", "que", "los"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "et", "les", "des"),
    "zh": ("de", "shi", "le", "zai", "he"),
}


def _toks(docs: DataFrame) -> DataFrame:
    from ..tokenizer import tokens_exploded
    return tokens_exploded(docs)


# --------------------------------------------------------------- langid

def langid(docs: DataFrame) -> DataFrame:
    """(doc_id, pred_lang, hits): argmax of marker-token hits per lang,
    tie-break lang ASC; zero hits -> 'unknown'."""
    spark = docs.sparkSession
    markers = rows_df(
        spark, [(lang, t) for lang, ts in LANG_MARKERS.items() for t in ts],
        "mlang string, term string")
    toks = _toks(docs)
    hits = (toks.join(F.broadcast(markers), "term")
            .groupBy("doc_id", "mlang").agg(F.count("*").alias("hits")))
    w = Window.partitionBy("doc_id").orderBy(F.desc("hits"), F.asc("mlang"))
    best = (hits.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("doc_id", F.col("mlang").alias("pred_lang"), "hits"))
    return (docs.select("doc_id").join(best, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("pred_lang", F.lit("unknown")).alias("pred_lang"),
                    F.coalesce("hits", F.lit(0)).cast("long").alias("hits")))


def langid_sql() -> str:
    vals = ", ".join(f"('{lang}', '{t}')"
                     for lang, ts in LANG_MARKERS.items() for t in ts)
    return f"""WITH {duckdb_toks_cte()},
markers(mlang, term) AS (VALUES {vals}),
hits AS (
  SELECT doc_id, mlang, count(*)::BIGINT AS hits
  FROM toks JOIN markers USING (term) GROUP BY doc_id, mlang),
best AS (
  SELECT doc_id, mlang, hits,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY hits DESC, mlang ASC) AS rn
  FROM hits)
SELECT d.doc_id,
       coalesce(b.mlang, 'unknown') AS pred_lang,
       coalesce(b.hits, 0)::BIGINT AS hits
FROM documents d LEFT JOIN (SELECT * FROM best WHERE rn = 1) b USING (doc_id)"""


# -------------------------------------------------------------- quality

def quality_score(docs: DataFrame,
                  stoplist: tuple[str, ...] = TEXT_STOPWORDS) -> DataFrame:
    """(doc_id, n_tokens, distinct_ratio, stop_ratio, mean_len, quality).
    quality = 0.4*(1 - stop_ratio) + 0.3*min(n_tokens/100, 1)
              + 0.3*distinct_ratio, rounded 6."""
    toks = _toks(docs)
    agg = toks.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.countDistinct("term").alias("n_distinct"),
        F.sum(F.col("term").isin(*stoplist).cast("int")).alias("n_stop"),
        F.avg(F.length("term")).alias("mean_len_raw"))
    return agg.select(
        "doc_id", "n_tokens",
        F.round(F.col("n_distinct") / F.col("n_tokens"), 6).alias("distinct_ratio"),
        F.round(F.col("n_stop") / F.col("n_tokens"), 6).alias("stop_ratio"),
        F.round("mean_len_raw", 6).alias("mean_len"),
        F.round(0.4 * (1.0 - F.col("n_stop") / F.col("n_tokens"))
                + 0.3 * F.least(F.col("n_tokens") / 100.0, F.lit(1.0))
                + 0.3 * F.col("n_distinct") / F.col("n_tokens"), 6).alias("quality"))


def quality_score_sql(stoplist: tuple[str, ...] = TEXT_STOPWORDS) -> str:
    return f"""WITH {duckdb_toks_cte()},
agg AS (
  SELECT doc_id, count(*)::BIGINT AS n_tokens,
         count(DISTINCT term)::BIGINT AS n_distinct,
         sum(CASE WHEN term IN {sql_str_list(stoplist)} THEN 1 ELSE 0 END)::BIGINT AS n_stop,
         avg(length(term)) AS mean_len_raw
  FROM toks GROUP BY doc_id)
SELECT doc_id, n_tokens,
       round(n_distinct / n_tokens, 6) AS distinct_ratio,
       round(n_stop / n_tokens, 6) AS stop_ratio,
       round(mean_len_raw, 6) AS mean_len,
       round(0.4 * (1.0 - n_stop / n_tokens)
             + 0.3 * least(n_tokens / 100.0, 1.0)
             + 0.3 * n_distinct / n_tokens, 6) AS quality
FROM agg"""


# ---------------------------------------------------------- token count

def token_count_stats(docs: DataFrame) -> DataFrame:
    """(doc_id, ws_tokens, engine_tokens, n_chars): whitespace-split
    count vs code-aware tokenizer count (the BPE-ish regex proxy)."""
    from ..tokenizer import tokens_array
    return docs.select(
        "doc_id",
        F.size(F.split(F.trim("text"), r"\s+")).cast("long").alias("ws_tokens"),
        F.size(tokens_array("text")).cast("long").alias("engine_tokens"),
        F.length("text").cast("long").alias("n_chars"))


def token_count_stats_sql() -> str:
    from ..tokenizer import duckdb_tokens_expr
    return f"""SELECT doc_id,
       len(string_split_regex(trim(text), '\\s+'))::BIGINT AS ws_tokens,
       len({duckdb_tokens_expr('text')})::BIGINT AS engine_tokens,
       length(text)::BIGINT AS n_chars
FROM documents"""


# ---------------------------------------------------------- fingerprint

def fingerprint(docs: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, fp): document fingerprint = min md5 over token
    3-shingles (1-hash winnowing analog); falls back to md5 of the
    whole token stream for docs shorter than n tokens."""
    from ..tokenizer import tokens_array
    toks = _toks(docs)
    w = Window.partitionBy("doc_id").orderBy("pos")
    sh = (toks.withColumn("t1", F.lead("term", 1).over(w))
          .withColumn("t2", F.lead("term", 2).over(w)))
    have = (sh.filter(F.col("t2").isNotNull())
            .select("doc_id", F.md5(F.concat_ws(" ", "term", "t1", "t2")).alias("h"))
            .groupBy("doc_id").agg(F.min("h").alias("fp")))
    fallback = docs.select(
        "doc_id", F.md5(F.array_join(tokens_array("text"), " ")).alias("fb"))
    return (fallback.join(have, "doc_id", "left")
            .select("doc_id", F.coalesce("fp", "fb").alias("fp")))


def fingerprint_sql(n: int = 3) -> str:
    from ..tokenizer import duckdb_tokens_expr
    return f"""WITH {duckdb_toks_cte()},
sh AS (
  SELECT doc_id,
         term || ' ' || lead(term, 1) OVER (PARTITION BY doc_id ORDER BY pos)
              || ' ' || lead(term, 2) OVER (PARTITION BY doc_id ORDER BY pos)
           AS shingle,
         lead(term, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS t2
  FROM toks),
have AS (
  SELECT doc_id, min(md5(shingle)) AS fp FROM sh
  WHERE t2 IS NOT NULL GROUP BY doc_id)
SELECT d.doc_id,
       coalesce(h.fp, md5(array_to_string({duckdb_tokens_expr('d.text')}, ' '))) AS fp
FROM documents d LEFT JOIN have h USING (doc_id)"""
