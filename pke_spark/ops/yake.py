"""YAKE-lite: the SQL-expressible core of the reference's YAKE scorer
(pke/unsupervised/statistical/yake.py, SURVEY §2.6 A5-A8).

Kept (adapted to the code-tokenizer world — 1-based token positions, no
sentence boundaries, lowercase-only tokens):
- POSITION  (yake.py:240-258): ln(ln(3 + median(position))) — earlier
  words matter more (median over token positions instead of sentence
  ids).
- FREQUENCY (yake.py:260-263): tf / (mean_tf + stddev_tf) over the
  doc's words.
- SPREAD (stand-in for DIFFERENT, yake.py:265,296: sentence frequency /
  #sentences): (max_pos - min_pos + 1) / doc_len — how much of the
  document the word covers.

Dropped, with reasons: CASING (tokenizer lowercases, the feature is
constant), RELATEDNESS (block context windows, W1 — not reasonably
SQL-expressible; would live in an applyInPandas like the graph models).

word_weight = position / (frequency + spread)   (lower = better, as in
YAKE); per-doc top-k ascending, tie-break term ASC. Rounded to 6
decimals on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..tokenizer import duckdb_toks_cte, tokens_exploded


def yake_lite(docs: DataFrame, k: int = 5) -> DataFrame:
    toks = tokens_exploded(docs)
    per_word = toks.groupBy("doc_id", "term").agg(
        F.count("*").alias("tf"),
        F.median("pos").alias("med_pos"),
        F.min("pos").alias("min_pos"),
        F.max("pos").alias("max_pos"))
    per_doc = per_word.groupBy("doc_id").agg(
        F.avg("tf").alias("mean_tf"),
        F.coalesce(F.stddev("tf"), F.lit(0.0)).alias("std_tf"),
        F.sum("tf").alias("doc_len"))
    position = F.log(F.log(F.lit(3.0) + F.col("med_pos")))
    frequency = F.col("tf") / (F.col("mean_tf") + F.col("std_tf"))
    spread = (F.col("max_pos") - F.col("min_pos") + 1.0) / F.col("doc_len")
    weight = F.round(position / (frequency + spread), 6)
    w = Window.partitionBy("doc_id").orderBy(F.asc("weight"), F.asc("term"))
    return (per_word.join(per_doc, "doc_id")
            .withColumn("weight", weight)
            .withColumn("rank", F.row_number().over(w).cast("int"))
            .filter(F.col("rank") <= k)
            .select("doc_id", "rank", "term", "tf", "weight"))


def yake_lite_sql(k: int = 5) -> str:
    return f"""WITH {duckdb_toks_cte()},
per_word AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf,
         median(pos) AS med_pos, min(pos) AS min_pos, max(pos) AS max_pos
  FROM toks GROUP BY doc_id, term),
per_doc AS (
  SELECT doc_id, avg(tf) AS mean_tf,
         coalesce(stddev(tf), 0.0) AS std_tf,
         sum(tf)::BIGINT AS doc_len
  FROM per_word GROUP BY doc_id),
weighted AS (
  SELECT w.doc_id, w.term, w.tf,
         round( ln(ln(3.0 + w.med_pos))
                / ( w.tf / (d.mean_tf + d.std_tf)
                    + (w.max_pos - w.min_pos + 1.0) / d.doc_len ), 6) AS weight
  FROM per_word w JOIN per_doc d USING (doc_id)),
ranked AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
            ORDER BY weight ASC, term ASC) AS INTEGER) AS rank
  FROM weighted)
SELECT doc_id, rank, term, tf, weight FROM ranked WHERE rank <= {k}"""
