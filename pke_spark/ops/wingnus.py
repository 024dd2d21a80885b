"""WINGNUS supervised model (M2,
pke/supervised/feature_based/wingnus.py:83-259), Spark-first.

Candidates come from the grammar path (WINGNUS uses
``grammar_selection`` with the simple NP grammar, wingnus.py:64-81 ->
ops/grammar.py). Features per candidate:

- F1  tf * idf with pke's +1/N+1 smoothing (wingnus.py:106-131)
- F2  tf (:133-134)
- F3  substring term frequency (:136-163, J5): occurrences of each
  strict sub-ngram (length 1-3, no stopword member) that ALSO exists as
  a candidate, counting only offsets NOT covered by an occurrence of
  the full candidate (offset_2 <= offset_1 <= offset_2 + n_words). This
  is a self-join on generated substrings + higher-order-function
  containment — no UDF, no per-doc loop.
- F4  first offset / maximum offset (:165-166; our offsets are 1-based)
- F5  last offset / maximum offset (:168-169)
- F6  length in words (:171-172)

The reference's default ``features_set=[1, 4, 6]`` is what
``wingnus_predict`` trains on; F7-F19 are section/typeface flags from
CoreNLP sentence meta, which the corpus does not carry (S8 non-goal —
a tagged corpus with a ``section`` column would join in the same way).

``wingnus_features`` is fully SQL-expressible -> oracle-gated;
``wingnus_predict`` (Spark-ML NB) is rows-only like kea_predict.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ._cache import cache_latest
from ..tokenizer import (TEXT_STOPWORDS, duckdb_toks_cte, sql_str_list,
                         tokens_exploded)
from .grammar import (grammar_candidates_with_offsets, synthetic_tags,
                      _tagged_cte)

SUB_MAX = 3  # substrings of length 1..3 (wingnus.py:139)

# most recent predictor feature table (see wingnus_predict)
_LAST_VEC: list = []


# ---------------------------------------------------------------- Spark

def wingnus_features(docs: DataFrame,
                     stoplist: tuple[str, ...] = TEXT_STOPWORDS
                     ) -> DataFrame:
    """(doc_id, candidate, f1_tfidf, f2_tf, f3_substring_tf,
    f4_rel_first, f5_rel_last, f6_n_words)."""
    c = grammar_candidates_with_offsets(synthetic_tags(docs, stoplist))
    nrow = docs.agg(F.count("*").cast("double").alias("n"))
    dl = (tokens_exploded(docs).groupBy("doc_id")
          .agg(F.count("*").cast("double").alias("max_offset")))
    cdf = c.groupBy("candidate").agg(F.count("*").alias("df"))

    # ---- F3: generate strict sub-ngrams as (i, j) slice bounds ----
    words = F.split("candidate", " ")
    stop_arr = F.array(*[F.lit(s) for s in stoplist])
    pairs = F.flatten(F.transform(
        F.sequence(F.lit(1), F.col("n_words").cast("int")),
        lambda i: F.transform(
            F.sequence(i, F.least(F.col("n_words").cast("int"),
                                  i + F.lit(SUB_MAX - 1))),
            lambda j: F.struct(i.alias("i"), j.alias("j")))))
    subs = (c.select("doc_id", "candidate", "n_words", "offsets",
                     words.alias("words"), F.explode(pairs).alias("p"))
            .withColumn("sub_words",
                        F.slice("words", F.col("p.i"),
                                F.col("p.j") - F.col("p.i") + 1))
            .filter(F.size("sub_words") < F.col("n_words"))
            .filter(~F.arrays_overlap("sub_words", stop_arr))
            .select("doc_id", "candidate", "n_words",
                    F.col("offsets").alias("cand_offsets"),
                    F.array_join("sub_words", " ").alias("sub_string")))
    sub_occ = c.select("doc_id", F.col("candidate").alias("sub_string"),
                       F.col("offsets").alias("sub_offsets"))
    nw = F.col("n_words")
    not_included = F.size(F.filter(
        "sub_offsets",
        lambda o1: ~F.exists("cand_offsets",
                             lambda o2: (o2 <= o1) & (o1 <= o2 + nw))))
    f3 = (subs.join(sub_occ, ["doc_id", "sub_string"])
          .select("doc_id", "candidate", not_included.alias("cnt"))
          .groupBy("doc_id", "candidate")
          .agg(F.sum("cnt").alias("f3")))

    idf = F.log2((F.col("n") + 1.0) / (F.col("df") + 1.0))
    return (c.join(cdf, "candidate")
            .join(dl, "doc_id")
            .join(f3, ["doc_id", "candidate"], "left")
            .crossJoin(F.broadcast(nrow))
            .select(
                "doc_id", "candidate",
                F.round(F.col("tf") * idf, 6).alias("f1_tfidf"),
                F.col("tf").alias("f2_tf"),
                F.coalesce(F.col("f3"), F.lit(0)).cast("long")
                .alias("f3_substring_tf"),
                F.round(F.col("first_offset") / F.col("max_offset"), 6)
                .alias("f4_rel_first"),
                F.round(F.col("last_offset") / F.col("max_offset"), 6)
                .alias("f5_rel_last"),
                F.col("n_words").alias("f6_n_words")))


def wingnus_predict(docs: DataFrame, k: int = 5,
                    stoplist: tuple[str, ...] = TEXT_STOPWORDS) -> DataFrame:
    """NB on the default feature set [F1, F4, F6] (wingnus.py:98),
    weak-gold labels, per-doc top-k (rows-only, like kea_predict)."""
    from pyspark.ml.classification import NaiveBayes
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.functions import vector_to_array

    from .supervised import weak_gold
    feats = wingnus_features(docs, stoplist)
    gold = weak_gold(docs)
    labeled = (feats.join(gold, (feats.doc_id == gold.doc_id)
                          & (feats.candidate == gold.gold), "left")
               .select(feats.doc_id, feats.candidate,
                       "f1_tfidf", "f4_rel_first", "f6_n_words",
                       F.when(gold.gold.isNotNull(), 1.0).otherwise(0.0)
                       .alias("label")))
    asm = VectorAssembler(
        inputCols=["f1_tfidf", "f4_rel_first", "f6_n_words"],
        outputCol="features")
    # cached across fit (an action) + the returned lazy ranking; one
    # cached copy, previous unpersisted per call (shared helper)
    vec = cache_latest(asm.transform(labeled), _LAST_VEC)
    model = NaiveBayes(smoothing=1.0, modelType="multinomial",
                       featuresCol="features", labelCol="label").fit(vec)
    pred = model.transform(vec)
    p1 = F.round(F.coalesce(F.get(vector_to_array(pred["probability"]),
                                  F.lit(1)), F.lit(0.0)), 6) \
        .alias("p_keyphrase")
    w = Window.partitionBy("doc_id").orderBy(F.desc("p_keyphrase"),
                                             F.asc("candidate"))
    return (pred.select("doc_id", "candidate", p1)
            .withColumn("rank", F.row_number().over(w).cast("int"))
            .filter(F.col("rank") <= k)
            .select("doc_id", "rank", "candidate", "p_keyphrase"))


# --------------------------------------------------------------- DuckDB

def wingnus_features_sql(stoplist: tuple[str, ...] = TEXT_STOPWORDS) -> str:
    node = sql_str_list(("NOUN", "PROPN", "ADJ"))
    head = sql_str_list(("NOUN", "PROPN"))
    return f"""WITH {_tagged_cte(stoplist)},
flagged AS (
  SELECT *, CASE WHEN tag IN {node} THEN 1 ELSE 0 END AS flag FROM tagged),
runs AS (
  SELECT *, sum(1 - flag) OVER (PARTITION BY doc_id ORDER BY pos
           ROWS UNBOUNDED PRECEDING) AS run_id
  FROM flagged),
chunk AS (
  SELECT *, max(CASE WHEN tag IN {head} THEN pos END)
            OVER (PARTITION BY doc_id, run_id) AS noun_end
  FROM runs WHERE flag = 1),
phrases AS (
  SELECT doc_id, run_id, string_agg(term, ' ' ORDER BY pos) AS candidate,
         min(pos)::BIGINT AS start_pos, count(*)::BIGINT AS n_words
  FROM chunk WHERE pos <= noun_end GROUP BY doc_id, run_id),
cands AS (
  SELECT doc_id, candidate, count(*)::BIGINT AS tf,
         min(start_pos)::BIGINT AS first_offset,
         max(start_pos)::BIGINT AS last_offset,
         max(n_words)::BIGINT AS n_words,
         list_sort(list(start_pos::BIGINT)) AS offsets
  FROM phrases GROUP BY doc_id, candidate),
cdf AS (SELECT candidate, count(*)::BIGINT AS df FROM cands GROUP BY 1),
dl AS (SELECT doc_id, count(*)::DOUBLE AS max_offset FROM toks GROUP BY 1),
nn AS (SELECT count(*)::BIGINT AS n FROM documents),
subs AS (
  SELECT c.doc_id, c.candidate, c.n_words, c.offsets AS cand_offsets,
         array_to_string((string_split(c.candidate, ' '))[a.i:b.j], ' ')
           AS sub_string,
         (string_split(c.candidate, ' '))[a.i:b.j] AS sub_words
  FROM cands c,
       LATERAL (SELECT unnest(generate_series(1, c.n_words::INT)) AS i) a,
       LATERAL (SELECT unnest(generate_series(a.i,
                least(c.n_words::INT, a.i + {SUB_MAX - 1}))) AS j) b
  WHERE b.j - a.i + 1 < c.n_words
    AND len(list_filter((string_split(c.candidate, ' '))[a.i:b.j],
            w -> w IN {sql_str_list(stoplist)})) = 0),
f3 AS (
  SELECT s.doc_id, s.candidate,
         sum(len(list_filter(o.offsets,
             o1 -> NOT list_bool_or(list_transform(s.cand_offsets,
                    o2 -> o2 <= o1 AND o1 <= o2 + s.n_words)))))::BIGINT AS f3
  FROM subs s
  JOIN cands o ON o.doc_id = s.doc_id AND o.candidate = s.sub_string
  GROUP BY s.doc_id, s.candidate)
SELECT c.doc_id, c.candidate,
       round(c.tf * log2((nn.n + 1.0) / (cd.df + 1.0)), 6) AS f1_tfidf,
       c.tf AS f2_tf,
       coalesce(f3.f3, 0)::BIGINT AS f3_substring_tf,
       round(c.first_offset / dl.max_offset, 6) AS f4_rel_first,
       round(c.last_offset / dl.max_offset, 6) AS f5_rel_last,
       c.n_words AS f6_n_words
FROM cands c
JOIN cdf cd USING (candidate)
JOIN dl USING (doc_id)
LEFT JOIN f3 ON f3.doc_id = c.doc_id AND f3.candidate = c.candidate
CROSS JOIN nn"""
