"""pke-parity keyphrase operators, re-expressed as Spark DataFrame plans
with DuckDB oracle twins.

- candidate_runs: maximal runs of non-stopword tokens (the run-id trick)
  = longest_sequence_selection (pke/base.py:274-314, C2/C4) + grouping
  (add_candidate, pke/base.py:208-235, C5) + the candidate_filtering
  predicate chain (pke/base.py:383-451, F1).
- firstphrases: weight = -min(offset) ranking (firstphrases.py:55-64).
- tfidf_topk: unigram TF x IDF with pke's +1 smoothing
  idf = log2((N+1)/(df+1)) (tfidf.py:63-90; N+1/df+1 per tfidf.py:78,84).
- kpminer: lasf/cutoff filtering (kpminer.py:60-91) + boosted weighting
  (kpminer.py:93-151): unigram w = tf*log2(N'/(1+df)), multiword
  w = tf*B*log2(N'/1) with B = min(N_d/(P_d*alpha), sigma), N' = N+1.
- bigrams: n=2 slice of ngram_selection (pke/base.py:237-264, C1) via
  window lead() (no self-join shuffle).

Deterministic ordering everywhere: score DESC then candidate/term ASC
(SURVEY §2.7 W4 — Spark sort is not stable, ties must be explicit).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ._cache import cache_latest

from ..tokenizer import (TEXT_STOPWORDS, duckdb_toks_cte, sql_str_list,
                         tokens_exploded)

KP_LASF = 2       # pke default 3, scaled to the short testdata docs
KP_CUTOFF = 40    # pke default 400, scaled likewise
KP_ALPHA = 2.3
KP_SIGMA = 3.0
MAX_WORDS = 5     # F1: > 5 words -> drop
MIN_CHARS = 3     # F1: total chars < 3 -> drop
MIN_WORD_LEN = 2  # F1: any word < 2 chars -> drop


# ---------------------------------------------------------------- Spark

_CAND_SCHEMA = ("doc_id long, candidate string, tf long, "
                "first_offset long, n_words long")


def _runs_row_fn(stoplist: tuple[str, ...]):
    """Per-doc core of candidate_runs: maximal non-stopword runs over
    the document's own token list, grouped by phrase with
    (tf, min start pos, n_words), F1-filtered. Positions are 1-based
    (the tokens_exploded convention)."""
    stop = frozenset(stoplist)

    def fn(did: int, terms: list) -> list:
        out: dict = {}
        i, length = 0, len(terms)
        while i < length:
            if terms[i] in stop:
                i += 1
                continue
            j = i
            while j < length and terms[j] not in stop:
                j += 1
            words = terms[i:j]
            n_words = j - i
            # F1 depends only on the phrase string, so filtering before
            # the group-by equals the DataFrame plan's filter after it
            if (n_words <= MAX_WORDS
                    and sum(map(len, words)) >= MIN_CHARS
                    and min(map(len, words)) >= MIN_WORD_LEN):
                cand = " ".join(words)
                e = out.get(cand)
                if e is None:
                    # i ascends, so the first sighting IS min(start_pos)
                    out[cand] = [1, i + 1, n_words]
                else:
                    e[0] += 1
            i = j
        return [(did, c, tf, fo, nw) for c, (tf, fo, nw) in out.items()]

    return fn


def _ngram_row_fn(n: int, stoplist: tuple[str, ...]):
    """Per-doc core of ngram_candidates: every 1..n-gram whose words
    all pass the stoplist/length gates, grouped by phrase."""
    stop = frozenset(stoplist)

    def fn(did: int, terms: list) -> list:
        length = len(terms)
        ok = [len(t) >= MIN_WORD_LEN and t not in stop for t in terms]
        lens = [len(t) for t in terms]
        out: dict = {}
        for i in range(length):
            if not ok[i]:
                continue
            chars = 0
            for size in range(1, n + 1):
                j = i + size - 1
                if j >= length or not ok[j]:
                    # a failing word poisons every longer gram from i
                    break
                chars += lens[j]
                if chars < MIN_CHARS:
                    continue
                cand = " ".join(terms[i:j + 1])
                e = out.get(cand)
                if e is None:
                    out[cand] = [1, i + 1, size]
                else:
                    e[0] += 1
        return [(did, c, tf, fo, nw) for c, (tf, fo, nw) in out.items()]

    return fn


def candidate_runs(docs: DataFrame,
                   stoplist: tuple[str, ...] = TEXT_STOPWORDS,
                   toks: DataFrame | None = None) -> DataFrame:
    """(doc_id, candidate, tf, first_offset, n_words) — maximal
    non-stopword runs, grouped by phrase, filtered per F1.

    Runs are a PER-DOCUMENT fact, so they are built in one per-doc
    Python pass (ops/perdoc.py, guide §2.3/§4): tokenize + run split +
    group inside the map — no token-row shuffle, no window, no
    token-explode exchange. ``toks`` is accepted for API compatibility
    but unused: the pass reads the doc rows directly.
    """
    del toks  # per-doc pass tokenizes inline (lockstep tokenizer)
    from .perdoc import per_doc_rows
    return per_doc_rows(docs, _runs_row_fn(stoplist), _CAND_SCHEMA)


def ngram_candidates(docs: DataFrame, n: int = 3,
                     stoplist: tuple[str, ...] = TEXT_STOPWORDS,
                     toks: DataFrame | None = None) -> DataFrame:
    """(doc_id, candidate, tf, first_offset, n_words) — all 1..n-grams
    per doc (ngram_selection, pke/base.py:237-264) filtered per F1:
    no stopword member, every word >= 2 chars, >= 3 total chars.

    Like candidate_runs, a per-doc pass: the previous plan exploded
    every token row n ways through an Exchange and ran an
    arrays_overlap per gram (measured 2.2 s warm at sf0.1 vs 0.5 s for
    this form); grams of a doc never cross documents, so none of that
    movement was needed."""
    del toks  # per-doc pass tokenizes inline (lockstep tokenizer)
    from .perdoc import per_doc_rows
    return per_doc_rows(docs, _ngram_row_fn(n, stoplist), _CAND_SCHEMA)


def _ngrams_cte(n: int = 3, stoplist: tuple[str, ...] = TEXT_STOPWORDS) -> str:
    selects = []
    for size in range(1, n + 1):
        parts = ["term"] + [
            f"lead(term, {j}) OVER (PARTITION BY doc_id ORDER BY pos)"
            for j in range(1, size)]
        cand = " || ' ' || ".join(parts)
        selects.append(
            f"SELECT doc_id, pos, {cand} AS candidate, {size}::BIGINT AS n_words "
            "FROM toks")
    union = " UNION ALL ".join(f"({s})" for s in selects)
    return f"""allg AS ({union}),
kept AS (
  SELECT doc_id, pos, candidate, n_words
  FROM allg
  WHERE candidate IS NOT NULL
    AND len(list_filter(string_split(candidate, ' '),
            w -> w IN {sql_str_list(stoplist)})) = 0
    AND len(list_filter(string_split(candidate, ' '),
            w -> length(w) < {MIN_WORD_LEN})) = 0
    AND length(replace(candidate, ' ', '')) >= {MIN_CHARS}),
ngrams AS (
  SELECT doc_id, candidate, count(*)::BIGINT AS tf,
         min(pos)::BIGINT AS first_offset, max(n_words)::BIGINT AS n_words
  FROM kept GROUP BY doc_id, candidate)"""


def firstphrases(docs: DataFrame, k: int = 5,
                 stoplist: tuple[str, ...] = TEXT_STOPWORDS) -> DataFrame:
    """Per-doc top-k candidates by first occurrence (FirstPhrases)."""
    c = candidate_runs(docs, stoplist)
    w = Window.partitionBy("doc_id").orderBy(
        F.asc("first_offset"), F.asc("candidate"))
    return (c.withColumn("rank", F.row_number().over(w).cast("int"))
            .filter(F.col("rank") <= k)
            .select("doc_id", "rank", "candidate", "first_offset"))


def tfidf_topk(docs: DataFrame, k: int = 3) -> DataFrame:
    """Per-doc top-k unigram terms by TF x IDF (pke +1 smoothing).

    N comes from a broadcast 1-row aggregate inside the plan — no
    separate ``docs.count()`` driver job per query (A2: in index-backed
    deployments it reads from the manifest)."""
    toks = tokens_exploded(docs)
    tc = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    stats = tc.groupBy("term").agg(F.count("*").alias("df"))
    nrow = docs.agg(F.count("*").cast("double").alias("n"))
    weight = F.round(
        F.col("tf") * F.log2((F.col("n") + 1.0) / (F.col("df") + 1.0)), 6)
    w = Window.partitionBy("doc_id").orderBy(F.desc("weight"), F.asc("term"))
    return (tc.join(stats, "term")
            .crossJoin(F.broadcast(nrow))
            .withColumn("weight", weight)
            .withColumn("rank", F.row_number().over(w).cast("int"))
            .filter(F.col("rank") <= k)
            .select("doc_id", "rank", "term", "tf", "weight"))


def kpminer(docs: DataFrame, k: int = 5,
            stoplist: tuple[str, ...] = TEXT_STOPWORDS,
            lasf: int = KP_LASF, cutoff: int = KP_CUTOFF,
            alpha: float = KP_ALPHA, sigma: float = KP_SIGMA) -> DataFrame:
    """Per-doc top-k KPMiner-weighted candidates (see module docstring).
    Candidates are 1..3-grams (pke uses ngram_selection(n=5),
    kpminer.py:73) filtered by lasf/cutoff."""
    nrow = docs.agg(F.count("*").cast("double").alias("n"))
    c = (ngram_candidates(docs, 3, stoplist)
         .filter((F.col("first_offset") <= cutoff) & (F.col("tf") >= lasf)))
    # per-doc scalars N_d, P_d (A4) as windows over the candidate table
    # — a groupBy+join-back would re-evaluate the whole candidate DAG
    wd = Window.partitionBy("doc_id")
    c = (c.withColumn("n_d", F.sum("tf").over(wd))
         .withColumn("p_d", F.greatest(
             F.lit(1), F.sum(F.when(F.col("n_words") > 1, F.col("tf"))
                             .otherwise(F.lit(0))).over(wd)))
         # materialize once (lazy): both uni_df and the weighted join
         # consume this table — without the checkpoint the whole
         # ngram-candidate DAG (scan + window + explode) re-runs per
         # consumer
         .localCheckpoint(eager=False))
    # df stats over single-word candidates only (kpminer df lookup is
    # unigram-only; multiword candidate_df = 1)
    uni_df = (c.filter(F.col("n_words") == 1)
              .groupBy("candidate").agg(F.count("*").alias("df")))
    boost = F.least(F.col("n_d") / (F.col("p_d") * alpha), F.lit(sigma))
    n1 = F.col("n") + 1.0
    idf = F.when(F.col("n_words") == 1,
                 F.log2(n1 / (1.0 + F.coalesce(F.col("df"), F.lit(0))))) \
           .otherwise(F.log2(n1))
    weight = F.round(
        F.when(F.col("n_words") == 1, F.col("tf") * idf)
        .otherwise(F.col("tf") * boost * idf), 6)
    w = Window.partitionBy("doc_id").orderBy(F.desc("weight"), F.asc("candidate"))
    return (c.join(uni_df, "candidate", "left")
            .crossJoin(F.broadcast(nrow))
            .withColumn("weight", weight)
            .withColumn("rank", F.row_number().over(w).cast("int"))
            .filter(F.col("rank") <= k)
            .select("doc_id", "rank", "candidate", "tf", "weight"))


def redundancy_topk(ranked: DataFrame, k: int = 5,
                    weight_col: str = "weight") -> DataFrame:
    """pke ``get_n_best(redundancy_removal=True)`` (base.py:129-206):
    per doc, walk candidates in (weight DESC, candidate ASC) order and
    greedily drop any whose token sequence is a contiguous subsequence
    of an already-SELECTED candidate; stop at k. Sequential greedy per
    doc -> applyInPandas; the corpus stays parallel (SURVEY §7.3)."""
    import pandas as pd

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([weight_col, "candidate"],
                              ascending=[False, True], kind="mergesort")
        kept: list[list[str]] = []
        rows = []
        for r in pdf.itertuples(index=False):
            toks = r.candidate.split(" ")
            n = len(toks)
            redundant = any(
                toks == prev[i:i + n]
                for prev in kept for i in range(len(prev) - n + 1))
            if redundant:
                continue
            kept.append(toks)
            rows.append((int(r.doc_id), len(kept), r.candidate,
                         float(getattr(r, weight_col))))
            if len(kept) >= k:
                break
        return pd.DataFrame(rows, columns=["doc_id", "rank", "candidate",
                                           "weight"])

    return ranked.select("doc_id", "candidate", weight_col) \
        .groupBy("doc_id").applyInPandas(
            fn, "doc_id long, rank int, candidate string, weight double")


# most recent kpminer_dedup candidate pool; kept cached for that lazy
# result's lifetime, unpersisted on the next call (one cached copy max)
_LAST_POOL: list = []


def kpminer_dedup(docs: DataFrame, k: int = 5,
                  stoplist: tuple[str, ...] = TEXT_STOPWORDS) -> DataFrame:
    """KPMiner ranking with greedy redundancy removal (T1).

    The 50-per-doc candidate pool is cached: without materialization
    Spark re-evaluates the whole KPMiner DAG on the far side of the
    greedy pass's exchange (interleaved A/B: cache 4.3 s vs plain
    14.6 s vs localCheckpoint 19.9 s at sf0.1). The pool is tiny
    (<= 50 rows/doc)."""
    full = cache_latest(kpminer(docs, k=50, stoplist=stoplist), _LAST_POOL)
    return redundancy_topk(full, k)


def bigrams(docs: DataFrame) -> DataFrame:
    """(doc_id, bigram, tf) via lead() — one shuffle, no self-join."""
    toks = tokens_exploded(docs)
    w = Window.partitionBy("doc_id").orderBy("pos")
    return (toks.withColumn("nxt", F.lead("term").over(w))
            .filter(F.col("nxt").isNotNull())
            .select("doc_id",
                    F.concat_ws(" ", "term", "nxt").alias("bigram"))
            .groupBy("doc_id", "bigram").agg(F.count("*").alias("tf")))


# --------------------------------------------------------------- DuckDB

def _cands_cte(stoplist: tuple[str, ...] = TEXT_STOPWORDS) -> str:
    return f"""{duckdb_toks_cte()},
flagged AS (
  SELECT doc_id, pos, term,
         CASE WHEN term IN {sql_str_list(stoplist)} THEN 0 ELSE 1 END AS flag
  FROM toks),
runs AS (
  SELECT *, sum(1 - flag) OVER (PARTITION BY doc_id ORDER BY pos
           ROWS UNBOUNDED PRECEDING) AS run_id
  FROM flagged),
phrases AS (
  SELECT doc_id, run_id, string_agg(term, ' ' ORDER BY pos) AS candidate,
         min(pos)::BIGINT AS start_pos, count(*)::BIGINT AS n_words
  FROM runs WHERE flag = 1 GROUP BY doc_id, run_id),
cands AS (
  SELECT doc_id, candidate, count(*)::BIGINT AS tf,
         min(start_pos)::BIGINT AS first_offset,
         max(n_words)::BIGINT AS n_words
  FROM phrases GROUP BY doc_id, candidate
  HAVING max(n_words) <= {MAX_WORDS}
     AND length(replace(candidate, ' ', '')) >= {MIN_CHARS}
     AND len(list_filter(string_split(candidate, ' '),
             w -> length(w) < {MIN_WORD_LEN})) = 0)"""


def ngram_candidates_sql(n: int = 3) -> str:
    return f"""WITH {duckdb_toks_cte()},
{_ngrams_cte(n)}
SELECT doc_id, candidate, tf, first_offset, n_words FROM ngrams"""


def candidate_runs_sql() -> str:
    return f"""WITH {_cands_cte()}
SELECT doc_id, candidate, tf, first_offset, n_words FROM cands"""


def firstphrases_sql(k: int = 5) -> str:
    return f"""WITH {_cands_cte()},
ranked AS (
  SELECT doc_id, candidate, first_offset,
         CAST(row_number() OVER (PARTITION BY doc_id
              ORDER BY first_offset ASC, candidate ASC) AS INTEGER) AS rank
  FROM cands)
SELECT doc_id, rank, candidate, first_offset FROM ranked WHERE rank <= {k}"""


def tfidf_topk_sql(k: int = 3) -> str:
    return f"""WITH {duckdb_toks_cte()},
tc AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2),
stats AS (SELECT term, count(*)::BIGINT AS df FROM tc GROUP BY 1),
n AS (SELECT count(*)::BIGINT AS n FROM documents),
ranked AS (
  SELECT tc.doc_id, tc.term, tc.tf,
         round(tc.tf * log2((n.n + 1.0) / (s.df + 1.0)), 6) AS weight,
         CAST(row_number() OVER (PARTITION BY tc.doc_id
              ORDER BY round(tc.tf * log2((n.n + 1.0) / (s.df + 1.0)), 6) DESC,
                       tc.term ASC) AS INTEGER) AS rank
  FROM tc JOIN stats s USING (term) CROSS JOIN n)
SELECT doc_id, rank, term, tf, weight FROM ranked WHERE rank <= {k}"""


def kpminer_sql(k: int = 5, lasf: int = KP_LASF, cutoff: int = KP_CUTOFF,
                alpha: float = KP_ALPHA, sigma: float = KP_SIGMA) -> str:
    return f"""WITH {duckdb_toks_cte()},
{_ngrams_cte()},
filtered AS (SELECT * FROM ngrams WHERE first_offset <= {cutoff} AND tf >= {lasf}),
scal AS (
  SELECT doc_id, sum(tf)::BIGINT AS n_d,
         greatest(1, sum(CASE WHEN n_words > 1 THEN tf ELSE 0 END))::BIGINT AS p_d
  FROM filtered GROUP BY doc_id),
uni_df AS (
  SELECT candidate, count(*)::BIGINT AS df FROM filtered
  WHERE n_words = 1 GROUP BY candidate),
n AS (SELECT count(*)::BIGINT AS n FROM documents),
weighted AS (
  SELECT c.doc_id, c.candidate, c.tf,
         round(CASE WHEN c.n_words = 1
               THEN c.tf * log2((n.n + 1.0) / (1.0 + coalesce(u.df, 0)))
               ELSE c.tf * least(s.n_d / (s.p_d * {alpha}), {sigma})
                    * log2(n.n + 1.0) END, 6) AS weight
  FROM filtered c
  JOIN scal s USING (doc_id)
  LEFT JOIN uni_df u ON c.candidate = u.candidate
  CROSS JOIN n),
ranked AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
            ORDER BY weight DESC, candidate ASC) AS INTEGER) AS rank
  FROM weighted)
SELECT doc_id, rank, candidate, tf, weight FROM ranked WHERE rank <= {k}"""


def bigrams_sql() -> str:
    return f"""WITH {duckdb_toks_cte()},
pairs AS (
  SELECT doc_id,
         term || ' ' || lead(term) OVER (PARTITION BY doc_id ORDER BY pos) AS bigram
  FROM toks)
SELECT doc_id, bigram, count(*)::BIGINT AS tf
FROM pairs WHERE bigram IS NOT NULL GROUP BY doc_id, bigram"""
