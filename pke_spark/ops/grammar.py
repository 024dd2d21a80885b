"""Grammar-based candidate selection over POS-tagged tokens (C6 + the
S3 pre-tagged ingestion path) — pke's ``grammar_selection``
(pke/base.py:316-367) re-expressed as window/aggregate Column ops.

Semantics of the reference's default grammar under nltk RegexpParser:

    NBAR: {<NOUN|PROPN|ADJ>*<NOUN|PROPN>}
    NP:   {<NBAR>}
          {<NBAR><ADP><NBAR>}

RegexpParser applies clauses in order; ``{<NBAR>}`` chunks every NBAR
into an NP first, so the ADP-bridge clause can never match afterwards
(pke quirk, verified against nltk's ChunkRule sequencing). The
EFFECTIVE rule is therefore: within each maximal run of
{NOUN, PROPN, ADJ} tags, the candidate is the prefix ending at the
run's LAST NOUN/PROPN (greedy leftmost-longest regex); runs with no
noun yield nothing.

Dataflow: run-id trick (C2) -> per-run max position of a NOUN/PROPN
(window) -> keep tokens up to it -> group to candidates. One shuffle on
doc_id; everything JVM-side.

The testdata has no POS column, so the query entry tags tokens with a
DETERMINISTIC synthetic tagger expressible identically in Spark and
DuckDB (stoplist -> ADP, else by token length). The operator itself
takes any (doc_id, pos, term, tag) stream — a real spaCy-tagged corpus
plugs straight in (S2/S3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..rows import rows_df
from ..tokenizer import (TEXT_STOPWORDS, duckdb_toks_cte, sql_str_list,
                         tokens_exploded)

NODE_TAGS = ("NOUN", "PROPN", "ADJ")
HEAD_TAGS = ("NOUN", "PROPN")


# ---------------------------------------------------------------- Spark

def synthetic_tags(docs: DataFrame,
                   stoplist: tuple[str, ...] = TEXT_STOPWORDS,
                   toks: DataFrame | None = None) -> DataFrame:
    """(doc_id, pos, term, tag) — deterministic fake POS tags for the
    untagged testdata: stopwords -> ADP, then by length mod 4
    (0 -> ADJ, 1 -> VERB, else NOUN). A stand-in tagger, NOT a
    linguistic claim; the oracle computes the identical function."""
    tag = (F.when(F.col("term").isin(*stoplist), F.lit("ADP"))
           .when(F.length("term") % 4 == 0, F.lit("ADJ"))
           .when(F.length("term") % 4 == 1, F.lit("VERB"))
           .otherwise(F.lit("NOUN")))
    if toks is None:
        toks = tokens_exploded(docs)
    return toks.withColumn("tag", tag)


def grammar_candidates_with_offsets(tagged: DataFrame) -> DataFrame:
    """(doc_id, candidate, tf, first_offset, last_offset, n_words,
    offsets array<long>) — like grammar_candidates_from_tagged but with
    the full occurrence-offset list (WINGNUS F3/F5 need v.offsets)."""
    w = Window.partitionBy("doc_id").orderBy("pos") \
        .rowsBetween(Window.unboundedPreceding, 0)
    runs = (tagged
            .withColumn("flag", F.col("tag").isin(*NODE_TAGS).cast("int"))
            .withColumn("run_id", F.sum(1 - F.col("flag")).over(w))
            .filter(F.col("flag") == 1))
    wr = Window.partitionBy("doc_id", "run_id")
    chunk = (runs
             .withColumn("noun_end",
                         F.max(F.when(F.col("tag").isin(*HEAD_TAGS),
                                      F.col("pos"))).over(wr))
             .filter(F.col("pos") <= F.col("noun_end")))
    phrases = chunk.groupBy("doc_id", "run_id").agg(
        F.array_join(
            F.transform(F.array_sort(F.collect_list(F.struct("pos", "term"))),
                        lambda s: s.term), " ").alias("candidate"),
        F.min("pos").cast("long").alias("start_pos"),
        F.count("*").alias("n_words"))
    return (phrases.groupBy("doc_id", "candidate").agg(
        F.count("*").alias("tf"),
        F.min("start_pos").alias("first_offset"),
        F.max("start_pos").alias("last_offset"),
        F.max("n_words").alias("n_words"),
        F.array_sort(F.collect_list("start_pos")).alias("offsets")))


def grammar_candidates_from_tagged(tagged: DataFrame) -> DataFrame:
    """(doc_id, candidate, tf, first_offset, n_words) from a
    (doc_id, pos, term, tag) stream per the effective NP rule."""
    return grammar_candidates_with_offsets(tagged).select(
        "doc_id", "candidate", "tf", "first_offset", "n_words")


def _grammar_synth_row_fn(stoplist: tuple[str, ...]):
    """Per-doc core of the synthetic-tag grammar chunker: tags are a
    pure function of the term (stopword -> ADP, else by length mod 4),
    so the whole NP rule runs inside the per-doc pass — maximal runs of
    node tags, prefix up to the run's last head, grouped by phrase.
    Emits (tf, first_offset, last_offset, n_words, offsets), the
    grammar_candidates_with_offsets schema."""
    stop = frozenset(stoplist)

    def fn(did: int, terms: list) -> list:
        length = len(terms)
        # node = ADJ|NOUN (len%4 != 1, non-stop); head = NOUN (len%4
        # not in (0, 1), non-stop) — PROPN never occurs synthetically
        node = [t not in stop and len(t) % 4 != 1 for t in terms]
        out: dict = {}
        i = 0
        while i < length:
            if not node[i]:
                i += 1
                continue
            j = i
            last_head = -1
            while j < length and node[j]:
                if len(terms[j]) % 4 > 1:
                    last_head = j
                j += 1
            if last_head >= 0:
                cand = " ".join(terms[i:last_head + 1])
                e = out.get(cand)
                if e is None:
                    out[cand] = [1, i + 1, i + 1, last_head - i + 1,
                                 [i + 1]]
                else:
                    e[0] += 1
                    e[2] = i + 1          # max start (i ascends)
                    e[4].append(i + 1)    # ascending -> already sorted
            i = j
        return [(did, c, tf, fo, lo, nw, offs)
                for c, (tf, fo, lo, nw, offs) in out.items()]

    return fn


GRAMMAR_OFFSETS_SCHEMA = ("doc_id long, candidate string, tf long, "
                          "first_offset long, last_offset long, "
                          "n_words long, offsets array<long>")


def grammar_candidates_with_offsets_synth(
        docs: DataFrame,
        stoplist: tuple[str, ...] = TEXT_STOPWORDS) -> DataFrame:
    """grammar_candidates_with_offsets over the synthetic tagger, as a
    per-doc pass (ops/perdoc.py): no token-row shuffle, no windows.
    The generic ``_from_tagged`` operator remains for real tagged
    streams (S2/S3), whose tags are NOT derivable from the term."""
    from .perdoc import per_doc_rows
    return per_doc_rows(docs, _grammar_synth_row_fn(stoplist),
                        GRAMMAR_OFFSETS_SCHEMA)


def grammar_candidates(docs: DataFrame,
                       stoplist: tuple[str, ...] = TEXT_STOPWORDS,
                       toks: DataFrame | None = None) -> DataFrame:
    """C6 over the synthetic-tagged testdata (the query entry)."""
    del toks  # per-doc pass tokenizes inline (lockstep tokenizer)
    return grammar_candidates_with_offsets_synth(docs, stoplist).select(
        "doc_id", "candidate", "tf", "first_offset", "n_words")


def from_pretagged(spark, rows) -> DataFrame:
    """S3 ingestion: ``[[(word, tag), ...], ...]`` sentence lists (one
    doc per outer list, pke/readers.py:137-151) -> (doc_id, pos, term,
    tag) with document-level 1-based positions (P4 offset shift)."""
    data = []
    for doc_id, sents in enumerate(rows):
        off = 0
        for sent in sents:
            for word, tag in sent:
                off += 1
                data.append((doc_id, off, word.lower(), tag))
    return rows_df(spark, data,
                   "doc_id long, pos int, term string, tag string")


# --------------------------------------------------------------- DuckDB

def _tagged_cte(stoplist: tuple[str, ...] = TEXT_STOPWORDS) -> str:
    return f"""{duckdb_toks_cte()},
tagged AS (
  SELECT doc_id, pos, term,
         CASE WHEN term IN {sql_str_list(stoplist)} THEN 'ADP'
              WHEN length(term) % 4 = 0 THEN 'ADJ'
              WHEN length(term) % 4 = 1 THEN 'VERB'
              ELSE 'NOUN' END AS tag
  FROM toks)"""


def grammar_candidates_sql(stoplist: tuple[str, ...] = TEXT_STOPWORDS) -> str:
    node = sql_str_list(NODE_TAGS)
    head = sql_str_list(HEAD_TAGS)
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
  FROM chunk WHERE pos <= noun_end GROUP BY doc_id, run_id)
SELECT doc_id, candidate, count(*)::BIGINT AS tf,
       min(start_pos)::BIGINT AS first_offset,
       max(n_words)::BIGINT AS n_words
FROM phrases GROUP BY doc_id, candidate"""
