"""Query-time BM25 over the compressed index, with Block-Max pruning.

Two scorers, both score-EXACT (identical to the exhaustive DataFrame
scorer ops/core.bm25_topk — asserted in tests):

- ``bm25_indexed``: decode postings of the query terms (doc lengths are
  embedded in the blocks, so no doc-stats join), pure-DataFrame scoring.
  Plan: term-pruned parquet scan -> mapInPandas decode -> hash agg on
  doc_id -> TakeOrderedAndProject global top-k.

- ``wand_topk``: Block-Max pruned top-k. Query-term blocks are
  range-partitioned over the docID space into buckets (a block
  overlapping two buckets goes to both and is clipped at decode), then
  each bucket runs a block-max term-at-a-time scorer in numpy:
  terms processed in descending upper-bound order; blocks whose
  block-max upper bound plus the remaining terms' upper bounds cannot
  beat the bucket's current k-th best score are never decoded;
  accumulated docs that provably cannot reach the k-th best are dropped.
  Per-bucket exact top-k, then one global TakeOrderedAndProject merge.
  OR-semantics BM25; pruning only discards provably-losing work, so the
  result is exact (a safety epsilon protects the 6-decimal rounding of
  final scores).

Block upper bound: tf_part(tf, dl) = tf(k1+1)/(tf + k1(1-b+b·dl/avgdl))
is increasing in tf and decreasing in dl, so
ub = idf · max_tf(k1+1)/(max_tf + k1(1-b)) (dl->0 limit) is valid.

At 10^12 scale the bucket fan-out is the parallelism knob: each bucket
sees only the query terms' blocks overlapping its doc range (hot terms'
lists are spread across all buckets — the read-side analog of the
build-side salting).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from . import codec
from .build import IndexReader
from ..rows import rows_df
from .delete import keep_mask

K1 = 1.2
B = 0.75
_EPS = 1e-6  # pruning safety margin vs 6-decimal score rounding


def _idf(n: int, df: int) -> float:
    return math.log(1.0 + (n - df + 0.5) / (df + 0.5))


def _rank_topk(scored: DataFrame, k: int) -> DataFrame:
    top = scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return top.withColumn("rank", F.row_number().over(w).cast("int")) \
              .select("rank", "doc_id", "score")


def _translate_rows(ix: IndexReader,
                    out: list[tuple]) -> list[tuple]:
    """Dense-ordinal indexes: map (rank, ord, score) rows back to raw
    doc_ids via a k-row pushdown point read of the docmap. Tie-breaking
    is unaffected — ordinals are assigned in ascending doc_id order, so
    (score DESC, ord ASC) == (score DESC, doc_id ASC)."""
    if not out:
        return out
    dmap = ix.resolve_ords([d for _r, d, _s in out])
    return [(r, dmap[d], s) for r, d, s in out]


def _translate_ords(ix: IndexReader, ranked: DataFrame) -> DataFrame:
    """Dense-ordinal indexes: materialize the (<= k)-row ranking and
    translate ords via resolve_ords — a driver-side point read — rather
    than joining against a full docmap scan per query."""
    if not ix.dense:
        return ranked
    rows = [(int(r["rank"]), int(r["doc_id"]), float(r["score"]))
            for r in ranked.collect()]
    return rows_df(ix.spark, _translate_rows(ix, rows) or [],
                   "rank int, doc_id long, score double")


def decoded_tc(ix: IndexReader, terms: list[str]) -> DataFrame:
    """(term, doc_id, tf, dl) DataFrame decoded from the queried terms'
    posting blocks (term-pruned parquet scan; tombstones applied in the
    decode pass). doc_id is in POSTING space — ordinals when the index
    is dense."""
    post = ix.term_postings(sorted(set(terms)))
    tomb = ix.tombstones()
    tb = ix.spark.sparkContext.broadcast(tomb) if tomb.size else None

    def _decode(pdf_iter):
        t = tb.value if tb is not None else None
        for pdf in pdf_iter:
            frames = []
            for _, r in pdf.iterrows():
                docs, tfs, dls = codec.decode_blocks(r["blocks"])
                if t is not None:
                    m = keep_mask(docs, t)
                    docs, tfs, dls = docs[m], tfs[m], dls[m]
                frames.append(pd.DataFrame(
                    {"term": r["term"], "doc_id": docs, "tf": tfs, "dl": dls}))
            if frames:
                yield pd.concat(frames, ignore_index=True)

    return post.select("term", "blocks").mapInPandas(
        _decode, "term string, doc_id long, tf long, dl long")


def bm25_indexed(ix: IndexReader, query_terms: list[str], k: int = 10,
                 k1: float = K1, b: float = B) -> DataFrame:
    """Exhaustive BM25 from the index (decode + DataFrame scoring)."""
    terms = sorted(set(query_terms))
    stats_rows = sorted(ix.term_dfs(terms).items())
    stats = rows_df(ix.spark, stats_rows, "term string, df long")
    tc = decoded_tc(ix, terms)
    n, avgdl = float(ix.n_docs), float(ix.avgdl)
    idf = F.log(F.lit(1.0) + (F.lit(n) - F.col("df") + 0.5) / (F.col("df") + 0.5))
    tf_part = (F.col("tf") * (k1 + 1.0)) / \
        (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.lit(avgdl)))
    scored = (tc.join(F.broadcast(stats), "term")
              .groupBy("doc_id")
              .agg(F.round(F.sum(idf * tf_part), 6).alias("score")))
    return _translate_ords(ix, _rank_topk(scored, k))


# serving fast path: queries whose terms' total df fits this budget are
# answered on the driver from a term-pruned parquet read (~ms) instead
# of a Spark job (~seconds of scheduling latency in local mode). This
# is the classic coordinator short-query path of a search engine: the
# driver already holds the term dictionary; only HOT terms (big df)
# need the distributed block-max scorer. Exact same codec + formula.
DRIVER_FASTPATH_MAX_DF = 200_000


def _fastpath_bound(ix: IndexReader) -> int:
    """Driver fast-path routing bound on a query's total posting rows.

    With the reader's decoded-postings LRU, the fast path is valid (and
    fastest) whenever the query's working set FITS THE SERVING CACHE:
    a hot term decodes once and serves from numpy thereafter, so the
    old fixed per-query cost bound would mis-route exactly the traffic
    a cache exists for. At web scale the bound still routes honestly —
    a 10^9-row mega-term exceeds any driver cache budget and falls back
    to the distributed block-max scorer."""
    return max(DRIVER_FASTPATH_MAX_DF, ix.POSTINGS_CACHE_MAX_ROWS)


def _driver_rows(ix: IndexReader, terms: list[str], k: int,
                 k1: float, b: float) -> list[tuple]:
    """Driver fast path core: (rank, doc_id, score) tuples.

    Postings come from the reader's decoded-postings LRU
    (IndexReader.decoded_postings): one term-pruned parquet point read
    per cache miss, zero reads for a sustained stream's hot terms —
    tombstones are already applied inside the cache (both are fixed at
    reader construction)."""
    n, avgdl = float(ix.n_docs), float(ix.avgdl)
    dfs = ix.term_dfs(terms)
    posts = ix.decoded_postings(sorted(dfs))
    live = [t for t in sorted(dfs) if len(posts[t][0])]
    if not live:
        return []
    docs = np.unique(np.concatenate([posts[t][0] for t in live]))
    acc = np.zeros(len(docs), dtype=np.float64)
    for t in live:  # fixed summation order (SURVEY §7.3): per doc the
        # contributions add in sorted-term order, the same pairwise FP
        # sequence as the previous Series.add chain
        idf = _idf(int(n), dfs[t])
        d, tf, dl = posts[t]
        tff = tf.astype(np.float64)
        dlf = dl.astype(np.float64)
        c = idf * (tff * (k1 + 1.0)) / \
            (tff + k1 * (1.0 - b + b * dlf / avgdl))
        acc[np.searchsorted(docs, d)] += c
    scores = np.round(acc, 6)
    order = np.lexsort((docs, -scores))[:k]
    out = [(i + 1, int(docs[j]), float(scores[j]))
           for i, j in enumerate(order)]
    if ix.dense:
        out = _translate_rows(ix, out)
    return out


def _driver_topk(ix: IndexReader, terms: list[str], k: int,
                 k1: float, b: float) -> DataFrame:
    out = _driver_rows(ix, terms, k, k1, b)
    return rows_df(ix.spark, out or [],
                   "rank int, doc_id long, score double")


def search(ix: IndexReader, query_terms: list[str], k: int = 10,
           k1: float = K1, b: float = B) -> list[tuple[int, int, float]]:
    """Serving-native top-k: plain (rank, doc_id, score) tuples with NO
    DataFrame round-trip. Dictionary-bounded queries score entirely on
    the driver (term-pruned parquet point read + numpy — the
    coordinator short-query path); hot queries fall back to the
    distributed block-max scorer and collect its <= k rows. Identical
    scores/tie-breaking to wand_topk (shared implementation) — this is
    the sustained-QPS serving surface, wand_topk the DataFrame one."""
    terms = sorted(set(query_terms))
    term_df = ix.term_dfs(terms)
    if not term_df:
        return []
    if sum(term_df.values()) <= _fastpath_bound(ix):
        rows = _driver_rows(ix, sorted(term_df), k, k1, b)
        return [(r, int(d), float(s)) for r, d, s in rows]
    df = wand_topk(ix, query_terms, k, k1, b, driver_fastpath=False)
    return [(int(r["rank"]), int(r["doc_id"]), float(r["score"]))
            for r in df.collect()]


def boolean_search(ix: IndexReader, must: list[str],
                   should: list[str] | None = None,
                   must_not: list[str] | None = None,
                   k: int = 10, k1: float = K1, b: float = B
                   ) -> list[tuple[int, int, float]]:
    """Index-backed boolean-filtered BM25 (semantics defined and
    oracle-gated in ``ops/boolquery.py``; parity-tested row-for-row).

    Driver-native serving path: clause postings come from the reader's
    decoded-postings LRU, the must-intersection / must_not-difference
    are sorted-array set ops, and only surviving docs are scored. All
    clause lists are dictionary-bounded (a handful of terms), so like
    ``search()`` this is coordinator work; an index-side distributed
    variant would follow wand_topk's bucket shape if clause posting
    lists ever exceed driver memory."""
    import numpy as np
    should = should or []
    must_not = must_not or []
    if not must:
        raise ValueError("boolean_search needs at least one must term")
    overlap = set(must + should) & set(must_not)
    if overlap:
        raise ValueError(f"terms both required and excluded: {overlap}")
    must_u = sorted(set(must))
    dfs_must = ix.term_dfs(must_u)
    if len(dfs_must) < len(must_u):
        return []  # a must term is absent from the corpus
    score_terms = sorted(ix.term_dfs(list(dict.fromkeys(must + should))))
    posts = ix.decoded_postings(
        sorted(set(score_terms) | set(must_u) | set(must_not)))
    cand = None
    for t in must_u:
        d = posts[t][0]
        cand = d if cand is None else np.intersect1d(cand, d,
                                                     assume_unique=True)
        if not len(cand):
            return []
    for t in sorted(set(must_not)):
        if t in posts and len(posts[t][0]):
            cand = cand[~np.isin(cand, posts[t][0], assume_unique=True)]
    if not len(cand):
        return []
    n, avgdl = float(ix.n_docs), float(ix.avgdl)
    dfs = ix.term_dfs(score_terms)
    cand = np.sort(cand)
    hit = np.zeros(len(cand), dtype=bool)
    acc = np.zeros(len(cand), dtype=np.float64)
    for t in score_terms:  # fixed summation order, as _driver_rows
        d, tf, dl = posts[t]
        m = np.isin(d, cand, assume_unique=True)
        if not m.any():
            continue
        idf = _idf(int(n), dfs[t])
        tff = tf[m].astype(np.float64)
        dlf = dl[m].astype(np.float64)
        c = idf * (tff * (k1 + 1.0)) / \
            (tff + k1 * (1.0 - b + b * dlf / avgdl))
        idx = np.searchsorted(cand, d[m])
        acc[idx] += c
        hit[idx] = True
    docs = cand[hit]
    scores = np.round(acc[hit], 6)
    order = np.lexsort((docs, -scores))[:k]
    out = [(i + 1, int(docs[j]), float(scores[j]))
           for i, j in enumerate(order)]
    if ix.dense:
        out = _translate_rows(ix, out)
    return [(r, int(d), float(s)) for r, d, s in out]


def wand_topk(ix: IndexReader, query_terms: list[str], k: int = 10,
              k1: float = K1, b: float = B, n_buckets: int = 64,
              driver_fastpath: bool = True) -> DataFrame:
    """Block-Max pruned BM25 top-k (see module docstring)."""
    # >= 2: shift must stay < 64 (JVM shiftrightunsigned shifts mod 64,
    # so shift==64 would leave full 64-bit doc values as bucket bounds
    # and explode F.sequence(b1, b2))
    assert n_buckets >= 2 and n_buckets & (n_buckets - 1) == 0, \
        "n_buckets must be a power of 2, >= 2"
    shift = 64 - int(math.log2(n_buckets))
    terms = sorted(set(query_terms))
    post = ix.term_postings(terms)
    # pruned dictionary read: only the query's terms, LRU-cached — no
    # full-vocab structure ever lands on the driver
    term_df = ix.term_dfs(terms)
    if not term_df:
        return _rank_topk(
            rows_df(ix.spark, [], "doc_id long, score double"), k)
    if driver_fastpath and sum(term_df.values()) <= _fastpath_bound(ix):
        return _driver_topk(ix, sorted(term_df), k, k1, b)
    n_docs, avgdl = int(ix.n_docs), float(ix.avgdl)

    dense = ix.dense
    if dense:
        # dense-ordinal doc space [0, n_docs): bucket by equal ord
        # ranges (high-bit bucketing would drop every small ord into
        # one bucket and serialize the query)
        span = max(1, -(-n_docs // n_buckets))  # ceil(n/buckets)
        b1c = F.floor(F.col("b.first_doc") / span).cast("long").alias("b1")
        b2c = F.floor(F.col("b.last_doc") / span).cast("long").alias("b2")
    else:
        sign = F.lit(-(1 << 63)).cast("long")
        b1c = F.shiftrightunsigned(
            F.col("b.first_doc").bitwiseXOR(sign), shift).alias("b1")
        b2c = F.shiftrightunsigned(
            F.col("b.last_doc").bitwiseXOR(sign), shift).alias("b2")
    blocks = post.select("term", F.explode("blocks").alias("b")).select(
        "term", "b.*", b1c, b2c)
    u64_max = np.uint64(0xFFFFFFFFFFFFFFFF)
    bucketed = (blocks
                .withColumn("bucket", F.explode(F.sequence("b1", "b2")))
                .drop("b1", "b2"))

    idfs = {t: _idf(n_docs, df) for t, df in term_df.items()}
    tombs = ix.tombstones()
    tb = ix.spark.sparkContext.broadcast(tombs) if tombs.size else None

    def score_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        """Exact two-pass block-max top-k for one docID-range bucket.

        Pass 1 (threshold discovery): pruned term-at-a-time sweep in
        descending upper-bound order; its k-th best accumulated score is
        a LOWER bound theta on the true k-th best score (accumulations
        only ever understate).

        Pass 2 (exact): decode exactly the blocks that could contain a
        doc scoring >= theta. Proof a true top-k doc d is fully covered:
        for any term t with a block s containing d,
        ub(s) + sum_{t' != t} maxub(t') >= score(d) >= theta, so s is a
        candidate block. Exhaustive vectorized scoring over candidate
        blocks therefore yields exact scores for every true top-k doc;
        other docs may be understated, which cannot perturb the top-k
        selection (their true scores are below the k-th).
        """
        if dense:
            bkt = int(pdf["bucket"].iloc[0])
            lo = bkt * span
            hi = lo + span - 1
        else:
            bkt = np.uint64(pdf["bucket"].iloc[0])
            lo = codec.from_u64(
                np.array([bkt << np.uint64(shift)], np.uint64))[0]
            hi_u = (bkt << np.uint64(shift)) | \
                (u64_max >> np.uint64(64 - shift))
            hi = codec.from_u64(np.array([hi_u], np.uint64))[0]
        groups = []
        for t, g in pdf.groupby("term", sort=True):
            mt = g["max_tf"].to_numpy(np.float64)
            ubs = idfs[t] * (mt * (k1 + 1.0)) / (mt + k1 * (1.0 - b))
            groups.append((float(ubs.max()), t, g, ubs))
        groups.sort(key=lambda x: (-x[0], x[1]))
        term_maxub = [g[0] for g in groups]
        total_ub = float(sum(term_maxub))

        cache: dict[tuple[str, int], tuple] = {}

        def decode(t, g, j):
            key = (t, j)
            if key not in cache:
                row = g.iloc[j]
                d, tf, dl = codec.decode_block(row)
                m = (d >= lo) & (d <= hi)
                if tb is not None:
                    m &= keep_mask(d, tb.value)
                cache[key] = (d[m], tf[m], dl[m])
            return cache[key]

        def contrib_of(t, tf, dl):
            return idfs[t] * (tf * (k1 + 1.0)) / \
                (tf + k1 * (1.0 - b + b * dl / avgdl))

        # ---- pass 1: theta ----
        acc = pd.Series(dtype=np.float64)
        theta = -np.inf
        for i, (tub, t, g, ubs) in enumerate(groups):
            rem_after = float(sum(term_maxub[i + 1:]))
            if np.isfinite(theta) and tub + rem_after < theta - _EPS:
                break
            parts = []
            for j, ub in enumerate(ubs):
                if np.isfinite(theta) and ub + rem_after < theta - _EPS:
                    continue
                d, tf, dl = decode(t, g, j)
                if len(d):
                    parts.append((d, tf, dl))
            if parts:
                d = np.concatenate([p[0] for p in parts])
                tf = np.concatenate([p[1] for p in parts]).astype(np.float64)
                dl = np.concatenate([p[2] for p in parts]).astype(np.float64)
                acc = acc.add(pd.Series(contrib_of(t, tf, dl), index=d),
                              fill_value=0.0)
            if len(acc) >= k:
                kth = float(np.partition(acc.to_numpy(), -k)[-k])
                theta = max(theta, kth)

        # ---- pass 2: exact over candidate blocks ----
        frames = []
        for i, (tub, t, g, ubs) in enumerate(groups):
            other_ub = total_ub - term_maxub[i]
            for j, ub in enumerate(ubs):
                if np.isfinite(theta) and ub + other_ub < theta - _EPS:
                    continue
                d, tf, dl = decode(t, g, j)
                if len(d):
                    frames.append(pd.DataFrame({
                        "doc_id": d,
                        "c": contrib_of(t, tf.astype(np.float64),
                                        dl.astype(np.float64))}))
        if not frames:
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                 "score": pd.Series(dtype="float64")})
        exact = pd.concat(frames, ignore_index=True).groupby("doc_id")["c"].sum()
        docs = exact.index.to_numpy(np.int64)
        scores = np.round(exact.to_numpy(), 6)
        order = np.lexsort((docs, -scores))[:k]
        return pd.DataFrame({"doc_id": docs[order], "score": scores[order]})

    local = bucketed.groupBy("bucket").applyInPandas(
        score_bucket, "doc_id long, score double")
    # per-bucket top-k lists are tiny (n_buckets * k rows); the final
    # merge is a driver-side sort — one Spark job per query instead of
    # an extra global sort + window stage
    rows = local.collect()
    rows.sort(key=lambda r: (-r.score, r.doc_id))
    out = [(i + 1, int(r.doc_id), float(r.score))
           for i, r in enumerate(rows[:k])]
    if ix.dense:
        out = _translate_rows(ix, out)
    return rows_df(ix.spark, out or [],
                   "rank int, doc_id long, score double")


def bm25_topk_batch(ix: IndexReader, queries: dict[str, list[str]],
                    k: int = 10, k1: float = K1, b: float = B) -> DataFrame:
    """(query_id, rank, doc_id, score): exact BM25 top-k for EVERY
    query in ONE Spark job.

    The serving-scale path for evaluating a query SET (the reference
    query set, a nightly eval of thousands of queries): the postings of
    the union of all query terms are read and decoded once, a broadcast
    (query_id, term) map fans the decoded postings out to their
    queries, and one hash aggregation + per-query window produces every
    ranking — amortizing scan, decode, and job-scheduling latency
    across the whole batch instead of paying them per query. Queries
    with no indexed terms simply yield no rows (same contract as the
    empty single-query result).

    Scores and tie-breaking are identical to bm25_indexed/wand_topk
    (asserted in tests/test_index.py against both the oracle and the
    per-query scorers).
    """
    all_terms = sorted({t for ts in queries.values() for t in ts})
    dfs = {t: d for t, d in ix.term_dfs(all_terms).items() if d > 0}
    pairs = [(qid, t) for qid, ts in sorted(queries.items())
             for t in sorted(set(ts)) if t in dfs]
    if not pairs:
        return rows_df(ix.spark, [],
                       "query_id string, rank int, doc_id long, score double")
    # batch driver fast path (the serving batch's routing rule): when
    # the union of all queries' posting rows fits the driver budget,
    # ONE term-pruned decode warms the LRU and every query is answered
    # by the shared `_driver_rows` body (identical scores/tie-breaks to
    # the distributed plan — parity-tested); 21–200 coordinated
    # queries then cost milliseconds each instead of fanning
    # queries x postings through a shuffle. Past the budget the
    # distributed plan below is the honest shape.
    from .serving import (BATCH_DRIVER_MAX_WORK,  # lazy: serving imports wand
                          _BatchScorer)
    if (sum(dfs.values()) <= _fastpath_bound(ix)
            and len(queries) * min(sum(dfs.values()), int(ix.n_docs))
            <= BATCH_DRIVER_MAX_WORK):
        old_budget = ix.POSTINGS_CACHE_MAX_ROWS
        ix.POSTINGS_CACHE_MAX_ROWS = max(old_budget, sum(dfs.values()) + 1)
        try:
            bs = _BatchScorer(ix, sorted(dfs), k1, b)
            rows = []
            for qid in sorted(queries):
                qt = sorted({t for t in set(queries[qid]) if t in dfs})
                if not qt:
                    continue
                out = bs.score(qt, None, k)
                rows += [(qid, int(r), int(d), float(s))
                         for r, d, s in out]
        finally:
            ix.POSTINGS_CACHE_MAX_ROWS = old_budget
        return rows_df(
            ix.spark, rows,
            "query_id string, rank int, doc_id long, score double")
    qt = F.broadcast(rows_df(ix.spark, pairs,
                             "query_id string, term string"))
    stats = F.broadcast(rows_df(ix.spark, sorted(dfs.items()),
                                "term string, df long"))
    post = ix.term_postings(sorted(dfs))

    tomb = ix.tombstones()
    tb2 = ix.spark.sparkContext.broadcast(tomb) if tomb.size else None

    def _decode(pdf_iter):
        t = tb2.value if tb2 is not None else None
        for pdf in pdf_iter:
            frames = []
            for _, r in pdf.iterrows():
                docs, tfs, dls = codec.decode_blocks(r["blocks"])
                if t is not None:
                    m = keep_mask(docs, t)
                    docs, tfs, dls = docs[m], tfs[m], dls[m]
                frames.append(pd.DataFrame(
                    {"term": r["term"], "doc_id": docs,
                     "tf": tfs, "dl": dls}))
            if frames:
                yield pd.concat(frames, ignore_index=True)

    tc = post.select("term", "blocks").mapInPandas(
        _decode, "term string, doc_id long, tf long, dl long")
    n, avgdl = float(ix.n_docs), float(ix.avgdl)
    idf = F.log(F.lit(1.0) + (F.lit(n) - F.col("df") + 0.5)
                / (F.col("df") + 0.5))
    tf_part = (F.col("tf") * (k1 + 1.0)) / \
        (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.lit(avgdl)))
    scored = (tc.join(stats, "term").join(qt, "term")
              .groupBy("query_id", "doc_id")
              .agg(F.round(F.sum(idf * tf_part), 6).alias("score")))
    w = Window.partitionBy("query_id").orderBy(F.desc("score"),
                                               F.asc("doc_id"))
    ranked = (scored.withColumn("rank", F.row_number().over(w).cast("int"))
              .filter(F.col("rank") <= k)
              .select("query_id", "rank", "doc_id", "score"))
    if ix.dense:
        # ONE docmap scan amortized over the whole batch (the per-query
        # point read would be q separate driver lookups)
        dm = ix.docmap()
        ranked = (dm.join(F.broadcast(ranked.withColumnRenamed(
            "doc_id", "ord")), "ord")
            .select("query_id", "rank", "doc_id", "score"))
    return ranked
