"""Similarity search over the embeddings table (vec_id, embedding
float[64], label).

- ``ann_cosine_topk``: brute-force cosine top-k against a query vector —
  the exact baseline. All math JVM-side (zip_with + aggregate fold over
  array<double>), no UDF.
- ``embedding_cosine_pairs``: all pairs above a cosine threshold
  (embedding near-dup). Exact O(n^2) — the verifier path.
- ``ann_lsh_topk``: random-hyperplane LSH bucketing as the scale path:
  sign-bit sketch via deterministic planes, candidates = same-bucket
  (Hamming-0) vectors, exact re-rank inside buckets. Recall vs the
  brute-force baseline is asserted in tests (no SQL oracle — the
  bucketing is not reasonably SQL-expressible).

Scale notes: brute-force top-k is a single scan + TakeOrderedAndProject
(fully parallel, no shuffle); pairwise is shuffle-heavy and only for
verification; LSH reduces candidate generation to an equi-join on
bucket keys.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..rows import rows_df


def _dot(a, b) -> F.Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def _norm(a) -> F.Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0), lambda acc, x: acc + x))


def _emb_double(df: DataFrame) -> DataFrame:
    return df.withColumn("emb", F.col("embedding").cast("array<double>"))


def ann_cosine_topk(emb: DataFrame, query_vec: list[float], k: int = 10) -> DataFrame:
    """(rank, vec_id, cos) — exact cosine top-k, scan + global top-k."""
    e = _emb_double(emb)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    qn = math.sqrt(sum(float(x) * float(x) for x in query_vec))
    cos = F.round(_dot(F.col("emb"), q) / (_norm(F.col("emb")) * F.lit(qn)), 6)
    scored = e.select("vec_id", cos.alias("cos"))
    top = scored.orderBy(F.desc("cos"), F.asc("vec_id")).limit(k)
    w = Window.orderBy(F.desc("cos"), F.asc("vec_id"))
    return top.withColumn("rank", F.row_number().over(w).cast("int")) \
              .select("rank", "vec_id", "cos")


def ann_cosine_topk_sql(query_vec: list[float], k: int = 10) -> str:
    vec = "[" + ", ".join(repr(float(x)) for x in query_vec) + "]"
    qn = repr(math.sqrt(sum(float(x) * float(x) for x in query_vec)))
    return f"""WITH q AS (SELECT {vec}::DOUBLE[] AS qv),
scored AS (
  SELECT vec_id,
         round(
           list_sum(list_transform(list_zip(embedding::DOUBLE[], qv),
                    p -> p[1] * p[2]))
           / (sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x)))
              * {qn}), 6) AS cos
  FROM embeddings CROSS JOIN q)
SELECT CAST(row_number() OVER (ORDER BY cos DESC, vec_id ASC) AS INTEGER) AS rank,
       vec_id, cos
FROM scored ORDER BY cos DESC, vec_id ASC LIMIT {k}"""


def embedding_cosine_pairs(emb: DataFrame, threshold: float = 0.45,
                           n_blocks: int = 8) -> DataFrame:
    """(vec_a, vec_b, cos) EXACT pairs with cosine >= threshold, as a
    blocked similarity join — recall 1.0 with NO cartesian product in
    the plan.

    Physical shape: vectors are hashed into ``n_blocks`` blocks; each of
    the n_blocks*(n_blocks+1)/2 block pairs becomes one cogroup task that
    computes its cos sub-matrix as a single numpy GEMM and emits only
    rows above threshold. Shuffle volume is n_blocks x the input (each
    vector joins ~n_blocks block-pair keys); compute is the unavoidable
    O(n^2) FLOPs of an exact all-pairs, but BLAS-batched instead of a
    Catalyst nested-loop. At larger n, raise n_blocks ~ sqrt(tasks
    wanted). The candidate filter stays exact — for the approximate
    regime see embedding_dup_pairs_lsh.
    """
    import pandas as pd
    spark = emb.sparkSession
    e = emb.select("vec_id", "embedding").withColumn(
        "blk", F.pmod(F.xxhash64("vec_id"), F.lit(n_blocks)).cast("int"))
    bp = rows_df(
        spark, [(i, j) for i in range(n_blocks) for j in range(i, n_blocks)],
        "bi int, bj int")
    left = (e.alias("e1")
            .join(F.broadcast(bp.alias("p1")),
                  F.col("e1.blk") == F.col("p1.bi"))
            .select(F.col("p1.bi").alias("bi"), F.col("p1.bj").alias("bj"),
                    F.col("e1.vec_id").alias("vec_id"),
                    F.col("e1.embedding").alias("embedding")))
    right = (e.alias("e2")
             .join(F.broadcast(bp.alias("p2")),
                   F.col("e2.blk") == F.col("p2.bj"))
             .select(F.col("p2.bi").alias("bi"), F.col("p2.bj").alias("bj"),
                     F.col("e2.vec_id").alias("vec_id"),
                     F.col("e2.embedding").alias("embedding")))

    def fn(key, lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        bi, bj = key
        if len(lpdf) == 0 or len(rpdf) == 0:
            return pd.DataFrame({"vec_a": pd.Series(dtype="int64"),
                                 "vec_b": pd.Series(dtype="int64"),
                                 "cos": pd.Series(dtype="float64")})
        A = np.array([np.asarray(v, dtype=np.float64) for v in lpdf["embedding"]])
        Bm = np.array([np.asarray(v, dtype=np.float64) for v in rpdf["embedding"]])
        ai = lpdf["vec_id"].to_numpy(np.int64)
        bi_ids = rpdf["vec_id"].to_numpy(np.int64)
        C = (A @ Bm.T) / np.outer(np.linalg.norm(A, axis=1),
                                  np.linalg.norm(Bm, axis=1))
        # pre-filter a full rounding quantum below threshold (a raw cos
        # of threshold-5e-7 still rounds UP to the threshold); the exact
        # rounded HALF_UP comparison happens in Spark afterwards
        ii, jj = np.nonzero(C >= threshold - 1e-6)
        va, vb, cc = ai[ii], bi_ids[jj], C[ii, jj]
        keep = va < vb if bi == bj else np.ones(len(va), dtype=bool)
        va, vb, cc = va[keep], vb[keep], cc[keep]
        lo = np.minimum(va, vb)
        hi = np.maximum(va, vb)
        return pd.DataFrame({"vec_a": lo, "vec_b": hi, "cos": cc})

    raw = (left.groupBy("bi", "bj")
           .cogroup(right.groupBy("bi", "bj"))
           .applyInPandas(fn, "vec_a long, vec_b long, cos double"))
    return (raw.select("vec_a", "vec_b", F.round("cos", 6).alias("cos"))
            .filter(F.col("cos") >= threshold))


def _embedding_cosine_pairs_cartesian(emb: DataFrame,
                                      threshold: float = 0.45) -> DataFrame:
    """The O(n^2) nested-loop verifier — TESTS ONLY (asserts the blocked
    plan above is exact); never exposed as a query entry."""
    e = _emb_double(emb).select(F.col("vec_id"), F.col("emb"),
                                _norm(F.col("emb")).alias("nrm"))
    a, b = e.alias("a"), e.alias("b")
    cos = F.round(_dot(F.col("a.emb"), F.col("b.emb"))
                  / (F.col("a.nrm") * F.col("b.nrm")), 6)
    return (a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
            .select(F.col("a.vec_id").alias("vec_a"),
                    F.col("b.vec_id").alias("vec_b"), cos.alias("cos"))
            .filter(F.col("cos") >= threshold))


def embedding_cosine_pairs_sql(threshold: float = 0.45) -> str:
    return f"""WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS emb,
         sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))) AS nrm
  FROM embeddings)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(list_sum(list_transform(list_zip(a.emb, b.emb), p -> p[1] * p[2]))
             / (a.nrm * b.nrm), 6) AS cos
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE round(list_sum(list_transform(list_zip(a.emb, b.emb), p -> p[1] * p[2]))
            / (a.nrm * b.nrm), 6) >= {threshold}"""


# --------------------------------------------------------------- LSH

def _planes(dim: int, n_planes: int) -> np.ndarray:
    """Deterministic pseudo-random hyperplanes (Philox counter-based,
    fixed key — no external data, invariant to partitioning)."""
    g = np.random.Generator(np.random.Philox(key=42))
    return g.standard_normal((n_planes, dim))


# ------------------------------------------- banded near-dup (scale path)

EMB_DIM = 64          # testdata embeddings are 64-dim (TESTDATA.md)
DUP_PLANES = 4        # sign bits per band
DUP_TABLES = 16       # bands; recall 1.0 at sf0.01 asserted in tests


def _dup_plane_lits(n_planes: int = DUP_PLANES,
                    n_tables: int = DUP_TABLES) -> list[list[float]]:
    """Rounded plane literals shared VERBATIM by the Spark and DuckDB
    sides (key 7 keeps them independent of ann_lsh_topk's planes)."""
    g = np.random.Generator(np.random.Philox(key=7))
    p = g.standard_normal((n_planes * n_tables, EMB_DIM))
    return [[round(float(x), 6) for x in row] for row in p]


def _seq_dot_col(emb_col: str, plane: list[float]) -> F.Column:
    """Strictly left-to-right dot product as a Column expression — the
    same IEEE-754 evaluation order as the oracle's explicit SQL sum, so
    the sign bits (and therefore the candidate sets) match bit-exactly."""
    acc = F.element_at(F.col(emb_col), 1) * F.lit(plane[0])
    for i in range(1, len(plane)):
        acc = acc + F.element_at(F.col(emb_col), i + 1) * F.lit(plane[i])
    return acc


def _seq_dot_sql(emb_expr: str, plane: list[float]) -> str:
    terms = [f"{emb_expr}[{i + 1}] * {p!r}" for i, p in enumerate(plane)]
    out = terms[0]
    for t in terms[1:]:
        out = f"({out} + {t})"
    return out


def embedding_dup_pairs_lsh(emb: DataFrame, threshold: float = 0.45,
                            n_planes: int = DUP_PLANES,
                            n_tables: int = DUP_TABLES) -> DataFrame:
    """(vec_a, vec_b, cos) near-dup pairs via banded sign-LSH candidates
    + exact cosine rerank — the 100-TB shape: candidate generation is an
    EQUI-join on (band, bucket) keys, never an all-pairs product; the
    exact rerank touches only candidate pairs. Deterministic planes make
    the candidate set a pure function of the data, with a DuckDB twin
    (embedding_dup_pairs_lsh_sql) computing the identical buckets.
    Recall vs the exact O(n^2) verifier (embedding_cosine_pairs, kept
    for tests) is asserted at 1.0 on the testdata in
    tests/test_similarity_lsh.py."""
    planes = np.array(_dup_plane_lits(n_planes, n_tables))  # (P*T, dim)

    def sketch(pdf_iter):
        # one BLAS matmul per Arrow batch; sign-equality with the
        # oracle's sequential SQL sum is guarded by
        # tests/test_similarity_lsh.py::test_lsh_buckets_match_numpy_reference
        weights = 1 << np.arange(n_planes)
        for pdf in pdf_iter:
            if len(pdf) == 0:
                continue
            M = np.array([np.asarray(v, dtype=np.float64)
                          for v in pdf["embedding"]])
            bits = (M @ planes.T) > 0  # n x (P*T)
            out = []
            for t in range(n_tables):
                bk = bits[:, t * n_planes:(t + 1) * n_planes].dot(weights)
                out.append(pd.DataFrame({
                    "vec_id": pdf["vec_id"].to_numpy(np.int64),
                    "t": np.int32(t),
                    "bkt": bk.astype(np.int64)}))
            yield pd.concat(out, ignore_index=True)

    sk = emb.select("vec_id", "embedding").mapInPandas(
        sketch, "vec_id long, t int, bkt long") \
        .localCheckpoint(eager=False)  # both sides of the band-bucket
    # self-join consume the sketch table; unmaterialized, the matmul
    # pass ran twice
    cand = (sk.alias("a").join(
        sk.alias("b"),
        (F.col("a.t") == F.col("b.t")) & (F.col("a.bkt") == F.col("b.bkt"))
        & (F.col("a.vec_id") < F.col("b.vec_id")))
        .select(F.col("a.vec_id").alias("vec_a"),
                F.col("b.vec_id").alias("vec_b"))
        .distinct()
        # three consumers (both id sides + the rerank join) — without
        # materialization each re-runs the sketch self-join
        .localCheckpoint(eager=False))
    ea = emb.select(F.col("vec_id").alias("vec_a"),
                    F.col("embedding").alias("emb_a"))
    eb = emb.select(F.col("vec_id").alias("vec_b"),
                    F.col("embedding").alias("emb_b"))
    pairs = (cand.join(ea, "vec_a").join(eb, "vec_b")
             .select("vec_a", "vec_b", "emb_a", "emb_b"))

    # exact cosine per candidate pair in numpy (guide §4.2): the
    # previous interpreted zip_with/aggregate column math evaluated a
    # 64-element fold per pair row; raw cos is emitted unrounded and
    # the HALF_UP round + threshold run in Spark — the same numpy->
    # round discipline embedding_cosine_pairs' GEMM uses (float32 ->
    # float64 widening is exact on both paths)
    def rerank(pdf_iter):
        for pdf in pdf_iter:
            if len(pdf) == 0:
                continue
            A = np.array([np.asarray(v, dtype=np.float64)
                          for v in pdf["emb_a"]])
            Bm = np.array([np.asarray(v, dtype=np.float64)
                           for v in pdf["emb_b"]])
            cc = np.einsum("ij,ij->i", A, Bm) / (
                np.linalg.norm(A, axis=1) * np.linalg.norm(Bm, axis=1))
            yield pd.DataFrame({
                "vec_a": pdf["vec_a"].to_numpy(np.int64),
                "vec_b": pdf["vec_b"].to_numpy(np.int64),
                "cos": cc})

    raw = pairs.mapInPandas(rerank, "vec_a long, vec_b long, cos double")
    return (raw.select("vec_a", "vec_b", F.round("cos", 6).alias("cos"))
            .filter(F.col("cos") >= threshold))


def embedding_dup_pairs_lsh_sql(threshold: float = 0.45,
                                n_planes: int = DUP_PLANES,
                                n_tables: int = DUP_TABLES) -> str:
    planes = _dup_plane_lits(n_planes, n_tables)
    band_rows = []
    for t in range(n_tables):
        bits = " + ".join(
            f"(CASE WHEN {_seq_dot_sql('emb', planes[t * n_planes + p])} > 0 "
            f"THEN {1 << p} ELSE 0 END)"
            for p in range(n_planes))
        band_rows.append(f"SELECT vec_id, {t} AS t, ({bits}) AS bkt FROM e")
    sk = " UNION ALL ".join(band_rows)
    return f"""WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS emb,
         sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))) AS nrm
  FROM embeddings),
sk AS ({sk}),
cand AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM sk a JOIN sk b ON a.t = b.t AND a.bkt = b.bkt AND a.vec_id < b.vec_id),
scored AS (
  SELECT c.vec_a, c.vec_b,
         round(list_sum(list_transform(list_zip(ea.emb, eb.emb),
               p -> p[1] * p[2])) / (ea.nrm * eb.nrm), 6) AS cos
  FROM cand c
  JOIN e ea ON ea.vec_id = c.vec_a
  JOIN e eb ON eb.vec_id = c.vec_b)
SELECT vec_a, vec_b, cos FROM scored WHERE cos >= {threshold}"""


def sketch_table(emb: DataFrame, n_planes: int = 4,
                 n_tables: int = 12) -> DataFrame:
    """(vec_id, b0..b{T-1}) — the persistable LSH sketch table. Build
    once per corpus snapshot and ``.write.parquet(...)`` next to the
    embeddings; serving then reads the (tiny, scalar-column) sketches
    instead of recomputing matmuls per query. Deterministic planes
    (Philox key 42) keep sketches valid across sessions."""
    dim = len(emb.select("embedding").first()[0])
    all_planes = _planes(dim, n_planes * n_tables)
    planes = [all_planes[t * n_planes:(t + 1) * n_planes]
              for t in range(n_tables)]

    def sketch(pdf_iter):
        for pdf in pdf_iter:
            M = np.array([np.asarray(v, dtype=np.float64)
                          for v in pdf["embedding"]])
            out = {"vec_id": pdf["vec_id"].to_numpy()}
            for t, p in enumerate(planes):
                bits = (M @ p.T > 0).astype(np.uint8)
                out[f"b{t}"] = bits.dot(1 << np.arange(n_planes)).astype(np.int64)
            yield pd.DataFrame(out)

    schema = "vec_id long, " + ", ".join(f"b{t} long" for t in range(n_tables))
    return emb.select("vec_id", "embedding").mapInPandas(sketch, schema)


def ann_lsh_topk(emb: DataFrame, query_vec: list[float], k: int = 10,
                 n_planes: int = 4, n_tables: int = 12,
                 sketches: DataFrame | None = None) -> DataFrame:
    """Approximate cosine top-k: sign-sketch bucket join + exact rerank.

    ``n_tables`` independent sketches; candidates = vectors sharing a
    bucket with the query in any table. Pass ``sketches`` (a persisted
    sketch_table read back from parquet) to skip the per-query sketch
    computation — the serving path; omitted, sketches are computed
    inline (one matmul per Arrow batch).
    """
    dim = len(query_vec)
    all_planes = _planes(dim, n_planes * n_tables)
    planes = [all_planes[t * n_planes:(t + 1) * n_planes]
              for t in range(n_tables)]
    qv = np.asarray(query_vec, dtype=np.float64)
    q_buckets = [int((p @ qv > 0).astype(np.uint8).dot(1 << np.arange(n_planes)))
                 for p in planes]
    sk = sketches if sketches is not None else sketch_table(
        emb, n_planes, n_tables)
    cond = None
    for t, qb in enumerate(q_buckets):
        c = F.col(f"b{t}") == qb
        cond = c if cond is None else (cond | c)
    cands = sk.filter(cond).select("vec_id")
    e = _emb_double(emb).join(cands, "vec_id")
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    qn = math.sqrt(float(qv @ qv))
    cos = F.round(_dot(F.col("emb"), q) / (_norm(F.col("emb")) * F.lit(qn)), 6)
    scored = e.select("vec_id", cos.alias("cos"))
    top = scored.orderBy(F.desc("cos"), F.asc("vec_id")).limit(k)
    w = Window.orderBy(F.desc("cos"), F.asc("vec_id"))
    return top.withColumn("rank", F.row_number().over(w).cast("int")) \
              .select("rank", "vec_id", "cos")


# --------------------------------------------------------- IVF ANN
# Coarse-quantizer ANN (the brief's "IVF variant as the scale path"):
# k-means centroids over a deterministic sample partition the vector
# space; each vector lands in ONE inverted list (its nearest centroid),
# queries probe the nprobe nearest lists and exact-rerank only those.
# At 100 TB the assignment is a single broadcast-matmul map pass, the
# probe is a partition-pruned read of nprobe lists (vs LSH's union of
# per-table buckets), and centroids retrain offline. Deterministic end
# to end: the sample is the n_sample lowest vec_ids, init is the first
# n_centroids sample vectors, Lloyd iterations are fixed.

IVF_CENTROIDS = 16
IVF_ITERS = 10
IVF_SAMPLE = 256
IVF_NPROBE = 4


def ivf_centroids(emb: DataFrame, n_centroids: int = IVF_CENTROIDS,
                  n_iters: int = IVF_ITERS,
                  n_sample: int = IVF_SAMPLE) -> np.ndarray:
    """Deterministic Lloyd k-means (cosine/normalized: spherical
    k-means) over a DISTRIBUTED deterministic sample. Returns (k, dim)
    unit centroids.

    The sample is the n_sample rows with the smallest
    ``xxhash64(vec_id)`` — a partition-independent total order, so the
    centroids are bit-identical under any partitioning/parallelism
    (each executor ships only its local top-n_sample:
    TakeOrderedAndProject), and the hash order makes the sample (and
    the k-means init, its first n_centroids rows) uniform over the
    corpus rather than biased to the lowest ids. Only the O(n_sample x
    dim) sample ever reaches the driver; Lloyd runs in numpy on it,
    and the per-vector assignment stays a distributed broadcast-matmul
    pass (``ivf_assign``). At 100 TB: same plan, n_sample ~= 100k
    rows, centroids retrain offline."""
    sample = (_emb_double(emb).select("vec_id", "emb")
              .withColumn("h", F.xxhash64("vec_id"))
              .orderBy("h", "vec_id").limit(n_sample).collect())
    x = np.asarray([r.emb for r in sample], dtype=np.float64)
    x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    c = x[:n_centroids].copy()
    for _ in range(n_iters):
        assign = np.argmax(x @ c.T, axis=1)
        for j in range(n_centroids):
            m = assign == j
            if m.any():
                v = x[m].mean(axis=0)
                c[j] = v / max(np.linalg.norm(v), 1e-12)
    return c


def ivf_assign(emb: DataFrame, centroids: np.ndarray) -> DataFrame:
    """(vec_id, list_id, emb): nearest-centroid inverted-list
    assignment — one broadcast matmul per Arrow batch, no shuffle."""
    import pandas as pd

    spark = emb.sparkSession
    c_bc = spark.sparkContext.broadcast(centroids)

    def assign(pdf_iter):
        c = c_bc.value
        for pdf in pdf_iter:
            x = np.asarray(pdf["emb"].tolist(), dtype=np.float64)
            n = np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
            lid = np.argmax((x / n) @ c.T, axis=1).astype(np.int32)
            yield pd.DataFrame({"vec_id": pdf["vec_id"],
                                "list_id": lid,
                                "emb": pdf["emb"]})

    return (_emb_double(emb).select("vec_id", "emb")
            .mapInPandas(assign,
                         "vec_id long, list_id int, emb array<double>"))


def ann_ivf_topk(emb: DataFrame, query_vec: list[float], k: int = 10,
                 n_centroids: int = IVF_CENTROIDS,
                 nprobe: int = IVF_NPROBE,
                 assigned: DataFrame | None = None,
                 centroids: np.ndarray | None = None) -> DataFrame:
    """IVF cosine top-k: probe the nprobe nearest inverted lists, exact
    rerank inside them. Pass a persisted ``assigned`` table (+ its
    ``centroids``) for serving; omitted, both are computed inline."""
    if centroids is None:
        centroids = ivf_centroids(emb, n_centroids)
    if assigned is None:
        assigned = ivf_assign(emb, centroids)
    qv = np.asarray(query_vec, dtype=np.float64)
    qn = float(np.linalg.norm(qv))
    probes = np.argsort(-(centroids @ (qv / max(qn, 1e-12))))[:nprobe]
    cands = assigned.filter(F.col("list_id").isin([int(p) for p in probes]))
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    cos = F.round(_dot(F.col("emb"), q) / (_norm(F.col("emb")) * F.lit(qn)), 6)
    scored = cands.select("vec_id", cos.alias("cos"))
    top = scored.orderBy(F.desc("cos"), F.asc("vec_id")).limit(k)
    w = Window.orderBy(F.desc("cos"), F.asc("vec_id"))
    return top.withColumn("rank", F.row_number().over(w).cast("int")) \
              .select("rank", "vec_id", "cos")
