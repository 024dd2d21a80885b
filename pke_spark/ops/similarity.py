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


def embedding_cosine_pairs(emb: DataFrame, threshold: float = 0.45) -> DataFrame:
    """(vec_a, vec_b, cos) exact pairs with cosine >= threshold."""
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


def ann_lsh_topk(emb: DataFrame, query_vec: list[float], k: int = 10,
                 n_planes: int = 4, n_tables: int = 12) -> DataFrame:
    """Approximate cosine top-k: sign-sketch bucket join + exact rerank.

    ``n_tables`` independent sketches; candidates = vectors sharing a
    bucket with the query in any table. Plumbing is the scale design:
    bucket ids computed in a vectorized pandas UDF, candidates via
    broadcast filter on the (tiny) query bucket set.
    """
    dim = len(query_vec)
    all_planes = _planes(dim, n_planes * n_tables)
    planes = [all_planes[t * n_planes:(t + 1) * n_planes]
              for t in range(n_tables)]
    qv = np.asarray(query_vec, dtype=np.float64)
    q_buckets = [int((p @ qv > 0).astype(np.uint8).dot(1 << np.arange(n_planes)))
                 for p in planes]

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
    sk = emb.select("vec_id", "embedding").mapInPandas(sketch, schema)
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
