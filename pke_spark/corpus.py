"""Corpus synthesis + loading.

Primary input shape (BASELINE.json input_hint): an Iceberg-shaped table
``(repo string, path string, commit string, lang string, content string)``.
This module synthesizes that table deterministically (seed fixed in the
arithmetic, invariant to partitioning/batching) and derives
``doc_id = xxhash64(repo, path, commit)`` and the per-row invariant
``content_sha = sha256(content)`` (north rule).

Secondary input: the driver-provided ``documents.parquet``
``(doc_id, text, lang, source, n_chars)`` — accepted via a column mapping.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CORPUS_SCHEMA = "repo string, path string, commit string, lang string, content string"

_LANGS = ("python", "java", "js", "go")
# seeded identifier vocabulary: camelCase + snake_case mix (FIXTURES.md F1)
_NOUNS = ("index", "token", "merge", "batch", "query", "score", "shard",
          "block", "delta", "varint", "posting", "lexer", "parser", "cache",
          "buffer", "stream", "writer", "reader", "codec", "cursor")
_VERBS = ("build", "scan", "emit", "flush", "encode", "decode", "split",
          "rank", "fetch", "probe", "pack", "seek")
_HOT = {"python": ("def", "import", "return"),
        "java": ("public", "import", "return"),
        "js": ("function", "import", "return"),
        "go": ("func", "import", "return")}


def _ident(i: int, camel: bool) -> str:
    v = _VERBS[i % len(_VERBS)]
    n = _NOUNS[(i // len(_VERBS)) % len(_NOUNS)]
    if camel:
        return v + n.capitalize()
    return v + "_" + n


def synth_content(doc_idx: int) -> str:
    """Deterministic synthetic source file for global doc index ``doc_idx``.

    Pure arithmetic on the index — no RNG state — so output is invariant
    to partitioning and batch size. Includes hot terms (def/import/return)
    in every doc for skew tests and a unique identifier ``uniq_tok_{idx}``
    for top-k discrimination (FIXTURES.md F1).
    """
    lang = _LANGS[doc_idx % len(_LANGS)]
    h1, h2, h3 = _HOT[lang]
    lines = [f"{h2} core_lib_{doc_idx % 97}"]
    n_funcs = 2 + (doc_idx * 2654435761) % 5
    for f_i in range(n_funcs):
        base = doc_idx * 131 + f_i * 17
        name = _ident(base, camel=(base % 2 == 0))
        arg = _ident(base + 7, camel=(base % 3 == 0))
        lines.append(f"{h1} {name}({arg}):")
        body_len = 1 + (base * 2246822519) % 4
        for b_i in range(body_len):
            a = _ident(base + 11 + b_i, camel=(b_i % 2 == 0))
            b = _ident(base + 29 + b_i, camel=(b_i % 2 == 1))
            lines.append(f"    {a} = {b}({a}, {base % 1000})")
        lines.append(f"    {h3} {_ident(base + 3, camel=True)}")
    if doc_idx % 7 == 0:
        lines.append(f"# marker uniq_tok_{doc_idx}")
    return "\n".join(lines)


def synth_corpus(spark: SparkSession, n_docs: int, partitions: int | None = None) -> DataFrame:
    """Distributed deterministic corpus in the input_hint shape."""
    rng = spark.range(0, n_docs, 1, partitions or spark.sparkContext.defaultParallelism)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            idx = b["id"].to_numpy()
            yield pd.DataFrame({
                "repo": [f"org{i % 13}/proj{i % 7}" for i in idx],
                "path": [f"src/module_{i}.{'py' if i % 4 == 0 else ['java','js','go'][i % 4 - 1]}" for i in idx],
                "commit": [format((int(i) * 0x9E3779B97F4A7C15) & ((1 << 160) - 1), "040x") for i in idx],
                "lang": [_LANGS[i % len(_LANGS)] for i in idx],
                "content": [synth_content(int(i)) for i in idx],
            })

    return rng.mapInPandas(gen, CORPUS_SCHEMA)


def with_doc_ids(corpus: DataFrame) -> DataFrame:
    """Derive doc_id + content_sha JVM-side (SURVEY §1.3)."""
    return corpus.withColumn("doc_id", F.xxhash64("repo", "path", "commit")) \
                 .withColumn("content_sha", F.sha2("content", 256))


def load_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver testdata documents table: (doc_id, text, lang, source, n_chars)."""
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def documents_as_corpus(docs: DataFrame) -> DataFrame:
    """Column-map the secondary shape into the primary corpus shape."""
    return docs.select(
        F.concat(F.lit("testdata/"), F.col("source")).alias("repo"),
        F.concat(F.lit("doc_"), F.col("doc_id").cast("string")).alias("path"),
        F.lpad(F.hex(F.col("doc_id")), 40, "0").alias("commit"),
        F.col("lang"),
        F.col("text").alias("content"),
    )


def load_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def read_iceberg_corpus(spark: SparkSession, table: str,
                        snapshot_id: int | None = None
                        ) -> tuple[DataFrame, str]:
    """Read the corpus from an Iceberg table, pinned to a snapshot.

    Returns ``(df, input_snapshot)`` where ``input_snapshot`` is the
    string recorded in the build manifest's lineage rows (north rule:
    "per-partition checkpoints recorded with lineage (input
    snapshot-id, ...)"). When no snapshot is given, the table's current
    snapshot is resolved FIRST and then read BY ID, so a concurrent
    commit between "resolve" and "scan" cannot split one build across
    two table versions — and a resumed build re-reads the exact
    snapshot its manifest names.

    Falls back to a parquet directory path ONLY when the Iceberg data
    source itself is unavailable (runtime jar not on the classpath —
    this sandbox) AND no explicit snapshot was requested; any other
    failure (expired snapshot, catalog error, schema mismatch)
    re-raises rather than silently downgrading a pinned read to an
    un-pinned scan of whatever happens to live at the path.
    """
    def _source_missing(exc: Exception) -> bool:
        msg = str(exc)
        return ("DATA_SOURCE_NOT_FOUND" in msg
                or "Failed to find the data source: iceberg" in msg
                or "Failed to find data source: iceberg" in msg)

    try:
        if snapshot_id is None:
            # current snapshot from the 'main' ref — NOT
            # max(committed_at) over .snapshots, which is wrong after a
            # rollback (the rolled-back-from snapshot keeps the latest
            # commit time while no longer being current)
            ref = (spark.read.format("iceberg")
                   .load(f"{table}.refs")
                   .filter(F.col("name") == "main")
                   .select("snapshot_id").first())
            snapshot_id = int(ref["snapshot_id"]) if ref else None
        reader = spark.read.format("iceberg")
        if snapshot_id is not None:
            reader = reader.option("snapshot-id", str(snapshot_id))
        df = reader.load(table)
        return df.select("repo", "path", "commit", "lang", "content"), \
            f"iceberg:{table}@{snapshot_id}"
    except Exception as exc:  # noqa: BLE001 — filtered just below
        if not _source_missing(exc):
            raise
        if snapshot_id is not None:
            raise RuntimeError(
                f"snapshot-pinned read of {table}@{snapshot_id} requested "
                "but the Iceberg data source is unavailable; refusing to "
                "fall back to an un-pinned parquet read") from exc
        df = spark.read.parquet(table)
        return df.select("repo", "path", "commit", "lang", "content"), \
            f"parquet:{table}"
