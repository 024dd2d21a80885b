"""Reader-equivalence analog of the reference's tests/test_reading.py:
all tokenizer implementations produce identical output, invariant to
batching and partitioning (SURVEY §5, FIXTURES.md F6)."""

from __future__ import annotations

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from pke_spark.tokenizer import (
    duckdb_tokens_expr,
    tokenize_series,
    tokenize_text,
    tokens_array,
    tokens_exploded,
)

FIXTURES = {
    "def buildIndex(token_stream):": ["def", "build", "index", "token", "stream"],
    "HTMLParser parses XMLDocs": ["html", "parser", "parses", "xml", "docs"],
    "snake_case_name = camelCaseName2": ["snake", "case", "name", "camel", "case", "name2"],
    "x+=1; y.z(q) // comment!": ["x", "1", "y", "z", "q", "comment"],
    "": [],
    "   ": [],
    "UPPER lower 123 a1B2": ["upper", "lower", "123", "a1", "b2"],
}


def test_pure_python_fixtures():
    for text, want in FIXTURES.items():
        assert tokenize_text(text) == want, text


def test_pandas_matches_python():
    s = pd.Series(list(FIXTURES))
    got = tokenize_series(s).tolist()
    assert got == [FIXTURES[t] for t in FIXTURES]


def test_spark_matches_python(spark):
    df = spark.createDataFrame([(t,) for t in FIXTURES], "text string")
    rows = df.select("text", tokens_array("text").alias("toks")).collect()
    for r in rows:
        assert r.toks == FIXTURES[r.text], r.text


def test_duckdb_matches_python():
    con = duckdb.connect()
    for text, want in FIXTURES.items():
        got = con.execute(
            f"SELECT {duckdb_tokens_expr('?::VARCHAR')}", [text]).fetchone()[0]
        assert got == want, text


def test_partition_invariance(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = tokens_exploded(docs.repartition(1)).orderBy("doc_id", "pos").collect()
    b = tokens_exploded(docs.repartition(7)).orderBy("doc_id", "pos").collect()
    assert a == b


def test_positions_one_based(spark):
    df = spark.createDataFrame([(1, "alpha beta")], "doc_id long, text string")
    rows = tokens_exploded(df).orderBy("pos").collect()
    assert [(r.pos, r.term) for r in rows] == [(1, "alpha"), (2, "beta")]


def test_arrow_matches_python():
    import pyarrow as pa

    from pke_spark.tokenizer import arrow_tokenize_batch

    batch = pa.RecordBatch.from_arrays(
        [pa.array(range(len(FIXTURES)), pa.int64()),
         pa.array(list(FIXTURES))],
        names=["doc_id", "text"])
    out = arrow_tokenize_batch(batch)
    got: dict[int, list[str]] = {}
    for d, t in zip(out.column("doc_id").to_pylist(),
                    out.column("term").to_pylist()):
        got.setdefault(d, []).append(t)
    for i, text in enumerate(FIXTURES):
        assert got.get(i, []) == FIXTURES[text], text


def test_arrow_spark_path_matches_catalyst(spark, sf_dir):
    from pke_spark.tokenizer import arrow_tokens_exploded

    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "text").limit(50))
    want = sorted((r.doc_id, r.term)
                  for r in tokens_exploded(docs).collect())
    got = sorted((r.doc_id, r.term)
                 for r in arrow_tokens_exploded(docs).collect())
    assert got == want
