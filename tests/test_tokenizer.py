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


# ---------------------------------------------------------------------
# Unicode tokenizer profiles (VERDICT r3 item 5): per-script token
# classes, lockstep across all four implementations + the DuckDB twin.
# ---------------------------------------------------------------------

CYRILLIC_FIXTURE = [
    (1, "Быстрая локализация ошибок: анализ логов в Spark"),
    (2, "Индексы и поиск — построение инвертированного индекса"),
    (3, "token_counts считает токены; функция getTokenCounts"),
    (4, "Ёлка, ещё ёж... причём здесь Ё?"),
    (5, ""),
]

LATIN_FIXTURE = [
    (1, "L'été à Paris: où trouver les cafés?"),
    (2, "Größenänderung der Straße, äöü ÄÖÜ ß"),
    (3, "mañana habrá más niños — ¡qué día!"),
    (4, "œuvre cœur naïve façade"),
]


def _lockstep(spark, rows, profile):
    from pke_spark.tokenizer import (arrow_tokenize_batch, duckdb_toks_cte,
                                     duckdb_tokens_expr, tokenize_series,
                                     tokenize_text, tokens_array_profiled)
    import duckdb
    import pandas as pd
    import pyarrow as pa

    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    # 1) single-string
    want = {i: tokenize_text(t, profile) for i, t in rows}
    # 2) pandas
    got_pd = dict(zip(pdf.doc_id, tokenize_series(pdf.text, profile)))
    assert got_pd == want
    # 3) Spark Catalyst
    df = spark.createDataFrame(pdf)
    got_sp = {r.doc_id: list(r.toks) for r in df.select(
        "doc_id", tokens_array_profiled("text", profile).alias("toks")
    ).collect()}
    assert got_sp == want
    # 4) Arrow-native
    rb = pa.RecordBatch.from_pandas(pdf)
    out = arrow_tokenize_batch(rb, profile=profile)
    got_ar: dict[int, list[str]] = {i: [] for i, _ in rows}
    for i, t in zip(out.column("doc_id").to_pylist(),
                    out.column("term").to_pylist()):
        got_ar[i].append(t)
    assert got_ar == {i: v for i, v in want.items()}
    # 5) DuckDB twin
    con = duckdb.connect()
    con.register("docs", pdf)
    got_dk = dict(con.execute(
        "SELECT doc_id, "
        + duckdb_tokens_expr("text", profile)
        + " FROM docs ORDER BY doc_id").fetchall())
    assert got_dk == want
    return want


def test_cyrillic_profile_lockstep(spark):
    want = _lockstep(spark, CYRILLIC_FIXTURE, "cyrillic")
    # sanity: Cyrillic text actually tokenizes (the old ASCII spec
    # returned nothing here), mixed-script identifiers survive
    assert want[1][0] == "быстрая"
    assert "spark" in want[1]
    assert "token_counts" not in want[3]  # _ splits in all profiles
    assert "gettokencounts" in want[3]    # no camel split in cyrillic
    assert want[4][:3] == ["ёлка", "ещё", "ёж"]
    assert want[5] == []


def test_latin_profile_lockstep(spark):
    want = _lockstep(spark, LATIN_FIXTURE, "latin")
    assert want[1][:2] == ["l", "été"]
    assert "cafés" in want[1]
    assert "größenänderung" in want[2]
    assert "ß" in want[2]  # uppercase ÄÖÜ lower to äöü, ß kept
    assert "mañana" in want[3]
    assert want[4] == ["œuvre", "cœur", "naïve", "façade"]


def test_code_profile_unchanged(spark):
    """The default profile is byte-identical to the original spec."""
    from pke_spark.tokenizer import tokenize_text, tokens_array
    from pke_spark import tokenizer
    s = "HTMLParser getTokenCounts snake_case x2"
    assert tokenize_text(s) == tokenize_text(s, "code") == [
        "html", "parser", "get", "token", "counts", "snake", "case", "x2"]
    assert tokenizer.profile_for("ru") == "cyrillic"
    assert tokenizer.profile_for("fr") == "latin"
    assert tokenizer.profile_for("python") == "code"
    assert tokenizer.profile_for("en") == "code"
