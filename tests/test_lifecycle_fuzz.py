"""Lifecycle differential fuzzer (VERDICT r4 #7): compose the pieces
the suite already tests in isolation — stream appends, incremental
fold, tombstone deletes, purge, positional rebuild, full query-string
grammar — into ONE randomized end-to-end lifecycle, and assert the
index serving path stays row-identical to the corpus DataFrame plan on
the surviving documents. Cross-feature interactions (a fold followed
by a purge followed by a phrase query over re-built positions) are
exactly where isolated tests have no coverage.

Each example: random corpus -> build index on a prefix -> two stream
epochs -> LSM incremental fold -> random tombstones -> purge (stats
recomputed exactly) -> positional sidecar rebuild -> random
grammar-valid query strings, index vs corpus.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from pke_spark.index import serving as SV
from pke_spark.index.build import IndexReader, build_index
from pke_spark.index.delete import delete_docs, purge_deleted
from pke_spark.index.positions import build_positions
from pke_spark.ops import querylang as QL
from pke_spark.streaming import append_batch, refresh_postings
from tests.test_querylang import _querystrings

# overlaps the _querystrings fuzz vocab (alphabet a-j) so random
# queries actually hit documents
VOCAB = ["aa", "bb", "cc", "dd", "ee", "ff", "abc", "bcd", "cde",
         "dea", "eab", "fab", "aabb", "bbcc"]

SCHEMA = ("doc_id long, text string, lang string, source string, "
          "n_chars long")


@settings(max_examples=5, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(data=st.data())
def test_lifecycle_differential_fuzz(spark, tmp_path, data):
    n = data.draw(st.integers(min_value=12, max_value=18))
    rows = [
        (i,
         " ".join(data.draw(st.lists(st.sampled_from(VOCAB),
                                     min_size=3, max_size=8))),
         ["en", "fr"][i % 2], f"s{i % 3}", 100 + 37 * i)
        for i in range(n)
    ]
    docs = spark.createDataFrame(rows, SCHEMA)

    ex = data.draw(st.integers(min_value=0, max_value=10 ** 6))
    d = str(tmp_path / f"ix_{ex}")
    split = data.draw(st.integers(min_value=4, max_value=n - 4))
    mid = (split + n + 1) // 2

    build_index(docs.filter(F.col("doc_id") < split)
                .select("doc_id", "text"), d, n_parts=2, n_salts=2)
    append_batch(docs.filter((F.col("doc_id") >= split)
                             & (F.col("doc_id") < mid))
                 .select("doc_id", "text"), d, epoch_id=1, n_parts=2)
    append_batch(docs.filter(F.col("doc_id") >= mid)
                 .select("doc_id", "text"), d, epoch_id=2, n_parts=2)
    refresh_postings(spark, d, n_salts=2, incremental=True)

    dead = sorted(data.draw(st.sets(
        st.integers(min_value=0, max_value=n - 1), max_size=n // 3)))
    if dead:
        delete_docs(spark, d, dead)
        # purge recomputes n_docs/avgdl/df exactly from the survivors,
        # so the corpus twin below needs no df caveat
        assert purge_deleted(spark, d) == len(dead)
    survivors = docs.filter(~F.col("doc_id").isin([int(x) for x in dead])) \
        if dead else docs
    build_positions(survivors.select("doc_id", "text"), d, n_salts=2)
    pq_dir = str(tmp_path / f"docs_{ex}.parquet")
    survivors.coalesce(1).write.parquet(pq_dir)

    ix = IndexReader(spark, d)
    assert ix.n_docs == survivors.count()
    for _ in range(2):
        qs = data.draw(_querystrings())
        want = [(r["rank"], int(r["doc_id"]), float(r["score"]))
                for r in QL.querystring_topk(survivors, qs, 10).collect()]
        got = SV.querystring_search_indexed(
            ix, qs, 10, docs_parquet=f"{pq_dir}/*.parquet")
        assert got == want, (qs, dead, split)
