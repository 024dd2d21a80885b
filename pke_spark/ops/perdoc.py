"""Per-document ranking executor: tokenize inside the map pass.

The graph/topic family's previous physical plan was
``tokens_exploded -> Exchange(hash doc_id) -> applyInPandas(doc fn)``:
a JVM tokenize + posexplode of the corpus, a shuffle of every token
row, and a per-GROUP Arrow<->pandas conversion (one tiny frame per
document). A document's token sequence is derivable from its own row,
so this executor tokenizes inside the SAME Python pass that ranks
(``tokenize_series``, the pandas member of the lockstep tokenizer
quartet) and builds ONE output frame per Arrow batch instead of per
document — guide §2.3 (ship the text once, not its exploded tokens)
plus §4 (amortize the Python boundary over batches).

The one remaining exchange is a hash repartition of the
(doc_id, text) rows. It exists to spread the Python work across cores
even when the input scan has few splits (a sub-4MB parquet file is a
single split under the openCost packing rule, which would serialize
the whole pass), and it moves strictly fewer bytes than the token-row
shuffle it replaces. The partition count is EXPLICIT —
max(spark.sql.shuffle.partitions, input scan splits) — because AQE's
byte-based coalescing is exactly wrong for this stage: the per-doc
ranking cost is proportional to documents, not bytes, so coalescing a
sub-MB text shuffle back to one partition (measured: yake_full 9.3s
-> 1.5s once pinned) serializes minutes of Python behind a
kilobyte-sized heuristic. Both inputs of the max scale with the
session/cluster, not with this sandbox.

``row_fn(doc_id, terms) -> list[tuple]`` receives the document's term
sequence (positions are implicitly the dense 1-based token order, the
same values ``tokens_exploded`` emits) and returns finished output
rows. Documents whose ``row_fn`` yields no rows simply contribute
nothing, matching the old groupBy semantics for token-less docs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_DTYPES = {"long": "int64", "int": "int32",
           "double": "float64", "string": "object",
           "array<long>": "object"}


def spread_docs(docs: DataFrame, cols=("doc_id", "text")) -> DataFrame:
    """Hash-repartition the doc rows with an EXPLICIT partition count
    (see module docstring) so a compute-bound Python pass never
    serializes behind AQE's byte-based coalescing."""
    spark = docs.sparkSession
    n = max(int(spark.conf.get("spark.sql.shuffle.partitions", "200")),
            docs.rdd.getNumPartitions())
    return docs.select(*cols).repartition(n, "doc_id")


def per_doc_rows(docs: DataFrame, row_fn, schema: str,
                 profile: str = "code",
                 extra_cols: tuple = ()) -> DataFrame:
    """``extra_cols``: additional per-doc input columns forwarded to
    ``row_fn(doc_id, terms, *extras)`` (e.g. TPR's per-doc topic
    distribution)."""
    import pandas as pd

    from ..tokenizer import tokenize_series

    fields = [f.strip().split() for f in schema.split(",")]
    names = [n for n, _t in fields]
    dtypes = {n: _DTYPES[t] for n, t in fields}

    def gen(pdf_iter):
        for pdf in pdf_iter:
            toks = tokenize_series(pdf["text"], profile)
            rows: list[tuple] = []
            for did, tl, *extras in zip(pdf["doc_id"], toks,
                                        *[pdf[c] for c in extra_cols]):
                rows.extend(row_fn(int(did), tl, *extras))
            if rows:
                yield pd.DataFrame(rows, columns=names).astype(dtypes)
            else:
                yield pd.DataFrame({n: pd.Series(dtype=dtypes[n])
                                    for n in names})

    return spread_docs(docs, ("doc_id", "text", *extra_cols)) \
        .mapInPandas(gen, schema)
