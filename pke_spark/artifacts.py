"""pke artifact-format compatibility: the gzipped TSV document-frequency
table with the magic ``--NB_DOC--`` row (written by
``compute_document_frequency``, pke/utils.py:126-139; read by
``load_document_frequency_file``, pke/utils.py:29-60; format documented
in docs/source/tutorials/df.rst). A user migrating from the reference
can export our term_stats into the exact file their pke pipelines
consume, and import their existing tables.

Driver-side by design: the artifact is a single gzip file (the
reference's own format); at engine scale the native term_stats parquet
is the source of truth and this is an interchange export.
"""

from __future__ import annotations

import csv
import gzip

from pyspark.sql import DataFrame, SparkSession
from .rows import rows_df

NB_DOC_KEY = "--NB_DOC--"


def write_df_tsv_gz(term_stats: DataFrame, n_docs: int, path: str,
                    delimiter: str = "\t") -> None:
    """term_stats (term, df) -> pke-format gzip TSV with --NB_DOC-- row."""
    rows = term_stats.select("term", "df").collect()
    with gzip.open(path, "wt", encoding="utf-8", newline="") as f:
        w = csv.writer(f, delimiter=delimiter)
        w.writerow([NB_DOC_KEY, int(n_docs)])
        for r in sorted(rows, key=lambda r: r.term):
            w.writerow([r.term, int(r.df)])


def read_df_tsv_gz(path: str, delimiter: str = "\t") -> tuple[dict, int]:
    """pke-format gzip (or plain) TSV -> ({term: df}, n_docs).
    Mirrors load_document_frequency_file incl. the gzip sniff."""
    opener = gzip.open if path.endswith(".gz") else open
    freqs: dict[str, int] = {}
    n_docs = 0
    with opener(path, "rt", encoding="utf-8") as f:
        for line in csv.reader(f, delimiter=delimiter):
            if not line:
                continue
            if line[0] == NB_DOC_KEY:
                n_docs = int(line[1])
            else:
                freqs[line[0]] = int(line[1])
    return freqs, n_docs


def df_table_to_spark(spark: SparkSession, path: str) -> tuple[DataFrame, int]:
    """Import a pke DF artifact as a (term, df) DataFrame + corpus size."""
    freqs, n_docs = read_df_tsv_gz(path)
    df = rows_df(spark, [(t, int(v)) for t, v in sorted(freqs.items())],
                 "term string, df long")
    return df, n_docs
