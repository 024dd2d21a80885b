"""Gold-reference loading + leave-one-out training masks (S6, M5) —
the engine analog of ``pke.utils.load_references`` (pke/utils.py:234-306)
and the LOO masks of ``train_supervised_model`` (pke/utils.py:221-231).

Formats (parsed driver-side like the reference — gold files are small
metadata — then handed to Spark as a (doc_id, gold) DataFrame):

- JSON: ``{doc_id: [[variant, ...], ...]}`` — variant lists flattened
  (utils.py:267-273).
- SemEval-2010: ``doc_id : kp1,kp2,...`` lines; a ``+`` inside a
  keyphrase splits alternative forms, each kept (utils.py:275-285).

``normalize=True`` Porter-stems every word of each keyphrase
(utils.py:287-297; SnowballStemmer('porter') -> pke_spark.stemmer).
``excluded_doc`` drops one document (utils.py:299-306, the reference's
excluded_file hook for leave-one-out).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession

from .stemmer import porter_stem
from .rows import rows_df


def _normalize(kp: str) -> str:
    return " ".join(porter_stem(w) for w in kp.split())


def load_references(spark: SparkSession, path: str, *,
                    sep_doc_id: str = ":", sep_ref_keyphrases: str = ",",
                    normalize: bool = False,
                    excluded_doc: str | None = None) -> DataFrame:
    """-> (doc_id string, gold string), one row per gold keyphrase."""
    rows: list[tuple[str, str]] = []
    if path.endswith(".json"):
        with open(path, encoding="utf-8") as f:
            data = json.load(f)
        for doc_id, variant_lists in data.items():
            for variants in variant_lists:
                for kp in variants:
                    rows.append((str(doc_id), kp))
    else:
        with open(path, encoding="utf-8") as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                cols = line.split(sep_doc_id)
                doc_id = cols[0].strip()
                for v in cols[1].strip().split(sep_ref_keyphrases):
                    if "+" in v:
                        rows.extend((doc_id, s) for s in v.split("+"))
                    else:
                        rows.append((doc_id, v))
    if normalize:
        rows = [(d, _normalize(kp)) for d, kp in rows]
    if excluded_doc is not None:
        rows = [(d, kp) for d, kp in rows if d != excluded_doc]
    return rows_df(spark, rows, "doc_id string, gold string")


def loo_folds(gold: DataFrame) -> list[tuple[str, DataFrame, DataFrame]]:
    """Leave-one-out folds over the gold set's documents (M5,
    utils.py:221-231): for each doc d, (d, gold-without-d, gold-of-d).
    The per-fold masks are DataFrame filters — the doc list itself is
    tiny driver metadata, exactly as in the reference."""
    doc_ids = [r.doc_id for r in gold.select("doc_id").distinct()
               .orderBy("doc_id").collect()]
    return [(d,
             gold.filter(gold.doc_id != d),
             gold.filter(gold.doc_id == d)) for d in doc_ids]
