"""Driver-side row lists -> DataFrame, the LocalRelation way.

``spark.createDataFrame(list_of_tuples, schema)`` parallelizes the rows
into an RDD: every downstream action (even ``collect()`` of 10 rows)
schedules a real Spark job (~0.3 s in local mode), and inside a bigger
plan the rows appear as a ``Scan ExistingRDD`` that cannot be
constant-folded. Routing the same rows through a pandas DataFrame (+
Arrow) produces a **LocalRelation**: collect/count are driver-local
(~ms) and side-input joins see a plain ``LocalTableScan``. Values are
identical — Arrow casts to the exact declared schema; tests cover the
empty / None / array cases.

Used by every serving-path wrapper that lifts native driver results
(top-k tuples, term stats, query-term lists) into DataFrames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

_SCHEMA_CACHE: dict[str, StructType] = {}


def rows_df(spark: SparkSession, rows, schema: str | StructType) -> DataFrame:
    """Small driver-side ``rows`` (iterable of tuples) + schema ->
    LocalRelation-backed DataFrame (no parallelize job)."""
    import pandas as pd

    if isinstance(schema, str):
        st = _SCHEMA_CACHE.get(schema)
        if st is None:
            st = StructType.fromDDL(schema)
            _SCHEMA_CACHE[schema] = st
    else:
        st = schema
    data = [tuple(r) for r in rows]
    pdf = pd.DataFrame.from_records(data, columns=[f.name for f in st.fields])
    return spark.createDataFrame(pdf, st)
