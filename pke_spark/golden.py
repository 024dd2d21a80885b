"""Frozen-golden oracles for the non-SQL-expressible queries.

The iterative/ML queries (PageRank family, greedy dedup, NB fits, LDA
serving) cannot be *derived* in DuckDB SQL — their independent
verification lives in pytest (networkx parity in tests/test_graph_nx.py,
reference-transcription mirrors in tests/test_yake_full.py, numpy-NB
mirrors, brute-force ANN recall). What the driver gate additionally
needs is a machine-checkable value oracle, so each such query's sf0.01
output is FROZEN (scripts/freeze_goldens.py: computed, verified
bit-identical across local[8] vs local[32], committed as
tests/golden/<name>.json) and served to DuckDB as a VALUES literal.

These are regression oracles — "the output still equals the
independently-verified output" — not independent derivations; the
derivations remain the pytest mirrors. Goldens are only valid for the
sf0.01 inputs they were frozen on; `golden_oracle_sql` embeds no table
reference, so running the gate at another SF would (correctly) fail
rows_match rather than silently pass.
"""

from __future__ import annotations

import json
import os

import pandas as pd

# golden.py lives in pke_spark/, so dirname(dirname(...)) = repo root
GOLDEN_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "golden")

_CAST = {"int": "BIGINT", "float": "DOUBLE", "str": "VARCHAR"}


def normalize(df: pd.DataFrame) -> tuple[pd.DataFrame, dict[str, str]]:
    """The gate's canonical form: columns sorted by name, ints->int64,
    floats->round(6) float64, everything else ->str; rows sorted."""
    df = df[sorted(df.columns)]
    out, dtypes = {}, {}
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_float_dtype(s):
            out[c] = s.astype("float64").round(6)
            dtypes[c] = "float"
        elif pd.api.types.is_integer_dtype(s):
            out[c] = s.astype("int64")
            dtypes[c] = "int"
        else:
            out[c] = s.astype(str)
            dtypes[c] = "str"
    ndf = pd.DataFrame(out)
    ndf = ndf.sort_values(by=list(ndf.columns),
                          kind="mergesort").reset_index(drop=True)
    return ndf, dtypes


def golden_names(golden_dir: str = GOLDEN_DIR) -> list[str]:
    if not os.path.isdir(golden_dir):
        return []
    return sorted(f[:-5] for f in os.listdir(golden_dir)
                  if f.endswith(".json"))


def load_golden(name: str, golden_dir: str = GOLDEN_DIR) -> dict:
    with open(os.path.join(golden_dir, f"{name}.json")) as f:
        return json.load(f)


def _lit(v, dtype: str) -> str:
    if v is None:
        return f"NULL::{_CAST[dtype]}"
    if dtype == "str":
        return "'" + str(v).replace("'", "''") + "'"
    if dtype == "float":
        return repr(float(v))
    return str(int(v))


def golden_oracle_sql(name: str) -> str:
    """DuckDB SQL reproducing the frozen golden as a VALUES table."""
    g = load_golden(name)
    cols = g["columns"]
    dtypes = g["dtypes"]
    if not g["rows"]:
        casts = ", ".join(f"NULL::{_CAST[dtypes[c]]} AS {c}" for c in cols)
        return f"SELECT {casts} WHERE FALSE"
    rows_sql = ",\n".join(
        "(" + ", ".join(_lit(v, dtypes[c]) for c, v in zip(cols, row)) + ")"
        for row in g["rows"])
    collist = ", ".join(cols)
    # cast the first row's columns so DuckDB types match the gate's
    # normalize() (BIGINT/DOUBLE/VARCHAR)
    sel = ", ".join(f"CAST({c} AS {_CAST[dtypes[c]]}) AS {c}" for c in cols)
    return (f"SELECT {sel} FROM (VALUES\n{rows_sql}\n) AS g({collist})")


def golden_oracles() -> dict[str, str]:
    return {name: golden_oracle_sql(name) for name in golden_names()}
