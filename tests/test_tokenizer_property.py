"""Property-based reader-equivalence: for arbitrary text, the pandas
and DuckDB tokenizer implementations agree with the pure-python spec
(the Spark Column impl is covered against the same spec in
test_tokenizer.py; this closes the loop without a JVM)."""

from __future__ import annotations

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from pke_spark.tokenizer import (duckdb_tokens_expr, tokenize_series,
                                 tokenize_text)

text_strategy = st.text(
    alphabet=st.characters(codec="ascii", min_codepoint=9, max_codepoint=126),
    max_size=200)


@given(text_strategy)
@settings(max_examples=200, deadline=None)
def test_pandas_equals_python(text):
    assert tokenize_series(pd.Series([text])).iloc[0] == tokenize_text(text)


_con = duckdb.connect()


@given(text_strategy)
@settings(max_examples=200, deadline=None)
def test_duckdb_equals_python(text):
    got = _con.execute(
        f"SELECT {duckdb_tokens_expr('?::VARCHAR')}", [text]).fetchone()[0]
    assert got == tokenize_text(text)
