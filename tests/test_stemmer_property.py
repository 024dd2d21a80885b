"""Property-based checks (hypothesis) for the Porter stemmer and the
Levenshtein helper — the reference's test style has no property tests
(SURVEY §5), but the engine's primitives run on arbitrary corpus bytes
and must be total."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from pke_spark.ops.yake import levenshtein
from pke_spark.stemmer import porter_stem

words = st.text(st.characters(min_codepoint=48, max_codepoint=122),
                min_size=0, max_size=24)


@settings(max_examples=300, deadline=None)
@given(words)
def test_porter_total_and_case_insensitive(w):
    s = porter_stem(w)
    assert isinstance(s, str)
    assert s == s.lower()
    assert porter_stem(w.upper()) == porter_stem(w.lower()) == s
    assert len(s) <= max(len(w), 1)


@settings(max_examples=200, deadline=None)
@given(words, words)
def test_levenshtein_metric_properties(a, b):
    d = levenshtein(a, b)
    assert d == levenshtein(b, a)
    assert (d == 0) == (a == b)
    assert abs(len(a) - len(b)) <= d <= max(len(a), len(b))


@settings(max_examples=100, deadline=None)
@given(words, words, words)
def test_levenshtein_triangle(a, b, c):
    assert levenshtein(a, c) <= levenshtein(a, b) + levenshtein(b, c)
