"""WINGNUS F3 substring-tf semantics (J5): count substring-candidate
occurrences NOT covered by an occurrence of the full candidate
(wingnus.py:136-163), hand-traced fixture."""

from __future__ import annotations

from pke_spark.ops import wingnus


def test_f3_counts_uncovered_substring_occurrences(spark):
    # synthetic tagger: len%4 -> 0:ADJ 1:VERB else NOUN; stopwords ADP.
    # tokens: row(1) rowset(2) the(3) row(4) the(5) row(6) rowset(7)
    # 'row'(3)->NOUN, 'rowset'(6)->NOUN => runs [1-2], [4], [6-7]
    # candidates: 'row rowset' offsets [1,6]; 'row' offsets [4]
    # F3('row rowset'): substring 'row' occurs at 4, not covered by
    # [1..3] or [6..8] -> 1; 'rowset' alone is never a candidate.
    docs = spark.createDataFrame(
        [(1, "row rowset the row the row rowset")], "doc_id long, text string")
    feats = {r.candidate: r for r in wingnus.wingnus_features(docs).collect()}
    assert set(feats) == {"row rowset", "row"}
    assert feats["row rowset"].f3_substring_tf == 1
    assert feats["row rowset"].f2_tf == 2
    assert feats["row"].f3_substring_tf == 0
    assert feats["row rowset"].f6_n_words == 2
    # offsets are 1-based; doc has 7 tokens
    assert abs(feats["row rowset"].f4_rel_first - 1 / 7) < 1e-6
    assert abs(feats["row rowset"].f5_rel_last - 6 / 7) < 1e-6


def test_f3_covered_substring_not_counted(spark):
    # 'row rowset' at 1; standalone 'row' at 2? No — craft coverage:
    # tokens: row(1) rowset(2) row(3) rowset(4): one run 1-4, candidate
    # 'row rowset row rowset' offsets [1]; substrings 'row' / 'rowset' /
    # etc. are not standalone candidates (same run) -> F3 = 0
    docs = spark.createDataFrame(
        [(1, "row rowset row rowset")], "doc_id long, text string")
    feats = {r.candidate: r for r in wingnus.wingnus_features(docs).collect()}
    assert list(feats) == ["row rowset row rowset"]
    assert feats["row rowset row rowset"].f3_substring_tf == 0
