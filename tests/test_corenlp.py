"""CoreNLP XML reader (S8): fixture XML (same element structure as the
reference's tests/data/*.xml) -> tagged token stream -> grammar
candidates end to end."""

from __future__ import annotations

from pke_spark.ops import corenlp, grammar

XML = """<?xml version="1.0" encoding="UTF-8"?>
<root>
  <document>
    <sentences>
      <sentence id="1">
        <tokens>
          <token id="1"><word>Fast</word><lemma>fast</lemma>
            <CharacterOffsetBegin>0</CharacterOffsetBegin>
            <CharacterOffsetEnd>4</CharacterOffsetEnd><POS>JJ</POS></token>
          <token id="2"><word>Spark</word><lemma>Spark</lemma>
            <CharacterOffsetBegin>5</CharacterOffsetBegin>
            <CharacterOffsetEnd>10</CharacterOffsetEnd><POS>NNP</POS></token>
          <token id="3"><word>engines</word><lemma>engine</lemma>
            <CharacterOffsetBegin>11</CharacterOffsetBegin>
            <CharacterOffsetEnd>18</CharacterOffsetEnd><POS>NNS</POS></token>
          <token id="4"><word>scale</word><lemma>scale</lemma>
            <CharacterOffsetBegin>19</CharacterOffsetBegin>
            <CharacterOffsetEnd>24</CharacterOffsetEnd><POS>VBP</POS></token>
        </tokens>
      </sentence>
      <sentence id="2">
        <tokens>
          <token id="1"><word>of</word><lemma>of</lemma>
            <CharacterOffsetBegin>26</CharacterOffsetBegin>
            <CharacterOffsetEnd>28</CharacterOffsetEnd><POS>IN</POS></token>
          <token id="2"><word>big</word><lemma>big</lemma>
            <CharacterOffsetBegin>29</CharacterOffsetBegin>
            <CharacterOffsetEnd>32</CharacterOffsetEnd><POS>JJ</POS></token>
          <token id="3"><word>corpora</word><lemma>corpus</lemma>
            <CharacterOffsetBegin>33</CharacterOffsetBegin>
            <CharacterOffsetEnd>40</CharacterOffsetEnd><POS>NNS</POS></token>
        </tokens>
      </sentence>
    </sentences>
  </document>
</root>"""


def test_parse_corenlp_xml():
    rows = corenlp.parse_corenlp_xml(XML)
    assert rows == [
        (0, 1, "Fast", "JJ", "fast"), (0, 2, "Spark", "NNP", "Spark"),
        (0, 3, "engines", "NNS", "engine"), (0, 4, "scale", "VBP", "scale"),
        (1, 5, "of", "IN", "of"), (1, 6, "big", "JJ", "big"),
        (1, 7, "corpora", "NNS", "corpus"),
    ]


def test_corenlp_to_grammar_candidates(spark):
    docs = spark.createDataFrame([(7, XML)], "doc_id long, xml string")
    toks = corenlp.corenlp_tokens(docs)
    got = {(r.doc_id, r.pos): (r.term, r.tag) for r in toks.collect()}
    assert got[(7, 2)] == ("spark", "PROPN")
    assert got[(7, 5)] == ("of", "ADP")
    cands = {r.candidate: (r.tf, r.first_offset, r.n_words)
             for r in grammar.grammar_candidates_from_tagged(toks).collect()}
    # runs: [fast spark engines] (JJ NNP NNS, head=engines), [big corpora]
    assert cands == {"fast spark engines": (1, 1, 3),
                     "big corpora": (1, 6, 2)}


def test_missing_pos_degrades_only_that_token():
    """A token without a <POS> child must not shift later tokens' tags
    (regression: parallel-list zip silently misaligned)."""
    from pke_spark.ops.corenlp import parse_corenlp_xml

    xml = """<root><document><sentences><sentence id="1"><tokens>
      <token id="1"><word>alpha</word><POS>NN</POS><lemma>alpha</lemma></token>
      <token id="2"><word>beta</word><lemma>beta</lemma></token>
      <token id="3"><word>gamma</word><POS>JJ</POS><lemma>gamma</lemma></token>
    </tokens></sentence></sentences></document></root>"""
    rows = parse_corenlp_xml(xml)
    assert [(w, t) for _s, _p, w, t, _l in rows] == [
        ("alpha", "NN"), ("beta", ""), ("gamma", "JJ")]
    assert [p for _s, p, *_ in rows] == [1, 2, 3]
