"""CoreNLP XML ingestion (S8 — the reference's
``read_corenlp_xml``, examples/compute-df-counts.py:24-45): parse
Stanford CoreNLP annotation XML into the engine's tagged token stream
(doc_id, sent_id, pos, term, tag, lemma), feeding the grammar candidate
path (C6) and any token-level operator.

Distributed shape: documents arrive as (doc_id, xml string) rows (e.g.
``spark.read.text`` with wholetext, or a binary-file scan of an XML
corpus); parsing runs in mapInPandas with stdlib ElementTree — one
Arrow batch of XML strings in, one batch of token rows out, no driver
loop. The XML path structure (`./document/sentences/sentence`,
`tokens/token/{word,lemma,POS}`) matches the reference exactly.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame


def parse_corenlp_xml(xml_text: str) -> list[tuple]:
    """One CoreNLP XML document -> [(sent_id, pos_in_doc, word, tag,
    lemma)] with document-level 1-based positions (P4 offset shift)."""
    import xml.etree.ElementTree as etree
    root = etree.fromstring(xml_text)
    out = []
    pos = 0
    for i, sentence in enumerate(root.iterfind("./document/sentences/sentence")):
        # walk per-token ELEMENTS (not parallel word/POS/lemma lists):
        # a token missing its <POS> or <lemma> child must degrade only
        # that token, not shift every later token's tag (zip over
        # separately-collected lists silently misaligns on the first
        # absent child)
        for tok in sentence.iterfind("tokens/token"):
            w = tok.findtext("word")
            if w is None:
                continue
            t = tok.findtext("POS", default="")
            le = tok.findtext("lemma", default=w.lower())
            pos += 1
            out.append((i, pos, w, t, le))
    return out


# Penn Treebank -> Universal POS for the tags the grammar path gates on
# (NOUN/PROPN/ADJ/ADP), the mapping spaCy would have applied upstream
_PTB_TO_UPOS = {
    "NN": "NOUN", "NNS": "NOUN", "NNP": "PROPN", "NNPS": "PROPN",
    "JJ": "ADJ", "JJR": "ADJ", "JJS": "ADJ", "IN": "ADP", "TO": "ADP",
}


def corenlp_tokens(xml_docs: DataFrame, id_col: str = "doc_id",
                   xml_col: str = "xml",
                   universal_pos: bool = True) -> DataFrame:
    """(doc_id, xml) -> (doc_id, sent_id, pos, term, tag, lemma); term
    is the lowercased surface word; ``universal_pos`` maps Penn Treebank
    tags onto the Universal tags pke's grammars expect."""

    def fn(pdf_iter):
        for pdf in pdf_iter:
            rows = []
            for r in pdf.itertuples(index=False):
                for sent_id, pos, w, t, le in parse_corenlp_xml(
                        getattr(r, xml_col)):
                    tag = _PTB_TO_UPOS.get(t, "X") if universal_pos else t
                    rows.append((getattr(r, id_col), sent_id, pos,
                                 w.lower(), tag, le))
            yield pd.DataFrame(rows, columns=["doc_id", "sent_id", "pos",
                                              "term", "tag", "lemma"])

    return xml_docs.select(id_col, xml_col).mapInPandas(
        fn, "doc_id long, sent_id int, pos int, term string, "
            "tag string, lemma string")
