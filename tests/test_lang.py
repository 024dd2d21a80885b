"""Multi-language stoplist/stemmer hooks (pke/lang.py:23-47,
pke/base.py:110-123)."""

from __future__ import annotations

import logging

from pke_spark import lang
from pke_spark.tokenizer import CODE_STOPLISTS, TEXT_STOPWORDS, tokenize_text


def test_langcodes_match_reference_surface():
    # same 13 supported langcodes as pke/lang.py (ar/hu commented out
    # there too)
    assert set(lang.LANGCODES) == {"da", "nl", "en", "fi", "fr", "de",
                                   "it", "nb", "pt", "ro", "ru", "es",
                                   "sv"}
    assert lang.LANGCODES["en"] == "english"
    assert lang.LANGCODES["fr"] == "french"


def test_stoplist_resolution_order():
    assert lang.stoplist_for("python") == CODE_STOPLISTS["python"]
    assert "le" in lang.stoplist_for("fr")
    assert "der" in lang.stoplist_for("de")
    assert lang.stoplist_for("en") == TEXT_STOPWORDS
    assert lang.stoplist_for("zz") == TEXT_STOPWORDS  # unknown -> default
    # every natural-language entry survives its OWN language's
    # tokenizer profile unchanged (real accented/Cyrillic forms since
    # the Unicode profiles landed)
    from pke_spark.tokenizer import profile_for
    for code, words in lang.STOPWORDS.items():
        prof = profile_for(code)
        for w in words:
            assert tokenize_text(w, prof) == [w], (code, prof, w)


def test_stemmer_fallback_semantics(caplog):
    assert lang.stemmer_name_for("en") == "porter"
    # fr/de/es now dispatch to the implemented Snowball variants
    assert lang.stemmer_name_for("fr") == "french"
    with caplog.at_level(logging.WARNING):
        assert lang.stemmer_name_for("zz") == "porter"
    assert "falling back to porter" in caplog.text
    with caplog.at_level(logging.WARNING):
        assert lang.stemmer_name_for("xx") == "porter"
