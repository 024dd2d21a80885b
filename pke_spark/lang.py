"""Language resources (pke/lang.py:23-47 + pke/base.py:110-123).

The reference supports 14 natural languages: a spacy stoplist per
langcode and an NLTK Snowball stemmer named by ``langcodes[lang]``,
with English mapped to 'porter' and unavailable languages falling back
to Porter with a warning (base.py:111-119).

The engine mirrors that surface:

- ``LANGCODES``: the same 14 langcode -> stemmer-language map.
- ``STOPWORDS``: compact core function-word lists per language
  (public-knowledge Snowball-style lists; spacy is not available in
  this environment and its full lists are ~10x longer — callers with a
  full list pass it straight to any ``stoplist=`` parameter, every
  operator takes the list as data, not as a langcode).
- ``stoplist_for``: langcode -> stoplist, checking the code-language
  keyword lists first (the "stopwords of code", tokenizer.py), then
  the natural-language table, then the English default.
- ``stemmer_name_for``: exactly pke's fallback semantics — 'en' ->
  'porter'; a language with no implemented stemmer ALSO -> 'porter',
  with a logged warning (the engine implements the 1980 Porter
  algorithm, stemmer.py; Snowball variants are data-driven rule sets
  the same vectorized machinery could host).

Script note: the tokenizer ships per-script PROFILES (tokenizer.py):
'code' (ASCII + camel splits, the default), 'latin' (accented Latin
letters for fr/de/es/it/pt/...), and 'cyrillic' ('ru') — all four
implementations + the DuckDB twin stay in lockstep per profile
(tests/test_tokenizer.py); ``tokenizer.profile_for(lang)`` resolves
the profile the way ``stemmer_name_for`` resolves the stemmer.
"""

from __future__ import annotations

import logging

from .tokenizer import CODE_STOPLISTS, TEXT_STOPWORDS

# pke/lang.py:23-47 (same codes, same stemmer names)
LANGCODES: dict[str, str] = {
    "da": "danish",
    "nl": "dutch",
    "en": "english",
    "fi": "finnish",
    "fr": "french",
    "de": "german",
    "it": "italian",
    "nb": "norwegian",
    "pt": "portuguese",
    "ro": "romanian",
    "ru": "russian",
    "es": "spanish",
    "sv": "swedish",
}

# compact core function-word lists (public Snowball-style subsets)
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": TEXT_STOPWORDS,
    "fr": ("le", "la", "les", "un", "une", "des", "de", "du", "et", "ou",
           "mais", "dans", "sur", "pour", "par", "avec", "sans", "est",
           "sont", "que", "qui", "quoi", "ce", "cette", "ces", "il",
           "elle", "nous", "vous", "ils", "elles", "ne", "pas", "plus",
           "au", "aux", "se", "sa", "son", "ses", "leur", "en", "y"),
    "de": ("der", "die", "das", "ein", "eine", "einer", "eines", "und",
           "oder", "aber", "in", "im", "an", "am", "auf", "mit", "ohne",
           "ist", "sind", "war", "waren", "dass", "nicht", "von", "vom",
           "zu", "zum", "zur", "den", "dem", "des", "er", "sie", "es",
           "wir", "ihr", "sich", "auch", "als", "wie", "bei"),
    "es": ("el", "la", "los", "las", "un", "una", "unos", "unas", "de",
           "del", "y", "o", "pero", "en", "con", "sin", "por", "para",
           "es", "son", "que", "se", "su", "sus", "no", "al", "lo",
           "como", "mas", "este", "esta", "estos", "estas", "ya"),
    "it": ("il", "lo", "la", "i", "gli", "le", "un", "una", "uno", "di",
           "del", "della", "e", "o", "ma", "in", "con", "senza", "per",
           "su", "che", "chi", "si", "non", "al", "dal", "nel", "sono",
           "come", "questo", "questa", "anche", "piu"),
    "pt": ("o", "a", "os", "as", "um", "uma", "uns", "umas", "de", "do",
           "da", "dos", "das", "e", "ou", "mas", "em", "no", "na", "nos",
           "nas", "com", "sem", "por", "para", "que", "se", "nao", "ao",
           "como", "este", "esta", "isso", "mais"),
    "nl": ("de", "het", "een", "en", "of", "maar", "in", "op", "aan",
           "met", "zonder", "voor", "door", "is", "zijn", "was", "waren",
           "dat", "die", "dit", "niet", "van", "te", "ten", "ter", "hij",
           "zij", "wij", "ook", "als", "bij", "naar", "om"),
    "da": ("den", "det", "de", "en", "et", "og", "eller", "men", "i",
           "på", "til", "med", "uden", "for", "af", "er", "var", "at",
           "som", "der", "ikke", "han", "hun", "vi", "også", "om",
           "ved", "fra", "har", "havde"),
    "sv": ("den", "det", "de", "en", "ett", "och", "eller", "men", "i",
           "på", "till", "med", "utan", "för", "av", "är", "var",
           "att", "som", "inte", "han", "hon", "vi", "också", "om",
           "vid", "från", "har", "hade"),
    "nb": ("den", "det", "de", "en", "et", "ei", "og", "eller", "men",
           "i", "på", "til", "med", "uten", "for", "av", "er", "var",
           "at", "som", "ikke", "han", "hun", "vi", "også", "om",
           "ved", "fra", "har", "hadde"),
    "fi": ("ja", "tai", "mutta", "ei", "on", "oli", "ovat", "olivat",
           "se", "ne", "tämä", "joka", "mikä", "että", "kun", "jos",
           "hän", "me", "te", "he", "myös", "vain", "kanssa", "ilman"),
    "ro": ("un", "o", "unui", "unei", "și", "sau", "dar", "în", "pe",
           "la", "cu", "fără", "pentru", "de", "din", "este", "sunt",
           "era", "că", "care", "ce", "nu", "se", "el", "ea", "noi",
           "voi", "ei", "ele", "mai", "acest", "această"),
    "ru": ("и", "в", "на", "с", "по", "за", "от", "до", "из", "не",
           "что", "как", "это", "он", "она", "они", "мы", "вы", "но",
           "или", "же", "бы", "к", "у", "о"),
}


def stoplist_for(lang: str) -> tuple[str, ...]:
    """langcode -> stoplist: code-language keywords first, then the
    natural-language table, then the English default (the resolution
    order a mixed code+docs corpus wants)."""
    if lang in CODE_STOPLISTS:
        return CODE_STOPLISTS[lang]
    return STOPWORDS.get(lang, TEXT_STOPWORDS)


# Snowball variants the engine implements from the published specs
# (pke_spark/snowball.py); the rest keep pke's Porter fallback
IMPLEMENTED_SNOWBALL = frozenset({
    "spanish", "french", "german", "russian", "dutch", "swedish",
    "norwegian", "danish", "italian", "portuguese", "romanian",
    "finnish"})


def stemmer_name_for(lang: str) -> str:
    """pke/base.py:111-119 semantics: english -> 'porter'; implemented
    Snowball languages dispatch to their variant; any language whose
    Snowball variant is not implemented falls back to 'porter' with a
    warning (never an error)."""
    name = LANGCODES.get(lang)
    if name is None:
        logging.warning(
            "No stemmer available for %r -> falling back to porter "
            "stemmer.", lang)
        return "porter"
    if name == "english":
        return "porter"
    if name in IMPLEMENTED_SNOWBALL:
        return name
    logging.warning(
        "Snowball '%s' not implemented -> falling back to porter "
        "stemmer (pke/base.py:111-119 fallback).", name)
    return "porter"
