"""Snowball Spanish/French/German stemmers vs hand-traced spec vectors.

NLTK is not available in this sandbox, so each expected value below was
derived by tracing the published Snowball algorithm description
(snowballstem.org) by hand — regions (R1/R2/RV) computed per the spec,
then each step applied in order. The spec, not another implementation,
is the oracle; a trace summary accompanies the non-obvious cases.
"""

from __future__ import annotations

import pandas as pd
import pytest

from pke_spark import lang
from pke_spark.snowball import french_stem, german_stem, spanish_stem
from pke_spark.stemmer import stem_series

# (word, stem, why)
SPANISH = [
    # rv=3; step1 fails ('iendo' not standard); 2b deletes 'iendo' in RV
    ("comiendo", "com", "2b gerund"),
    ("guerras", "guerr", "2b 'as'"),
    # 'icas' matched but starts before R2=5 -> step1 no-op; 2b 'as'
    ("lógicas", "logic", "longest-match rule blocks step1"),
    ("matemáticas", "matemat", "step1 'icas' in R2"),
    # step0: pronoun 'selo' after 'ár' in RV -> un-accent; 2b 'ar'
    ("quitárselo", "quit", "attached pronoun, case (a)"),
    ("nacionales", "nacional", "2b 'es'"),
    # step1 'idad' in R2; preceding 'ic' NOT in R2 -> kept
    ("felicidad", "felic", "idad; ic guard"),
    ("organización", "organiz", "step1 'ación'"),
    ("jugando", "jug", "2b 'ando'"),
    ("canciones", "cancion", "2b 'es'"),
    # 2a 'yo' starts before RV=3 -> fails; step3 'o'
    ("tuyo", "tuy", "step3 residual 'o'"),
    # step3 'e'; preceding 'qu' is not 'gu' -> u kept
    ("ataque", "ataqu", "step3; gu-guard negative"),
    ("el", "el", "len<=2 unchanged"),
]

GERMAN = [
    ("aufeinander", "aufeinand", "step1 'er'"),
    ("katzen", "katz", "step1 'en'"),
    # step1 'en', then the niss-rule undoubles the s
    ("verhältnissen", "verhaltnis", "niss rule + unumlaut"),
    ("bezüglich", "bezug", "step3 'lich' in R2"),
    # R2=9 = len -> 'heit' not in R2, word survives; umlaut removed
    ("schönheit", "schonheit", "R2 guard"),
    # step3 'keit' in R2, then preceding 'lich' also in R2
    ("unglaublichkeit", "unglaub", "keit + lich chain"),
    ("kindern", "kind", "step1 'ern'"),
    ("aufgabe", "aufgab", "step1 'e'"),
    # step1 's' (valid s-ending n), then step2 'en'
    ("mädchens", "madch", "s then en"),
    ("übereinstimmung", "ubereinstimm", "step3 'ung'"),
    # final s preceded by s: not a valid s-ending -> kept
    ("daß", "dass", "ss substitution; s-ending guard"),
    ("schreiben", "schreib", "step1 'en'"),
    # intervocalic u marked U (consonant): R1 becomes 3, 'en' strips
    ("bauen", "bau", "u-marking changes R1"),
]

FRENCH = [
    # step1/2 fail; step4 deletes s then e; step5 undoubles 'ell'
    ("continuelles", "continuel", "step4 + undouble"),
    ("majestueux", "majestu", "step1 'eux' in R2"),
    # 'euses' in R2 -> delete
    ("dangereuses", "danger", "step1 'euses'"),
    ("nationale", "national", "step4 'e'"),
    # 'aux' -> 'al' in R1 (pairs with nationale)
    ("nationaux", "national", "step1 'aux'->al"),
    ("émotions", "émot", "2b 'ions' in R2"),
    # 2b 'ée'; step5 undoubles 'onn'
    ("abandonnée", "abandon", "2b + undouble"),
    ("importantes", "import", "2b 'antes'"),
    # u-after-q marked U; 'ement' deleted in RV; 'iqU' guard not in R2
    ("logiquement", "logiqu", "qU marking + ement"),
    # 'par' prefix fixes RV=3; no verb suffix matches -> step4 s
    ("parlons", "parlon", "par-RV rule"),
    # 2b 'és'; step6 un-accents é before trailing consonant
    ("procédés", "proced", "step6 un-accent"),
    ("le", "le", "len<=2 unchanged"),
]


@pytest.mark.parametrize("word,want,why", SPANISH)
def test_spanish(word, want, why):
    assert spanish_stem(word) == want, why


@pytest.mark.parametrize("word,want,why", GERMAN)
def test_german(word, want, why):
    assert german_stem(word) == want, why


@pytest.mark.parametrize("word,want,why", FRENCH)
def test_french(word, want, why):
    assert french_stem(word) == want, why


def test_stem_series_dispatch():
    s = pd.Series(["katzen", "kindern"])
    assert list(stem_series(s, "german")) == ["katz", "kind"]
    s = pd.Series(["running"])
    assert list(stem_series(s)) == ["run"]


def test_lang_dispatch_and_fallback(caplog):
    assert lang.stemmer_name_for("en") == "porter"
    assert lang.stemmer_name_for("fr") == "french"
    assert lang.stemmer_name_for("de") == "german"
    assert lang.stemmer_name_for("es") == "spanish"
    # language outside the reference's table -> porter with a
    # warning (pke base.py:111-119 semantics); every IN-table language
    # now has its own Snowball implementation
    import logging
    with caplog.at_level(logging.WARNING):
        assert lang.stemmer_name_for("zz") == "porter"
    assert any("falling back to porter" in r.message for r in caplog.records)


def test_structural_properties():
    # stems never grow (all three algorithms only delete/shrink-replace
    # except eaux->eau/euse->eux which still never lengthen), are
    # lowercase, and marked letters never leak
    words = [w for w, _, _ in SPANISH + GERMAN + FRENCH]
    for fn in (spanish_stem, german_stem, french_stem):
        for w in words:
            out = fn(w)
            # ß->ss substitution may add one char; nothing else grows
            assert len(out) <= len(w) + w.count("ß")
            assert out == out.lower()
            assert not set(out) & set("UIY")


RUSSIAN = [
    ("книгами", "книг", "noun 'ами'"),
    ("красивые", "красив", "adjective 'ые'"),
    # adjective 'ие', then step2 removes the trailing и
    ("программирование", "программирован", "adj + step2"),
    ("быстрый", "быстр", "adjective 'ый'"),
    # perfective gerund group 1: 'вшись' after а (а kept)
    ("делавшись", "дела", "gerund group 1"),
    ("женщинам", "женщин", "noun 'ам'"),
    ("жизнь", "жизн", "noun 'ь'"),
    # noun 'ей', then derivational 'ост' in R2
    ("возможностей", "возможн", "derivational"),
    # participle 'нн' blocked (а outside RV) -> step4 undoubles
    ("странный", "стран", "step4 нн"),
    # step4 superlative 'ейш' after adjective strip
    ("добрейший", "добр", "superlative"),
    ("читают", "чита", "verb 'ют' after а"),
    ("читать", "чита", "verb 'ть' after а"),
    ("ёлка", "елк", "ё -> е preprocessing"),
]


@pytest.mark.parametrize("word,want,why", RUSSIAN)
def test_russian(word, want, why):
    from pke_spark.snowball import russian_stem
    assert russian_stem(word) == want, why


def test_russian_dispatch():
    import pandas as pd
    assert lang.stemmer_name_for("ru") == "russian"
    s = pd.Series(["книгами", "жизнь"])
    assert list(stem_series(s, "russian")) == ["книг", "жизн"]


DUTCH = [
    # step3b 'lijk' in R2, then the repeated e-removal
    ("lichamelijk", "licham", "lijk + repeat step2"),
    # step1 'en' after t, then kk/dd/tt undouble
    ("katten", "kat", "en + undouble"),
    # 'en' after t; no undouble (nt)
    ("gemeenten", "gemeent", "en"),
    ("huizen", "huiz", "en after z"),
    # step4 vowel-undouble makes inflections converge
    ("bomen", "bom", "en"),
    ("boom", "bom", "step4 oo -> o"),
]

SWEDISH = [
    # step1 'erna'; step2 pair 'tt' starts before R1 -> kept
    ("katterna", "katt", "erna; tt outside R1"),
    ("jaktkarlens", "jaktkarl", "step1 'ens'"),
    ("löparen", "löp", "step1 'aren'"),
    # step1 'heten' then step3 'lig' (light stemmers cascade)
    ("verkligheten", "verk", "heten + lig"),
    ("flickorna", "flick", "step1 'orna'"),
    ("starkast", "stark", "step1 'ast'"),
]

NORWEGIAN = [
    ("huset", "hus", "step1 'et'"),
    ("bilene", "bil", "step1 'ene'"),
    # step1 'ert' -> 'er' replacement
    ("vakkert", "vakker", "ert -> er"),
    ("mulighetene", "mulig", "hetene"),
    ("norske", "norsk", "step1 'e'"),
]

DANISH = [
    ("huset", "hus", "step1 'et'"),
    ("bilerne", "bil", "step1 'erne'"),
    # igst -> ig, then step3 'lig' cascade
    ("dejligst", "dej", "igst + lig"),
    # step1 'en', then step4 undoubles tt (last letter in R1)
    ("katten", "kat", "en + undouble"),
    # single pass: only a FINAL 'hed' strips (light-stemmer semantics)
    ("mulighed", "mulig", "step1 'hed'"),
    ("mulighederne", "mulighed", "erne; hed survives (single pass)"),
]


@pytest.mark.parametrize("word,want,why", DUTCH)
def test_dutch(word, want, why):
    from pke_spark.snowball import dutch_stem
    assert dutch_stem(word) == want, why


@pytest.mark.parametrize("word,want,why", SWEDISH)
def test_swedish(word, want, why):
    from pke_spark.snowball import swedish_stem
    assert swedish_stem(word) == want, why


@pytest.mark.parametrize("word,want,why", NORWEGIAN)
def test_norwegian(word, want, why):
    from pke_spark.snowball import norwegian_stem
    assert norwegian_stem(word) == want, why


@pytest.mark.parametrize("word,want,why", DANISH)
def test_danish(word, want, why):
    from pke_spark.snowball import danish_stem
    assert danish_stem(word) == want, why


def test_scandinavian_dutch_dispatch():
    for code, name in (("nl", "dutch"), ("sv", "swedish"),
                       ("nb", "norwegian"), ("da", "danish")):
        assert lang.stemmer_name_for(code) == name
    # (fi/it/pt/ro moved to their own implementations this round —
    # covered by test_full_language_table_dispatch)


ITALIAN = [
    # verb suffix 'ata' in RV
    ("abbandonata", "abbandon", "verb 'ata'"),
    # step1 'azione' in R2, then no further ic
    ("organizzazione", "organizz", "azione"),
    # 'iche' (del R2)
    ("caratteristiche", "caratterist", "iche"),
    # amente in R1, then ic-chain does not fire (semplic- ends c but
    # 'ic' is the last two chars and IS in R2? semplic: pos of ic=5
    # -> spec: only the longest rule fires; traced: semplic
    ("semplicemente", "semplic", "amente"),
    # 'ità' del R2, 'felic' keeps ic (pos < r2 after removal trace)
    ("felicità", "felic", "ità"),
    # step2 'are' then step3a residual i
    ("mangiare", "mang", "are + final i"),
    # step0 pronoun after ar: replaced by e, then step2 'are' and
    # step3a final i — converges with 'mangiare'
    ("mangiarlo", "mang", "pronoun 'lo' after ar"),
    # step3a final vowel, then step3b ch -> c cascades (spec's 3a
    # example 'crocchi -> crocch' shows the intermediate state only)
    ("crocchi", "crocc", "final i + ch -> c"),
    ("giochi", "gioc", "ch -> c merges with 'gioco'"),
    ("nazionale", "nazional", "final e"),
]

PORTUGUESE = [
    # 'icas' del R2
    ("quilométricas", "quilométr", "icas"),
    # 'idade' preceded by 'al' (not abil/ic/iv): only idade strips
    ("nacionalidade", "nacional", "idade"),
    # 'idade' preceded by abil -> abil kept? no: abil DELETED if R2
    ("possibilidade", "possibil", "idade (abil pos < R2 kept)"),
    # nasal: prelude a~, 'aça~o' not matched (i before ç); residual o
    ("declaração", "declar", "aça~o del R2"),
    # verb 'endo' in RV
    ("comendo", "com", "endo"),
    # verb 'aram'
    ("falaram", "fal", "aram"),
    # residual 'a' (step 4)
    ("bonita", "bonit", "residual a"),
    # step5 final e, then ç->c unconditional
    ("doce", "doc", "final e"),
]

ROMANIAN = [
    # step1 combining: abilitate -> abil (R1)
    ("abilitate", "abil", "abilitate -> abil"),
    # step1 ători -> at
    ("jucători", "jucat", "ători -> at"),
    # step2 'antă' del R2
    ("importantă", "import", "antă"),
    # step3 verb 'ează' after consonant
    ("lucrează", "lucr", "ează"),
    # step2 'esc'? no: step3 verb 'esc' after consonant n
    ("românesc", "român", "esc"),
    # comma-below input folds to cedilla and stems identically
    ("naționale", "naţional", "ț -> ţ fold + final e"),
    ("naţionale", "naţional", "cedilla input"),
]

FINNISH = [
    # inessive 'ssa' (case, R1); then step6b strips nothing (vowel o)
    ("taloissa", "talo", "ssa + plural i"),
    # essive 'na'
    ("talona", "talo", "na"),
    # plural t after vowel (step 5)
    ("kirjat", "kirj", "final t"),
    # case 'ssa' + step5 plural i/j removal path
    ("kirjoissa", "kirj", "ssa + oj tidy"),
    # superlative genitive: n case + step6 undouble
    ("suurimman", "suurim", "n + mm undouble"),
    # adessive 'llä', step6b final e after consonant
    ("edellä", "ed", "llä"),
]


@pytest.mark.parametrize("word,want,why", ITALIAN)
def test_italian(word, want, why):
    from pke_spark.snowball import italian_stem
    assert italian_stem(word) == want, why


@pytest.mark.parametrize("word,want,why", PORTUGUESE)
def test_portuguese(word, want, why):
    from pke_spark.snowball import portuguese_stem
    assert portuguese_stem(word) == want, why


@pytest.mark.parametrize("word,want,why", ROMANIAN)
def test_romanian(word, want, why):
    from pke_spark.snowball import romanian_stem
    assert romanian_stem(word) == want, why


@pytest.mark.parametrize("word,want,why", FINNISH)
def test_finnish(word, want, why):
    from pke_spark.snowball import finnish_stem
    assert finnish_stem(word) == want, why


def test_full_language_table_dispatch():
    """Every langcode in the reference's table now dispatches to its
    own Snowball implementation — no Porter fallback remains for
    supported languages (pke/lang.py:23-47 parity)."""
    want = {"da": "danish", "nl": "dutch", "fi": "finnish",
            "fr": "french", "de": "german", "it": "italian",
            "nb": "norwegian", "pt": "portuguese", "ro": "romanian",
            "ru": "russian", "es": "spanish", "sv": "swedish"}
    for code, name in want.items():
        assert lang.stemmer_name_for(code) == name
    assert lang.stemmer_name_for("en") == "porter"
    assert lang.stemmer_name_for("zz") == "porter"  # unknown -> warn
