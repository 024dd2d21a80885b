"""Snowball stemmers for the reference's 13 non-English languages —
from-scratch implementations of M.F. Porter's published Snowball
algorithm descriptions (snowballstem.org), pure Python, suitable for
the same memoized-per-batch vectorization as the English Porter
stemmer (stemmer.py).

This closes the reference's multi-language normalization surface
(pke/lang.py:23-47 + pke/base.py:110-123: ``SnowballStemmer(
langcodes[lang])`` for every non-English language): ``lang.
stemmer_name_for`` now dispatches every langcode in the reference's
table (es fr de ru nl sv nb da it pt ro fi) here, and keeps pke's
exact warn-and-fall-back-to-Porter semantics for codes outside the
table.

Verification: the published algorithms are deterministic rule systems;
``tests/test_snowball.py`` pins hand-traced vectors (each traced
step-by-step against the spec text, traces in the test docstrings)
plus structural properties. NLTK is not available in this environment,
so the vectors are spec-traces, not NLTK dumps — the spec, not an
implementation, is the oracle.

Region conventions (shared by all three): R1 = region after the first
non-vowel following a vowel; R2 = same, computed within R1; RV is
language-specific. Regions are character POSITIONS computed once on
the prepared word — suffix removal never invalidates them. "Suffix in
Rx" = the suffix starts at or after position Rx.
"""

from __future__ import annotations

# ---------------------------------------------------------------- shared


def _r1_r2(w: str, vowels: frozenset) -> tuple[int, int]:
    n = len(w)
    r1 = n
    for i in range(n - 1):
        if w[i] in vowels and w[i + 1] not in vowels:
            r1 = i + 2
            break
    r2 = n
    for i in range(r1, n - 1):
        if w[i] in vowels and w[i + 1] not in vowels:
            r2 = i + 2
            break
    return r1, r2


def _longest(w: str, sufs) -> str | None:
    best = None
    for s in sufs:
        if w.endswith(s) and (best is None or len(s) > len(best)):
            best = s
    return best


# ---------------------------------------------------------------- spanish

_ES_VOWELS = frozenset("aeiouáéíóúü")

_ES_PRON = ("selas", "selos", "sela", "selo", "las", "les", "los",
            "nos", "me", "se", "la", "le", "lo")
_ES_PRE_A = ("iéndo", "ándo", "ár", "ér", "ír")
_ES_UNACCENT_A = {"iéndo": "iendo", "ándo": "ando",
                  "ár": "ar", "ér": "er", "ír": "ir"}
_ES_PRE_B = ("ando", "iendo", "ar", "er", "ir")

_ES_S1_DEL_R2 = ("amientos", "imientos", "amiento", "imiento", "anzas",
                 "anza", "icos", "icas", "ico", "ica", "ismos", "ismo",
                 "ables", "able", "ibles", "ible", "istas", "ista",
                 "osos", "osas", "oso", "osa")
_ES_S1_ADOR = ("adoras", "adores", "aciones", "adora", "ación", "ador",
               "antes", "ancias", "ancia", "ante")
_ES_S1_IDAD = ("idades", "idad")
_ES_S1_IVA = ("ivas", "ivos", "iva", "ivo")

_ES_2A = ("yeron", "yendo", "yamos", "yais", "yan", "yen", "yas",
          "yes", "ya", "ye", "yo", "yó")
_ES_2B_GU = ("éis", "emos", "en", "es")
_ES_2B = ("aríamos", "eríamos", "iríamos", "iéramos", "iésemos",
          "aríais", "aremos", "eríais", "eremos", "iríais", "iremos",
          "ierais", "ieseis", "asteis", "isteis", "ábamos", "áramos",
          "ásemos", "arían", "arías", "aréis", "erían", "erías",
          "eréis", "irían", "irías", "iréis", "ieran", "iesen",
          "ieron", "iendo", "ieras", "ieses", "abais", "arais",
          "aseis", "íamos", "arán", "arás", "aría", "erán", "erás",
          "ería", "irán", "irás", "iría", "iera", "iese", "aste",
          "iste", "aban", "aran", "asen", "aron", "ando", "abas",
          "adas", "idas", "aras", "ases", "íais", "ados", "idos",
          "amos", "imos", "ará", "aré", "erá", "eré", "irá", "iré",
          "aba", "ada", "ida", "ara", "ase", "ían", "ado", "ido",
          "ías", "áis", "ía", "ad", "ed", "id", "an", "ió", "ar",
          "er", "ir", "as", "ís")
_ES_FINAL_ACCENTS = str.maketrans("áéíóú", "aeiou")


def _es_rv(w: str) -> int:
    n = len(w)
    if n < 3:
        return n
    if w[1] not in _ES_VOWELS:
        for i in range(2, n):
            if w[i] in _ES_VOWELS:
                return i + 1
        return n
    if w[0] in _ES_VOWELS and w[1] in _ES_VOWELS:
        for i in range(2, n):
            if w[i] not in _ES_VOWELS:
                return i + 1
        return n
    return 3


def spanish_stem(word: str) -> str:
    w = word.lower()
    if len(w) <= 2:
        return w.translate(_ES_FINAL_ACCENTS)
    rv = _es_rv(w)
    r1, r2 = _r1_r2(w, _ES_VOWELS)

    # step 0: attached pronoun (longest pronoun; its preceding verb
    # ending must lie in RV)
    p = _longest(w, _ES_PRON)
    if p:
        base = w[: -len(p)]
        a = _longest(base, _ES_PRE_A)
        if a and len(base) - len(a) >= rv:
            w = base[: -len(a)] + _ES_UNACCENT_A[a]
        else:
            b = _longest(base, _ES_PRE_B)
            if b and len(base) - len(b) >= rv:
                w = base
            elif (base.endswith("yendo") and len(base) >= 6
                  and base[-6] == "u" and len(base) - 5 >= rv):
                w = base

    # step 1: standard suffixes (longest match across ALL groups; only
    # that one rule applies, even if its region condition then fails)
    n = len(w)
    all_s1 = (list(_ES_S1_DEL_R2) + list(_ES_S1_ADOR)
              + ["logías", "logía", "uciones", "ución", "encias",
                 "encia", "amente", "mente"]
              + list(_ES_S1_IDAD) + list(_ES_S1_IVA))
    s = _longest(w, all_s1)
    step1_done = False
    if s:
        pos = n - len(s)
        if s in _ES_S1_DEL_R2:
            if pos >= r2:
                w, step1_done = w[:pos], True
        elif s in _ES_S1_ADOR:
            if pos >= r2:
                w, step1_done = w[:pos], True
                if w.endswith("ic") and len(w) - 2 >= r2:
                    w = w[:-2]
        elif s in ("logías", "logía"):
            if pos >= r2:
                w, step1_done = w[:pos] + "log", True
        elif s in ("uciones", "ución"):
            if pos >= r2:
                w, step1_done = w[:pos] + "u", True
        elif s in ("encias", "encia"):
            if pos >= r2:
                w, step1_done = w[:pos] + "ente", True
        elif s == "amente":
            if pos >= r1:
                w, step1_done = w[:pos], True
                if w.endswith("iv") and len(w) - 2 >= r2:
                    w = w[:-2]
                    if w.endswith("at") and len(w) - 2 >= r2:
                        w = w[:-2]
                elif (_longest(w, ("os", "ic", "ad"))
                      and len(w) - 2 >= r2):
                    w = w[:-2]
        elif s == "mente":
            if pos >= r2:
                w, step1_done = w[:pos], True
                t = _longest(w, ("ante", "able", "ible"))
                if t and len(w) - len(t) >= r2:
                    w = w[: -len(t)]
        elif s in _ES_S1_IDAD:
            if pos >= r2:
                w, step1_done = w[:pos], True
                t = _longest(w, ("abil", "ic", "iv"))
                if t and len(w) - len(t) >= r2:
                    w = w[: -len(t)]
        elif s in _ES_S1_IVA:
            if pos >= r2:
                w, step1_done = w[:pos], True
                if w.endswith("at") and len(w) - 2 >= r2:
                    w = w[:-2]

    # step 2a (only if step 1 removed nothing): y-verb suffixes after u
    step2a_done = False
    if not step1_done:
        s = _longest(w, _ES_2A)
        if (s and len(w) - len(s) >= rv and len(w) > len(s)
                and w[-len(s) - 1] == "u"):
            w, step2a_done = w[: -len(s)], True

    # step 2b (if 2a removed nothing): other verb suffixes
    if not step1_done and not step2a_done:
        s = _longest(w, list(_ES_2B_GU) + list(_ES_2B))
        if s and len(w) - len(s) >= rv:
            w = w[: -len(s)]
            if s in _ES_2B_GU and w.endswith("gu"):
                w = w[:-1]  # the u need not be in RV

    # step 3: residual suffix
    s = _longest(w, ("os", "a", "o", "á", "í", "ó", "e", "é"))
    if s and len(w) - len(s) >= rv:
        w = w[: -len(s)]
        if s in ("e", "é") and w.endswith("gu") and len(w) - 1 >= rv:
            w = w[:-1]

    return w.translate(_ES_FINAL_ACCENTS)


# ---------------------------------------------------------------- german

_DE_VOWELS = frozenset("aeiouyäöü")
_DE_S_END = frozenset("bdfghklmnrt")
_DE_ST_END = frozenset("bdfghklmnt")
_DE_FINAL = str.maketrans({"ä": "a", "ö": "o", "ü": "u",
                           "U": "u", "Y": "y"})


def german_stem(word: str) -> str:
    w = word.lower().replace("ß", "ss")
    # mark intervocalic u/y as consonants (neighbors from the original)
    chars = list(w)
    for i in range(1, len(w) - 1):
        if w[i - 1] in _DE_VOWELS and w[i + 1] in _DE_VOWELS:
            if w[i] == "u":
                chars[i] = "U"
            elif w[i] == "y":
                chars[i] = "Y"
    w = "".join(chars)
    r1, r2 = _r1_r2(w, _DE_VOWELS)
    r1 = max(r1, 3)  # region before R1 must hold >= 3 letters

    # step 1
    s = _longest(w, ("ern", "em", "er", "en", "es", "e", "s"))
    if s:
        pos = len(w) - len(s)
        if s == "s":
            if pos >= r1 and pos > 0 and w[pos - 1] in _DE_S_END:
                w = w[:pos]
        elif pos >= r1:
            w = w[:pos]
            if s in ("e", "en", "es") and w.endswith("niss"):
                w = w[:-1]

    # step 2
    s = _longest(w, ("est", "en", "er", "st"))
    if s:
        pos = len(w) - len(s)
        if s == "st":
            if pos >= r1 and pos > 3 and w[pos - 1] in _DE_ST_END:
                w = w[:pos]
        elif pos >= r1:
            w = w[:pos]

    # step 3: d-suffixes
    s = _longest(w, ("isch", "lich", "heit", "keit", "end", "ung",
                     "ig", "ik"))
    if s:
        pos = len(w) - len(s)
        if s in ("end", "ung"):
            if pos >= r2:
                w = w[:pos]
                if (w.endswith("ig") and len(w) - 2 >= r2
                        and not w.endswith("eig")):
                    w = w[:-2]
        elif s in ("ig", "ik", "isch"):
            if pos >= r2 and not (pos > 0 and w[pos - 1] == "e"):
                w = w[:pos]
        elif s in ("lich", "heit"):
            if pos >= r2:
                w = w[:pos]
                t = _longest(w, ("er", "en"))
                if t and len(w) - 2 >= r1:
                    w = w[:-2]
        elif s == "keit":
            if pos >= r2:
                w = w[:pos]
                t = _longest(w, ("lich", "ig"))
                if t and len(w) - len(t) >= r2:
                    w = w[: -len(t)]

    return w.translate(_DE_FINAL)


# ---------------------------------------------------------------- dutch

_NL_VOWELS = frozenset("aeiouyè")
_NL_UNACCENT = str.maketrans("äëïöüáéíóú", "aeiouaeiou")


def dutch_stem(word: str) -> str:  # noqa: C901 — mirrors the spec's steps
    w = word.lower().translate(_NL_UNACCENT)
    # mark initial y, y after a vowel, i between vowels (consonants)
    chars = list(w)
    n = len(w)
    for i, c in enumerate(w):
        if c == "y" and (i == 0 or w[i - 1] in _NL_VOWELS):
            chars[i] = "Y"
        elif (c == "i" and 0 < i < n - 1 and w[i - 1] in _NL_VOWELS
              and w[i + 1] in _NL_VOWELS):
            chars[i] = "I"
    w = "".join(chars)
    r1, r2 = _r1_r2(w, _NL_VOWELS)
    r1 = max(r1, 3)

    def undouble(x: str) -> str:
        return x[:-1] if x.endswith(("kk", "dd", "tt")) else x

    # step 1
    s = _longest(w, ("heden", "ene", "en", "se", "s"))
    if s:
        pos = len(w) - len(s)
        if s == "heden":
            if pos >= r1:
                w = w[:pos] + "heid"
        elif s in ("ene", "en"):
            if (pos >= r1 and pos > 0 and w[pos - 1] not in _NL_VOWELS
                    and w[:pos][-3:] != "gem"):
                w = undouble(w[:pos])
        else:  # se / s
            if (pos >= r1 and pos > 0 and w[pos - 1] not in _NL_VOWELS
                    and w[pos - 1] != "j"):
                w = w[:pos]

    # step 2: final e after a non-vowel, then undouble
    e_removed = False
    if (w.endswith("e") and len(w) - 1 >= r1 and len(w) >= 2
            and w[-2] not in _NL_VOWELS):
        w, e_removed = undouble(w[:-1]), True

    # step 3a: heid (not preceded by c), then the step-1b en rule
    if w.endswith("heid") and len(w) - 4 >= r2 \
            and (len(w) < 5 or w[-5] != "c"):
        w = w[:-4]
        if (w.endswith("en") and len(w) - 2 >= r1
                and len(w) >= 3 and w[-3] not in _NL_VOWELS
                and w[:-2][-3:] != "gem"):
            w = undouble(w[:-2])

    # step 3b: d-suffixes
    s = _longest(w, ("end", "ing", "lijk", "baar", "bar", "ig"))
    if s:
        pos = len(w) - len(s)
        if s in ("end", "ing"):
            if pos >= r2:
                w = w[:pos]
                if (w.endswith("ig") and len(w) - 2 >= r2
                        and (len(w) < 3 or w[-3] != "e")):
                    w = w[:-2]
                else:
                    w = undouble(w)
        elif s == "ig":
            if pos >= r2 and (pos == 0 or w[pos - 1] != "e"):
                w = w[:pos]
        elif s == "lijk":
            if pos >= r2:
                w = w[:pos]
                if (w.endswith("e") and len(w) - 1 >= r1 and len(w) >= 2
                        and w[-2] not in _NL_VOWELS):
                    w = undouble(w[:-1])
        elif s == "baar":
            if pos >= r2:
                w = w[:pos]
        elif s == "bar":
            if pos >= r2 and e_removed:
                w = w[:pos]

    # step 4: undouble vowel — C + aa/ee/oo/uu + D (D != I) at the end
    if len(w) >= 4:
        c, v1, v2, d = w[-4], w[-3], w[-2], w[-1]
        if (c not in _NL_VOWELS and d not in _NL_VOWELS and d != "I"
                and v1 == v2 and v1 in "aeou"):
            w = w[:-2] + w[-1]

    return w.lower()


# ------------------------------------------------- swedish / norwegian /
# danish (the Scandinavian trio share the R1-with-3-letter-floor shape)

_SV_VOWELS = frozenset("aeiouyäåö")
_SV_S_END = frozenset("bcdfghjklmnoprtvy")
# spec's step-1 list (longest-match picks the winner regardless of order)
_SV_STEP1 = ("heterna", "hetens", "arnas", "ernas", "ornas", "anden",
             "arens", "andes", "andet", "heten", "heter", "arna",
             "erna", "orna", "ande", "arne", "aste", "aren", "ades",
             "erns", "ade", "are", "ern", "ens", "het", "ast", "ad",
             "en", "ar", "er", "or", "as", "es", "at", "a", "e")


def swedish_stem(word: str) -> str:
    w = word.lower()
    r1, _ = _r1_r2(w, _SV_VOWELS)
    r1 = max(r1, 3)
    # step 1: suffix list, or s after a valid s-ending
    s = _longest(w, _SV_STEP1)
    if s and len(w) - len(s) >= r1:
        w = w[: -len(s)]
    elif (w.endswith("s") and len(w) - 1 >= r1 and len(w) >= 2
          and w[-2] in _SV_S_END):
        w = w[:-1]
    # step 2: shorten dd gd nn dt gt kt tt (the PAIR must lie in R1 —
    # Snowball's setlimit-to-R1 among() semantics)
    if len(w) - 2 >= r1 and w[-2:] in ("dd", "gd", "nn", "dt", "gt",
                                       "kt", "tt"):
        w = w[:-1]
    # step 3
    s = _longest(w, ("lig", "ig", "els", "löst", "fullt"))
    if s and len(w) - len(s) >= r1:
        if s == "löst":
            w = w[:-1]
        elif s == "fullt":
            w = w[:-1]
        else:
            w = w[: -len(s)]
    return w


_NO_VOWELS = frozenset("aeiouyæåø")
_NO_S_END = frozenset("bcdfghjlmnoprtvyz")
_NO_STEP1 = ("hetenes", "hetene", "hetens", "heten", "heter", "endes",
             "ande", "ende", "edes", "enes", "erte", "ane", "ene",
             "ens", "ers", "ets", "het", "ast", "ert", "ede", "ade",
             "es", "as", "en", "ar", "er", "et", "e", "a")


def norwegian_stem(word: str) -> str:
    w = word.lower()
    r1, _ = _r1_r2(w, _NO_VOWELS)
    r1 = max(r1, 3)
    s = _longest(w, _NO_STEP1)
    if s and len(w) - len(s) >= r1:
        if s in ("erte", "ert"):
            w = w[: -len(s)] + "er"
        else:
            w = w[: -len(s)]
    elif w.endswith("s") and len(w) - 1 >= r1 and len(w) >= 2 and (
            w[-2] in _NO_S_END
            or (w[-2] == "k" and (len(w) < 3
                                  or w[-3] not in _NO_VOWELS))):
        w = w[:-1]
    # step 2: dt / vt -> delete the t (pair fully in R1)
    if len(w) - 2 >= r1 and w[-2:] in ("dt", "vt"):
        w = w[:-1]
    # step 3
    s = _longest(w, ("hetslov", "eleg", "elig", "elov", "slov", "leg",
                     "eig", "lig", "els", "lov", "ig"))
    if s and len(w) - len(s) >= r1:
        w = w[: -len(s)]
    return w


_DA_VOWELS = frozenset("aeiouyæåø")
_DA_S_END = frozenset("abcdfghjklmnoprtvyzå")
_DA_STEP1 = ("erendes", "erende", "hedens", "ethed", "erede", "heden",
             "heder", "endes", "ernes", "erens", "erets", "ered",
             "ende", "erne", "eren", "erer", "heds", "enes", "eres",
             "eret", "hed", "ene", "ere", "ens", "ers", "ets", "en",
             "er", "es", "et", "e")


def danish_stem(word: str) -> str:
    w = word.lower()
    r1, _ = _r1_r2(w, _DA_VOWELS)
    r1 = max(r1, 3)
    s = _longest(w, _DA_STEP1)
    if s and len(w) - len(s) >= r1:
        w = w[: -len(s)]
    elif (w.endswith("s") and len(w) - 1 >= r1 and len(w) >= 2
          and w[-2] in _DA_S_END):
        w = w[:-1]
    # step 2: gd dt gt kt -> delete the last letter (pair fully in R1)
    if len(w) - 2 >= r1 and w[-2:] in ("gd", "dt", "gt", "kt"):
        w = w[:-1]
    # step 3: igst first (st in R1), then d-suffixes (repeat step 2),
    # or løst
    if w.endswith("igst") and len(w) - 2 >= r1:
        w = w[:-2]
    s = _longest(w, ("elig", "lig", "els", "ig"))
    if s and len(w) - len(s) >= r1:
        w = w[: -len(s)]
        if len(w) - 2 >= r1 and w[-2:] in ("gd", "dt", "gt", "kt"):
            w = w[:-1]
    elif w.endswith("løst") and len(w) - 4 >= r1:
        w = w[:-1]
    # step 4: undouble a final double consonant in R1
    if (len(w) >= 2 and w[-1] == w[-2] and w[-1] not in _DA_VOWELS
            and len(w) - 1 >= r1):
        w = w[:-1]
    return w


# ---------------------------------------------------------------- russian

_RU_VOWELS = frozenset("аеиоуыэюя")

# class unions; Snowball `among` semantics: the LONGEST match wins and
# its group's condition is then tested — on failure the whole class
# fails (no backtracking to shorter suffixes)
_RU_GERUND1 = ("вшись", "вши", "в")                    # preceded by а/я
_RU_GERUND2 = ("ившись", "ывшись", "ивши", "ывши", "ив", "ыв")
_RU_ADJ = ("ими", "ыми", "его", "ого", "ему", "ому", "ее", "ие",
           "ые", "ое", "ей", "ий", "ый", "ой", "ем", "им", "ым",
           "ом", "их", "ых", "ую", "юю", "ая", "яя", "ою", "ею")
_RU_PART1 = ("ем", "нн", "вш", "ющ", "щ")              # preceded by а/я
_RU_PART2 = ("ивш", "ывш", "ующ")
_RU_VERB1 = ("ешь", "нно", "ете", "йте", "ла", "на", "ли", "ем",
             "ло", "но", "ет", "ют", "ны", "ть", "й", "л", "н")
_RU_VERB2 = ("ейте", "уйте", "ила", "ыла", "ена", "ите", "или",
             "ыли", "ило", "ыло", "ено", "ует", "уют", "ены", "ить",
             "ыть", "ишь", "ей", "уй", "ил", "ыл", "им", "ым", "ен",
             "ят", "ит", "ыт", "ую", "ю")
_RU_NOUN = ("иями", "ями", "ами", "ией", "иям", "ием", "иях", "ев",
            "ов", "ие", "ье", "еи", "ии", "ей", "ой", "ий", "ям",
            "ем", "ам", "ом", "ах", "ях", "ию", "ью", "ия", "ья",
            "а", "е", "и", "й", "о", "у", "ы", "ь", "ю", "я")


def _ru_try(w: str, rv: int, g1, g2=()) -> str | None:
    """Longest match across g1 (а/я-conditioned) + g2 (plain), in RV;
    returns the shortened word or None (class failed)."""
    s = _longest(w, list(g1) + list(g2))
    if not s or len(w) - len(s) < rv:
        return None
    pos = len(w) - len(s)
    if s in g1 and not (pos > 0 and w[pos - 1] in "ая" and pos - 1 >= rv):
        return None
    return w[:pos]


def russian_stem(word: str) -> str:
    w = word.lower().replace("ё", "е")
    n = len(w)
    rv = n
    for i in range(n):
        if w[i] in _RU_VOWELS:
            rv = i + 1
            break
    r1, r2 = _r1_r2(w, _RU_VOWELS)

    # step 1: perfective gerund, else [reflexive] + one of
    # adjectival / verb / noun
    out = _ru_try(w, rv, _RU_GERUND1, _RU_GERUND2)
    if out is not None:
        w = out
    else:
        out = _ru_try(w, rv, (), ("ся", "сь"))
        if out is not None:
            w = out
        adj = _ru_try(w, rv, (), _RU_ADJ)
        if adj is not None:
            w = adj
            part = _ru_try(w, rv, _RU_PART1, _RU_PART2)
            if part is not None:
                w = part
        else:
            verb = _ru_try(w, rv, _RU_VERB1, _RU_VERB2)
            if verb is not None:
                w = verb
            else:
                noun = _ru_try(w, rv, (), _RU_NOUN)
                if noun is not None:
                    w = noun

    # step 2: final и
    if w.endswith("и") and len(w) - 1 >= rv:
        w = w[:-1]

    # step 3: derivational ending, must be in R2
    s = _longest(w, ("ость", "ост"))
    if s and len(w) - len(s) >= r2:
        w = w[: -len(s)]

    # step 4: нн -> н | superlative (then undouble н) | final ь
    s = _longest(w, ("нн", "ейше", "ейш", "ь"))
    if s and len(w) - len(s) >= rv:
        if s == "нн":
            w = w[:-1]
        elif s == "ь":
            w = w[:-1]
        else:
            w = w[: -len(s)]
            if w.endswith("нн"):
                w = w[:-1]
    return w


# ---------------------------------------------------------------- french

_FR_VOWELS = frozenset("aeiouyâàëéêèïîôûù")

_FR_S1_DEL_R2 = ("ances", "iqUes", "ismes", "ables", "istes", "ance",
                 "iqUe", "isme", "able", "iste", "eux")
_FR_S1_ATRICE = ("atrices", "ateurs", "ations", "atrice", "ateur",
                 "ation")
_FR_S1_USION = ("usions", "utions", "usion", "ution")
_FR_2A = ("issaIent", "issantes", "iraIent", "issante", "issants",
          "issions", "irions", "issais", "issait", "issant", "issent",
          "issiez", "issons", "irais", "irait", "irent", "iriez",
          "irons", "iront", "isses", "issez", "îmes", "îtes", "irai",
          "iras", "irez", "isse", "ies", "ira", "ît", "ie", "ir", "is",
          "it", "i")
_FR_2B_ER = ("eraIent", "erions", "èrent", "erais", "erait", "eriez",
             "erons", "eront", "erai", "eras", "erez", "ées", "era",
             "iez", "ée", "és", "er", "ez", "é")
_FR_2B_A = ("assions", "assent", "assiez", "aIent", "antes", "asses",
            "âmes", "âtes", "ante", "ants", "asse", "ais", "ait",
            "ant", "ât", "ai", "as", "a")


def _fr_prepare(w: str) -> str:
    out = list(w)
    n = len(w)
    for i, c in enumerate(w):
        prev = w[i - 1] if i > 0 else ""
        nxt = w[i + 1] if i < n - 1 else ""
        if c in "ui" and prev in _FR_VOWELS and nxt in _FR_VOWELS:
            out[i] = c.upper()
        elif c == "y" and (prev in _FR_VOWELS or nxt in _FR_VOWELS):
            out[i] = "Y"
        elif c == "u" and prev == "q":
            out[i] = "U"
    return "".join(out)


def _fr_rv(w: str) -> int:
    n = len(w)
    if n >= 3 and (w[:3] in ("par", "col", "tap")
                   or (w[0] in _FR_VOWELS and w[1] in _FR_VOWELS)):
        return 3
    for i in range(1, n):
        if w[i] in _FR_VOWELS:
            return i + 1
    return n


def french_stem(word: str) -> str:  # noqa: C901 — mirrors the spec's steps
    w = _fr_prepare(word.lower())
    if len(w) <= 2:
        return w.lower()
    rv = _fr_rv(w)
    r1, r2 = _r1_r2(w, _FR_VOWELS)

    altered = False
    found_ment = False

    # ---- step 1: standard suffixes
    all_s1 = (list(_FR_S1_DEL_R2) + list(_FR_S1_ATRICE)
              + ["logies", "logie"] + list(_FR_S1_USION)
              + ["ences", "ence", "issements", "issement", "ements",
                 "ement", "ités", "ité", "ives", "ifs", "ive", "if",
                 "eaux", "aux", "euses", "euse", "amment", "emment",
                 "ments", "ment"])
    s = _longest(w, all_s1)
    if s:
        pos = len(w) - len(s)
        if s in _FR_S1_DEL_R2:
            if pos >= r2:
                w, altered = w[:pos], True
        elif s in _FR_S1_ATRICE:
            if pos >= r2:
                w, altered = w[:pos], True
                if w.endswith("ic"):
                    if len(w) - 2 >= r2:
                        w = w[:-2]
                    else:
                        w = w[:-2] + "iqU"
        elif s in ("logies", "logie"):
            if pos >= r2:
                w, altered = w[:pos] + "log", True
        elif s in _FR_S1_USION:
            if pos >= r2:
                w, altered = w[:pos] + "u", True
        elif s in ("ences", "ence"):
            if pos >= r2:
                w, altered = w[:pos] + "ent", True
        elif s in ("ements", "ement"):
            if pos >= rv:
                w, altered = w[:pos], True
                if w.endswith("iv") and len(w) - 2 >= r2:
                    w = w[:-2]
                    if w.endswith("at") and len(w) - 2 >= r2:
                        w = w[:-2]
                elif w.endswith("eus"):
                    if len(w) - 3 >= r2:
                        w = w[:-3]
                    elif len(w) - 3 >= r1:
                        w = w[:-1] + "x"
                elif (w.endswith("abl") or w.endswith("iqU")) \
                        and len(w) - 3 >= r2:
                    w = w[:-3]
                elif (w.endswith("ièr") or w.endswith("Ièr")) \
                        and len(w) - 3 >= rv:
                    w = w[:-3] + "i"
        elif s in ("ités", "ité"):
            if pos >= r2:
                w, altered = w[:pos], True
                if w.endswith("abil"):
                    if len(w) - 4 >= r2:
                        w = w[:-4]
                    else:
                        w = w[:-4] + "abl"
                elif w.endswith("ic"):
                    if len(w) - 2 >= r2:
                        w = w[:-2]
                    else:
                        w = w[:-2] + "iqU"
                elif w.endswith("iv") and len(w) - 2 >= r2:
                    w = w[:-2]
        elif s in ("ives", "ifs", "ive", "if"):
            if pos >= r2:
                w, altered = w[:pos], True
                if w.endswith("at") and len(w) - 2 >= r2:
                    w = w[:-2]
                    if w.endswith("ic"):
                        if len(w) - 2 >= r2:
                            w = w[:-2]
                        else:
                            w = w[:-2] + "iqU"
        elif s == "eaux":
            w, altered = w[:pos] + "eau", True
        elif s == "aux":
            if pos >= r1:
                w, altered = w[:pos] + "al", True
        elif s in ("euses", "euse"):
            if pos >= r2:
                w, altered = w[:pos], True
            elif pos >= r1:
                w, altered = w[:pos] + "eux", True
        elif s in ("issements", "issement"):
            if pos >= r1 and pos > 0 and w[pos - 1] not in _FR_VOWELS:
                w, altered = w[:pos], True
        elif s == "amment":
            if pos >= rv:
                w, altered, found_ment = w[:pos] + "ant", True, True
        elif s == "emment":
            if pos >= rv:
                w, altered, found_ment = w[:pos] + "ent", True, True
        elif s in ("ments", "ment"):
            found_ment = True
            if pos >= 1 and w[pos - 1] in _FR_VOWELS and pos - 1 >= rv:
                w, altered = w[:pos], True

    # ---- steps 2a/2b: verb suffixes (tests confined to RV)
    step2_altered = False
    if not altered or found_ment:
        s = _longest(w, _FR_2A)
        did_2a_delete = False
        if s:
            pos = len(w) - len(s)
            if (pos >= rv and pos > 0 and w[pos - 1] not in _FR_VOWELS
                    and pos - 1 >= rv):
                w, did_2a_delete, step2_altered = w[:pos], True, True
        if not did_2a_delete:
            s = _longest(w, ["ions"] + list(_FR_2B_ER) + list(_FR_2B_A))
            if s:
                pos = len(w) - len(s)
                if s == "ions":
                    if pos >= r2 and pos >= rv:
                        w, step2_altered = w[:pos], True
                elif s in _FR_2B_ER:
                    if pos >= rv:
                        w, step2_altered = w[:pos], True
                else:  # _FR_2B_A
                    if pos >= rv:
                        w, step2_altered = w[:pos], True
                        if w.endswith("e") and len(w) - 1 >= rv:
                            w = w[:-1]

    if altered or step2_altered:
        # ---- step 3
        if w.endswith("Y"):
            w = w[:-1] + "i"
        elif w.endswith("ç"):
            w = w[:-1] + "c"
    else:
        # ---- step 4
        if (w.endswith("s") and len(w) >= 2
                and w[-2] not in "aiouès"):
            w = w[:-1]
        s = _longest(w, ("Ière", "ière", "Ier", "ier", "ion", "e", "ë"))
        if s:
            pos = len(w) - len(s)
            if s == "ion":
                if pos >= r2 and pos >= rv and pos > 0 \
                        and w[pos - 1] in "st" and pos - 1 >= rv:
                    w = w[:pos]
            elif s in ("Ière", "ière", "Ier", "ier"):
                if pos >= rv:
                    w = w[:pos] + "i"
            elif s == "e":
                if pos >= rv:
                    w = w[:pos]
            elif s == "ë":
                if pos >= rv and w[:pos].endswith("gu"):
                    w = w[:pos]

    # ---- step 5: undouble
    for d in ("enn", "onn", "ett", "ell", "eill"):
        if w.endswith(d):
            w = w[:-1]
            break

    # ---- step 6: un-accent é/è followed only by non-vowels
    i = len(w) - 1
    while i >= 0 and w[i] not in _FR_VOWELS and w[i] not in "éè":
        i -= 1
    if i >= 0 and w[i] in "éè" and i < len(w) - 1:
        w = w[:i] + "e" + w[i + 1:]

    return w.lower()


# ---------------------------------------------------------------- italian

_IT_VOWELS = frozenset("aeiouàèìòù")
_IT_ACUTE = str.maketrans("áéíóú", "àèìòù")

_IT_PRON = ("gliela", "gliele", "glieli", "glielo", "gliene", "sene",
            "mela", "mele", "meli", "melo", "mene",
            "tela", "tele", "teli", "telo", "tene",
            "cela", "cele", "celi", "celo", "cene",
            "vela", "vele", "veli", "velo", "vene",
            "gli", "ci", "la", "le", "li", "lo", "mi", "ne", "si",
            "ti", "vi")
_IT_S1_DEL_R2 = ("anza", "anze", "ico", "ici", "ica", "ice", "iche",
                 "ichi", "ismo", "ismi", "abile", "abili", "ibile",
                 "ibili", "ista", "iste", "isti", "istà", "istè",
                 "istì", "oso", "osi", "osa", "ose", "mente",
                 "atrice", "atrici", "ante", "anti")
_IT_S1_AZIONE = ("azione", "azioni", "atore", "atori")
_IT_S1_IVO = ("ivo", "ivi", "iva", "ive")
_IT_S2 = ("erebbero", "irebbero", "assero", "assimo", "eranno",
          "erebbe", "eremmo", "ereste", "eresti", "essero", "iranno",
          "irebbe", "iremmo", "ireste", "iresti", "iscano", "iscono",
          "issero", "arono", "avamo", "avano", "avate", "eremo",
          "erete", "erono", "evamo", "evano", "evate", "iremo",
          "irete", "irono", "ivamo", "ivano", "ivate", "ammo",
          "ando", "asse", "assi", "emmo", "enda", "ende", "endi",
          "endo", "erai", "erei", "Yamo", "Iamo", "iamo", "immo",
          "irai", "irei", "isca", "isce", "isci", "isco", "ano",
          "are", "ata", "ate", "ati", "ato", "ava", "avi", "avo",
          "erà", "ere", "erò", "ete", "eva", "evi", "evo", "irà",
          "ire", "irò", "ita", "ite", "iti", "ito", "iva", "ivi",
          "ivo", "ono", "uta", "ute", "uti", "uto", "ar", "ir")


def _it_prepare(w: str) -> str:
    w = w.lower().translate(_IT_ACUTE)
    chars = list(w)
    n = len(w)
    for i, c in enumerate(w):
        if c == "u" and i > 0 and w[i - 1] == "q":
            chars[i] = "U"
        elif (c in "iu" and 0 < i < n - 1 and w[i - 1] in _IT_VOWELS
              and w[i + 1] in _IT_VOWELS):
            chars[i] = c.upper()
    return "".join(chars)


def italian_stem(word: str) -> str:  # noqa: C901 — mirrors the spec's steps
    w = _it_prepare(word)
    if len(w) <= 2:
        return w.lower()
    rv = _es_rv(w)  # same RV definition as Spanish (the spec shares it)
    r1, r2 = _r1_r2(w, _IT_VOWELS)

    # step 0: attached pronoun — longest pronoun preceded by
    # ando/endo (delete) or ar/er/ir (replace with e), both in RV
    p = _longest(w, _IT_PRON)
    if p:
        base = w[: -len(p)]
        a = _longest(base, ("ando", "endo"))
        if a and len(base) - len(a) >= rv:
            w = base
        else:
            b = _longest(base, ("ar", "er", "ir"))
            if b and len(base) - len(b) >= rv:
                w = base + "e"

    # step 1: standard suffixes (longest across ALL groups)
    all_s1 = (list(_IT_S1_DEL_R2) + list(_IT_S1_AZIONE)
              + ["logia", "logie", "uzione", "uzioni", "usione",
                 "usioni", "enza", "enze", "amento", "amenti",
                 "imento", "imenti", "amente", "ità"]
              + list(_IT_S1_IVO))
    s = _longest(w, all_s1)
    step1_done = False
    if s:
        pos = len(w) - len(s)
        if s == "amente":
            if pos >= r1:
                w, step1_done = w[:pos], True
                if w.endswith("iv") and len(w) - 2 >= r2:
                    w = w[:-2]
                    if w.endswith("at") and len(w) - 2 >= r2:
                        w = w[:-2]
                else:
                    t = _longest(w, ("os", "ic", "abil"))
                    if t and len(w) - len(t) >= r2:
                        w = w[: -len(t)]
        elif s in ("amento", "amenti", "imento", "imenti"):
            if pos >= rv:
                w, step1_done = w[:pos], True
        elif s in _IT_S1_DEL_R2:
            if pos >= r2:
                w, step1_done = w[:pos], True
        elif s in _IT_S1_AZIONE:
            if pos >= r2:
                w, step1_done = w[:pos], True
                if w.endswith("ic") and len(w) - 2 >= r2:
                    w = w[:-2]
        elif s in ("logia", "logie"):
            if pos >= r2:
                w, step1_done = w[:pos] + "log", True
        elif s in ("uzione", "uzioni", "usione", "usioni"):
            if pos >= r2:
                w, step1_done = w[:pos] + "u", True
        elif s in ("enza", "enze"):
            if pos >= r2:
                w, step1_done = w[:pos] + "ente", True
        elif s == "ità":
            if pos >= r2:
                w, step1_done = w[:pos], True
                t = _longest(w, ("abil", "ic", "iv"))
                if t and len(w) - len(t) >= r2:
                    w = w[: -len(t)]
        elif s in _IT_S1_IVO:
            if pos >= r2:
                w, step1_done = w[:pos], True
                if w.endswith("at") and len(w) - 2 >= r2:
                    w = w[:-2]
                    if w.endswith("ic") and len(w) - 2 >= r2:
                        w = w[:-2]

    # step 2 (only if step 1 removed nothing): verb suffixes in RV
    if not step1_done:
        s = _longest(w, _IT_S2)
        if s and len(w) - len(s) >= rv:
            w = w[: -len(s)]

    # step 3a: final vowel (and a preceding i), each in RV
    if w and w[-1] in "aeioàèìò" and len(w) - 1 >= rv:
        w = w[:-1]
        if w.endswith("i") and len(w) - 1 >= rv:
            w = w[:-1]

    # step 3b: ch/gh -> c/g in RV
    if (w.endswith("ch") or w.endswith("gh")) and len(w) - 2 >= rv:
        w = w[:-1]

    return w.lower()


# ------------------------------------------------------------- portuguese

_PT_VOWELS = frozenset("aeiouáéíóúâêô")

_PT_S1_DEL_R2 = ("eza", "ezas", "ico", "ica", "icos", "icas", "ismo",
                 "ismos", "ável", "ível", "ista", "istas", "oso",
                 "osa", "osos", "osas", "amento", "amentos", "imento",
                 "imentos", "adora", "ador", "aça~o", "adoras",
                 "adores", "aço~es", "ante", "antes", "ância")
_PT_S1_IVA = ("iva", "ivo", "ivas", "ivos")
_PT_S2 = ("ada", "ida", "ia", "aria", "eria", "iria", "ará", "ara",
          "erá", "era", "irá", "ava", "asse", "esse", "isse", "aste",
          "este", "iste", "ei", "arei", "erei", "irei", "am", "iam",
          "ariam", "eriam", "iriam", "aram", "eram", "iram", "avam",
          "em", "arem", "erem", "irem", "assem", "essem", "issem",
          "ado", "ido", "ando", "endo", "indo", "ara~o", "era~o",
          "ira~o", "ar", "er", "ir", "as", "adas", "idas", "ias",
          "arias", "erias", "irias", "arás", "aras", "erás", "eras",
          "irás", "avas", "es", "ardes", "erdes", "irdes", "ares",
          "eres", "ires", "asses", "esses", "isses", "astes", "estes",
          "istes", "is", "ais", "iais", "ariais", "eriais", "iriais",
          "áreis", "areis", "éreis", "ereis", "íreis", "ireis",
          "ásseis", "asseis", "ésseis", "esseis", "ísseis", "isseis",
          "áveis", "aveis", "íeis", "ieis", "aríeis", "arieis",
          "eríeis", "erieis", "iríeis", "irieis", "ados", "idos",
          "ámos", "amos", "íamos", "iamos", "aríamos", "ariamos",
          "eríamos", "eriamos", "iríamos", "iriamos", "áramos",
          "aramos", "éramos", "eramos", "íramos", "iramos", "ávamos",
          "avamos", "emos", "aremos", "eremos", "iremos", "ássemos",
          "assemos", "êssemos", "essemos", "íssemos", "issemos",
          "imos", "armos", "ermos", "irmos", "eu", "iu", "ou", "ira",
          "iras")


def _pt_rv(w: str) -> int:
    n = len(w)
    if n < 3:
        return n
    if w[1] not in _PT_VOWELS:
        for i in range(2, n):
            if w[i] in _PT_VOWELS:
                return i + 1
        return n
    if w[0] in _PT_VOWELS and w[1] in _PT_VOWELS:
        for i in range(2, n):
            if w[i] not in _PT_VOWELS:
                return i + 1
        return n
    return 3


def portuguese_stem(word: str) -> str:  # noqa: C901 — spec steps
    # prelude: nasal vowels become vowel + '~' marker (a consonant)
    w = word.lower().replace("ã", "a~").replace("õ", "o~")
    if len(w) <= 2:
        return w.replace("a~", "ã").replace("o~", "õ")
    rv = _pt_rv(w)
    r1, r2 = _r1_r2(w, _PT_VOWELS)

    # step 1: standard suffixes (longest across ALL groups)
    all_s1 = (list(_PT_S1_DEL_R2)
              + ["logia", "logias", "uça~o", "uço~es", "ência",
                 "ências", "amente", "mente", "idade", "idades",
                 "ira", "iras"]
              + list(_PT_S1_IVA))
    s = _longest(w, all_s1)
    altered = False
    if s:
        pos = len(w) - len(s)
        if s in _PT_S1_DEL_R2:
            if pos >= r2:
                w, altered = w[:pos], True
        elif s in ("logia", "logias"):
            if pos >= r2:
                w, altered = w[:pos] + "log", True
        elif s in ("uça~o", "uço~es"):
            if pos >= r2:
                w, altered = w[:pos] + "u", True
        elif s in ("ência", "ências"):
            if pos >= r2:
                w, altered = w[:pos] + "ente", True
        elif s == "amente":
            if pos >= r1:
                w, altered = w[:pos], True
                if w.endswith("iv") and len(w) - 2 >= r2:
                    w = w[:-2]
                    if w.endswith("at") and len(w) - 2 >= r2:
                        w = w[:-2]
                else:
                    t = _longest(w, ("os", "ic", "ad"))
                    if t and len(w) - len(t) >= r2:
                        w = w[: -len(t)]
        elif s == "mente":
            if pos >= r2:
                w, altered = w[:pos], True
                t = _longest(w, ("ante", "avel", "ível"))
                if t and len(w) - len(t) >= r2:
                    w = w[: -len(t)]
        elif s in ("idade", "idades"):
            if pos >= r2:
                w, altered = w[:pos], True
                t = _longest(w, ("abil", "ic", "iv"))
                if t and len(w) - len(t) >= r2:
                    w = w[: -len(t)]
        elif s in _PT_S1_IVA:
            if pos >= r2:
                w, altered = w[:pos], True
                if w.endswith("at") and len(w) - 2 >= r2:
                    w = w[:-2]
        elif s in ("ira", "iras"):
            if pos >= rv and pos > 0 and w[pos - 1] == "e":
                w, altered = w[:pos] + "ir", True

    # step 2 (only if step 1 made no change): verb suffixes in RV
    step2_done = False
    if not altered:
        s = _longest(w, _PT_S2)
        if s and len(w) - len(s) >= rv:
            w, step2_done = w[: -len(s)], True

    # step 3 (if 1 or 2 altered): ci -> c (the i in RV)
    if (altered or step2_done) and w.endswith("ci") \
            and len(w) - 1 >= rv:
        w = w[:-1]

    # step 4 (if neither altered): residual suffix in RV
    if not altered and not step2_done:
        s = _longest(w, ("os", "a", "i", "o", "á", "í", "ó"))
        if s and len(w) - len(s) >= rv:
            w = w[: -len(s)]

    # step 5: final e/é/ê in RV; then gu/ci undouble; ç -> c
    if w and w[-1] in "eéê" and len(w) - 1 >= rv:
        w = w[:-1]
        if ((w.endswith("gu") or w.endswith("ci"))
                and len(w) - 1 >= rv):
            w = w[:-1]
    if w.endswith("ç"):
        w = w[:-1] + "c"

    return w.replace("a~", "ã").replace("o~", "õ")


# --------------------------------------------------------------- romanian

# Transcribed from the published Snowball Romanian description
# (snowballstem.org). The spec is written with cedilla forms
# (U+015F/U+0163); modern Romanian text uses comma-below (U+0219/
# U+021B) — prepare() folds both to cedilla so either input spelling
# stems identically.

_RO_VOWELS = frozenset("aăâeiîou")
_RO_COMMA = str.maketrans("șț", "şţ")

_RO_S0 = {
    "ul": "", "ului": "",
    "aua": "a",
    "ea": "e", "ele": "e", "elor": "e",
    "ii": "i", "iua": "i", "iei": "i", "iile": "i", "iilor": "i",
    "ilor": "i",
    "ile": "i",          # special: not after 'ab'
    "atei": "at",
    "aţie": "aţi", "aţia": "aţi",
}
_RO_S1 = {
    "abilitate": "abil", "abilitati": "abil", "abilităi": "abil",
    "abilităţi": "abil",
    "ibilitate": "ibil",
    "ivitate": "iv", "ivitati": "iv", "ivităi": "iv", "ivităţi": "iv",
    "icitate": "ic", "icitati": "ic", "icităi": "ic", "icităţi": "ic",
    "icator": "ic", "icatori": "ic",
    "iciv": "ic", "iciva": "ic", "icive": "ic", "icivi": "ic",
    "icivă": "ic",
    "ical": "ic", "icala": "ic", "icale": "ic", "icali": "ic",
    "icală": "ic",
    "ativ": "at", "ativa": "at", "ative": "at", "ativi": "at",
    "ativă": "at", "aţiune": "at",
    "atoare": "at", "ator": "at", "atori": "at",
    "ătoare": "at", "ător": "at", "ători": "at",
    "itiv": "it", "itiva": "it", "itive": "it", "itivi": "it",
    "itivă": "it", "iţiune": "it",
    "itoare": "it", "itor": "it", "itori": "it",
}
_RO_S2_DEL = ("at", "ata", "ată", "ati", "ate", "ut", "uta", "ută",
              "uti", "ute", "it", "ita", "ită", "iti", "ite", "ic",
              "ica", "ice", "ici", "ică", "abil", "abila", "abile",
              "abili", "abilă", "ibil", "ibila", "ibile", "ibili",
              "ibilă", "oasa", "oasă", "oase", "osi", "oşi", "os",
              "ant", "anta", "ante", "anti", "antă", "ator", "atori",
              "itate", "itati", "ităi", "ităţi", "iv", "iva", "ive",
              "ivi", "ivă")
_RO_S2_IST = ("ism", "isme", "ist", "ista", "iste", "isti", "istă",
              "işti")
# verb suffixes: group 1 deleted only when preceded (in RV) by a
# consonant or by 'u'; group 2 deleted whenever in RV
_RO_V1 = ("are", "ere", "ire", "âre", "ind", "ând", "indu", "ându",
          "eze", "ească", "ez", "ezi", "ează", "esc", "eşti", "eşte",
          "ăsc", "ăşti", "ăşte", "am", "ai", "au", "eam", "eai", "ea",
          "eaţi", "eau", "iam", "iai", "ia", "iaţi", "iau", "ui",
          "aşi", "arăm", "arăţi", "ară", "uşi", "urăm", "urăţi",
          "ură", "işi", "irăm", "irăţi", "iră", "âi", "âşi", "ârăm",
          "ârăţi", "âră", "im", "âm", "em", "eţi", "iţi", "âţi",
          "ireţi", "âreţi", "ereţi", "areţi")
_RO_V2 = ("serăm", "serăţi", "seră", "sei", "se", "sesem", "seseşi",
          "sese", "seserăm", "seserăţi", "seseră", "sesem",
          "ăm", "aţi", "sem", "seşi", "ssem", "sseşi")


def _ro_prepare(w: str) -> str:
    w = w.lower().translate(_RO_COMMA)
    chars = list(w)
    n = len(w)
    for i, c in enumerate(w):
        if (c in "iu" and 0 < i < n - 1 and w[i - 1] in _RO_VOWELS
                and w[i + 1] in _RO_VOWELS):
            chars[i] = "I" if c == "i" else "U"
    return "".join(chars)


def romanian_stem(word: str) -> str:  # noqa: C901 — spec steps
    w = _ro_prepare(word)
    if len(w) <= 2:
        return w.lower()
    rv = _es_rv(w)  # the shared Romance RV definition
    r1, r2 = _r1_r2(w, _RO_VOWELS)

    # step 0: plural / article removal (longest, in R1)
    s = _longest(w, _RO_S0)
    if s and len(w) - len(s) >= r1:
        pos = len(w) - len(s)
        if s != "ile" or not w[:pos].endswith("ab"):
            w = w[:pos] + _RO_S0[s]

    # step 1: combining suffixes — repeat until no replacement
    while True:
        s = _longest(w, _RO_S1)
        if s and len(w) - len(s) >= r1:
            w = w[: -len(s)] + _RO_S1[s]
        else:
            break

    # step 2: standard suffixes (longest across groups, in R2)
    removed = False
    s = _longest(w, list(_RO_S2_DEL) + list(_RO_S2_IST)
                 + ["iune", "iuni"])
    if s:
        pos = len(w) - len(s)
        if s in ("iune", "iuni"):
            if pos >= r2 and pos > 0 and w[pos - 1] == "ţ":
                w, removed = w[: pos - 1] + "t", True
        elif s in _RO_S2_IST:
            if pos >= r2:
                w, removed = w[:pos] + "ist", True
        elif pos >= r2:
            w, removed = w[:pos], True

    # step 3 (only if steps 1-2 removed nothing): verb suffixes in RV
    if not removed:
        s = _longest(w, list(_RO_V1) + list(_RO_V2))
        if s:
            pos = len(w) - len(s)
            if s in _RO_V2:
                if pos >= rv:
                    w = w[:pos]
            elif (pos >= rv and pos > rv
                  and (w[pos - 1] not in _RO_VOWELS
                       or w[pos - 1] == "u")):
                w = w[:pos]

    # step 4: final vowel (longest of a/e/i/ie/ă) in RV
    s = _longest(w, ("ie", "a", "e", "i", "ă"))
    if s and len(w) - len(s) >= rv:
        w = w[: -len(s)]

    return w.lower()


# ---------------------------------------------------------------- finnish

_FI_VOWELS = frozenset("aeiouyäö")
_FI_LONG_V = ("aa", "ee", "ii", "oo", "uu", "ää", "öö")
_FI_CONS = frozenset("bcdfghjklmnpqrstvwxz")
_FI_STEP1 = ("kaan", "kään", "kin", "han", "hän", "ko", "kö", "pa",
             "pä")
_FI_CASES = ("seen", "siin", "tten", "den", "tta", "ttä", "ssa",
             "ssä", "sta", "stä", "lla", "llä", "lta", "ltä", "lle",
             "ksi", "ine", "na", "nä", "ta", "tä", "a", "ä", "n")
_FI_HXN = ("han", "hen", "hin", "hon", "hun", "hyn", "hän", "hön")


def finnish_stem(word: str) -> str:  # noqa: C901 — spec steps
    """Snowball Finnish, transcribed from the published description.
    The rarely-exercised step-6 tidying-up rules are implemented to
    the description's letter; bit-parity with the reference binary is
    claimed only for the documented vectors."""
    w = word.lower()
    r1, r2 = _r1_r2(w, _FI_VOWELS)

    # step 1: particles etc (in R1)
    s = _longest(w, _FI_STEP1 + ("sti",))
    if s:
        pos = len(w) - len(s)
        if s == "sti":
            if pos >= r2:
                w = w[:pos]
        elif pos >= r1 and pos > 0 and w[pos - 1] in "ntaeiouyäö":
            w = w[:pos]

    # step 2: possessives (in R1)
    s = _longest(w, ("nsa", "nsä", "mme", "nne", "si", "ni", "an",
                     "än", "en"))
    if s:
        pos = len(w) - len(s)
        if pos >= r1:
            if s == "si":
                if pos == 0 or w[pos - 1] != "k":
                    w = w[:pos]
            elif s == "ni":
                w = w[:pos]
                if w.endswith("kse"):
                    w = w[:-1] + "i"
            elif s in ("nsa", "nsä", "mme", "nne"):
                w = w[:pos]
            elif s == "an":
                if w[:pos].endswith(("ta", "ssa", "sta", "lla",
                                     "lta", "na")):
                    w = w[:pos]
            elif s == "än":
                if w[:pos].endswith(("tä", "ssä", "stä", "llä",
                                     "ltä", "nä")):
                    w = w[:pos]
            elif s == "en":
                if w[:pos].endswith(("lle", "ine")):
                    w = w[:pos]

    # step 3: cases (in R1)
    ended3 = False
    s = _longest(w, _FI_CASES + _FI_HXN)
    if s:
        pos = len(w) - len(s)
        if pos >= r1:
            if s in _FI_HXN:
                # hXn: delete if the preceding letter equals X
                if pos > 0 and w[pos - 1] == s[1]:
                    w, ended3 = w[:pos], True
            elif s in ("siin", "den", "tten"):
                # preceded by Vi (vowel + i)
                if (pos >= 2 and w[pos - 1] == "i"
                        and w[pos - 2] in _FI_VOWELS):
                    w, ended3 = w[:pos], True
            elif s == "seen":
                if w[:pos].endswith(_FI_LONG_V):
                    w, ended3 = w[:pos], True
            elif s in ("a", "ä"):
                # preceded by consonant + vowel
                if (pos >= 2 and w[pos - 1] in _FI_VOWELS
                        and w[pos - 2] in _FI_CONS):
                    w, ended3 = w[:pos], True
            elif s in ("tta", "ttä"):
                if pos > 0 and w[pos - 1] == "e":
                    w, ended3 = w[:pos], True
            elif s == "n":
                w, ended3 = w[:pos], True
                if w.endswith(_FI_LONG_V) or w.endswith("ie"):
                    w = w[:-1]
            else:
                w, ended3 = w[:pos], True

    # step 4: other endings (in R2)
    s = _longest(w, ("impi", "impa", "impä", "immi", "imma", "immä",
                     "mpi", "mpa", "mpä", "mmi", "mma", "mmä",
                     "eja", "ejä"))
    if s:
        pos = len(w) - len(s)
        if pos >= r2:
            if s in ("mpi", "mpa", "mpä", "mmi", "mma", "mmä"):
                if not w[:pos].endswith("po"):
                    w = w[:pos]
            else:
                w = w[:pos]

    # step 5: plurals
    if ended3:
        if w and w[-1] in "ij" and len(w) - 1 >= r1:
            w = w[:-1]
    else:
        if (w.endswith("t") and len(w) - 1 >= r1 and len(w) >= 2
                and w[-2] in _FI_VOWELS):
            w = w[:-1]
            s = _longest(w, ("imma", "mma"))
            if s and len(w) - len(s) >= r2:
                if s == "imma" or not w[: -len(s)].endswith("po"):
                    w = w[: -len(s)]

    # step 6: tidying up (each substep in turn, conditions in R1)
    if w.endswith(_FI_LONG_V) and len(w) - 1 >= r1:
        w = w[:-1]                                   # a) LV -> V
    if (len(w) >= 2 and w[-1] in "aäei" and w[-2] in _FI_CONS
            and len(w) - 1 >= r1):
        w = w[:-1]                                   # b) cX -> c
    if (w.endswith("oj") or w.endswith("uj")) and len(w) - 1 >= r1:
        w = w[:-1]                                   # c) oj/uj -> o/u
    if w.endswith("jo") and len(w) - 1 >= r1:
        w = w[:-1]                                   # d) jo -> j
    # e) undouble a final double consonant (possibly followed by
    # trailing vowels)
    i = len(w) - 1
    while i >= 0 and w[i] in _FI_VOWELS:
        i -= 1
    if i >= 1 and w[i] in _FI_CONS and w[i - 1] == w[i]:
        w = w[:i] + w[i + 1:]

    return w
