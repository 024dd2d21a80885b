"""Snowball stemmers for Spanish, French and German — from-scratch
implementations of M.F. Porter's published Snowball algorithm
descriptions (snowballstem.org), pure Python, suitable for the same
memoized-per-batch vectorization as the English Porter stemmer
(stemmer.py).

This closes the reference's multi-language normalization surface
(pke/lang.py:23-47 + pke/base.py:110-123: ``SnowballStemmer(
langcodes[lang])`` for every non-English language): ``lang.
stemmer_name_for`` now dispatches 'fr'/'de'/'es' here instead of
falling back to Porter, and keeps pke's exact warn-and-fall-back
semantics for the still-unimplemented languages.

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
