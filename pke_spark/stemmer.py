"""Porter stemmer (Martin Porter, 1980) — pure Python, vectorized over
pandas Series for use in Arrow-batched UDFs.

This is the engine's ``normalization='stemming'`` mode, the analog of
pke's Snowball/Porter normalization step (pke/base.py:110-123: every
pke model runs on stems by default; ``normalization=None`` falls back
to lowercasing, which is the engine's default tokenizer output).

Implementation notes:
- The ORIGINAL 1980 algorithm as published (steps 1a-5b, longest-match
  rule selection within each step, words of length <= 2 unchanged).
  The later Snowball revisions (logi->log etc.) are deliberately not
  included; unit tests pin the published example vectors
  (tests/test_stemmer.py).
- Vectorization: each Arrow batch stems its DISTINCT tokens once
  (memoized dict), then maps — O(unique terms) Python work per batch,
  not O(rows).
- The DuckDB oracle twin cannot run Python, so stemmed-query oracles
  inline a (term -> stem) VALUES map computed by THIS function over the
  oracle corpus vocabulary (see ops/stemmed.py). The oracle therefore
  verifies the distributed dataflow; the stemmer itself is verified by
  the golden-vector unit tests.
"""

from __future__ import annotations

import pandas as pd

_VOWELS = frozenset("aeiou")


def _cons(w: str, i: int) -> bool:
    c = w[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return i == 0 or not _cons(w, i - 1)
    return True


def _measure(w: str) -> int:
    """m in the C?(VC){m}V? decomposition."""
    n, i, m = len(w), 0, 0
    while i < n and _cons(w, i):
        i += 1
    while True:
        while i < n and not _cons(w, i):
            i += 1
        if i >= n:
            return m
        m += 1
        while i < n and _cons(w, i):
            i += 1
        if i >= n:
            return m


def _has_vowel(w: str) -> bool:
    return any(not _cons(w, i) for i in range(len(w)))


def _double_cons(w: str) -> bool:
    return len(w) >= 2 and w[-1] == w[-2] and _cons(w, len(w) - 1)


def _cvc(w: str) -> bool:
    """ends consonant-vowel-consonant, final consonant not w/x/y."""
    if len(w) < 3:
        return False
    return (_cons(w, len(w) - 3) and not _cons(w, len(w) - 2)
            and _cons(w, len(w) - 1) and w[-1] not in "wxy")


_STEP2 = [("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
          ("anci", "ance"), ("izer", "ize"), ("abli", "able"),
          ("alli", "al"), ("entli", "ent"), ("eli", "e"),
          ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
          ("ator", "ate"), ("alism", "al"), ("iveness", "ive"),
          ("fulness", "ful"), ("ousness", "ous"), ("aliti", "al"),
          ("iviti", "ive"), ("biliti", "ble")]
_STEP3 = [("icate", "ic"), ("ative", ""), ("alize", "al"),
          ("iciti", "ic"), ("ical", "ic"), ("ful", ""), ("ness", "")]
_STEP4 = ["al", "ance", "ence", "er", "ic", "able", "ible", "ant",
          "ement", "ment", "ent", "ion", "ou", "ism", "ate", "iti",
          "ous", "ive", "ize"]


def _longest_rule(w: str, rules):
    """The rule whose suffix is the longest match (Porter applies only
    that rule within a step, even if its condition then fails)."""
    best = None
    for suf, rep in rules:
        if w.endswith(suf) and (best is None or len(suf) > len(best[0])):
            best = (suf, rep)
    return best


def porter_stem(word: str) -> str:
    w = word.lower()
    if len(w) <= 2:
        return w

    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]

    # step 1b
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    else:
        flag = False
        if w.endswith("ed") and _has_vowel(w[:-2]):
            w, flag = w[:-2], True
        elif w.endswith("ing") and _has_vowel(w[:-3]):
            w, flag = w[:-3], True
        if flag:
            if w.endswith(("at", "bl", "iz")):
                w += "e"
            elif _double_cons(w) and w[-1] not in "lsz":
                w = w[:-1]
            elif _measure(w) == 1 and _cvc(w):
                w += "e"

    # step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"

    # step 2
    r = _longest_rule(w, _STEP2)
    if r and _measure(w[:-len(r[0])]) > 0:
        w = w[:-len(r[0])] + r[1]

    # step 3
    r = _longest_rule(w, _STEP3)
    if r and _measure(w[:-len(r[0])]) > 0:
        w = w[:-len(r[0])] + r[1]

    # step 4
    best = None
    for suf in _STEP4:
        if w.endswith(suf) and (best is None or len(suf) > len(best)):
            best = suf
    if best is not None:
        stem = w[:-len(best)]
        if _measure(stem) > 1:
            if best != "ion" or (stem and stem[-1] in "st"):
                w = stem

    # step 5a
    if w.endswith("e"):
        stem = w[:-1]
        m = _measure(stem)
        if m > 1 or (m == 1 and not _cvc(stem)):
            w = stem

    # step 5b
    if _measure(w) > 1 and _double_cons(w) and w.endswith("l"):
        w = w[:-1]

    return w


def _stemmers() -> dict:
    """Name -> stem function registry ('porter' + the implemented
    Snowball variants; lang.stemmer_name_for resolves langcodes to
    these names with pke's Porter fallback for the rest)."""
    from . import snowball
    return {"porter": porter_stem,
            "spanish": snowball.spanish_stem,
            "french": snowball.french_stem,
            "german": snowball.german_stem,
            "russian": snowball.russian_stem,
            "dutch": snowball.dutch_stem,
            "swedish": snowball.swedish_stem,
            "norwegian": snowball.norwegian_stem,
            "danish": snowball.danish_stem,
            "italian": snowball.italian_stem,
            "portuguese": snowball.portuguese_stem,
            "romanian": snowball.romanian_stem,
            "finnish": snowball.finnish_stem}


def stem_series(s: pd.Series, stemmer: str = "porter") -> pd.Series:
    """Series[str] -> Series[str], memoized over distinct tokens."""
    fn = _stemmers()[stemmer]
    uniq = pd.Series(s.dropna().unique())
    memo = dict(zip(uniq, uniq.map(fn)))
    return s.map(memo)
