"""Code-aware tokenizer — ONE spec, THREE synchronized implementations.

Spec (replaces the reference's spaCy tokenizer, pke/readers.py:60-116,
with a code-aware equivalent per BASELINE.json input_hint):

1. split camelCase boundaries:  ``([a-z0-9])([A-Z])``  -> "w1 W2"
2. split acronym boundaries:    ``([A-Z]+)([A-Z][a-z])`` -> "HTML Parser"
3. lowercase
4. every non-[a-z0-9] run becomes a single space (splits snake_case,
   dots, operators, punctuation — analog of pke's ``_is_alphanum``
   filter, pke/base.py:369-381, applied at the lexical level)
5. split on single spaces; drop empties

Token positions are 1-based everywhere (Spark ``posexplode`` is 0-based,
DuckDB ``generate_subscripts`` is 1-based — we standardize on 1-based).

The implementations MUST stay in lockstep; ``tests/test_tokenizer.py``
asserts Spark == pandas == Arrow == DuckDB on fixture strings and on
real tables, and invariance to batch size / partition count
(reader-equivalence analog of the reference's tests/test_reading.py).

Non-ASCII scripts: the spec is parameterized by PROFILES — a
per-script token character class ('code' is the default above;
'latin' and 'cyrillic' cover the reference's non-English languages,
pke/lang.py:23-47) — with the same lockstep guarantee per profile.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

# ---- the regex spec (plain ASCII, identical semantics in java.util.regex,
# Python re, and DuckDB's RE2) ----
CAMEL1 = r"([a-z0-9])([A-Z])"
CAMEL2 = r"([A-Z]+)([A-Z][a-z])"
NON_ALNUM = r"[^a-z0-9]+"

_RE_CAMEL1 = re.compile(CAMEL1)
_RE_CAMEL2 = re.compile(CAMEL2)
_RE_NON_ALNUM = re.compile(NON_ALNUM)

# ---- per-script tokenizer PROFILES (pke tokenizes any spaCy-supported
# script, pke/readers.py:60-116; the engine's analog is a per-language
# token character class, identical across all four implementations and
# the DuckDB twin). 'code' is the default and is byte-identical to the
# original spec; natural-language profiles drop the camelCase passes
# (an identifier convention, not prose) and keep the script's letters.
# All classes are plain ranges that mean the same thing in
# java.util.regex (Spark), Python re, and RE2 (DuckDB + pyarrow). ----
PROFILES: dict[str, dict] = {
    # camel splits + ASCII alnum tokens (identifiers, English)
    "code": {"camel": True, "nontoken": NON_ALNUM},
    # accented Latin: a-z + Latin-1 Supplement lowercase letters +
    # Latin Extended-A (ā..ž: covers œ š ž ă ł ...) + Extended-B
    # Ș/ș Ț/ț (Romanian). Literal characters, not \u escapes, so the
    # pattern bytes are identical in java.util.regex, re, and RE2.
    "latin": {"camel": False,
              "nontoken": "[^a-z0-9ßà-öø-ÿĀ-ſȘ-ț]+"},
    # Cyrillic + ASCII alnum (mixed ru prose quoting code/identifiers)
    "cyrillic": {"camel": False,
                 "nontoken": "[^a-z0-9а-яё]+"},
}

# langcode -> profile (code languages + 'en' stay on the default)
_LANG_PROFILES = {"ru": "cyrillic"}
_LANG_PROFILES.update({c: "latin" for c in
                       ("fr", "de", "es", "it", "pt", "ro", "da",
                        "sv", "nb", "fi", "nl")})


def profile_for(lang: str) -> str:
    return _LANG_PROFILES.get(lang, "code")

# ---- language-gated stoplists (analog of pke/lang.py:23-47 per-language
# stoplists + the POS gate F6 of SURVEY §2.4; for code langs these are the
# language keywords — the "stopwords of code") ----
CODE_STOPLISTS: dict[str, tuple[str, ...]] = {
    "python": ("def", "class", "import", "from", "return", "if", "else",
               "elif", "for", "while", "in", "not", "and", "or", "is",
               "none", "true", "false", "self", "pass", "with", "as",
               "try", "except", "raise", "lambda", "yield"),
    "java": ("public", "private", "protected", "static", "void", "class",
             "import", "package", "return", "if", "else", "for", "while",
             "new", "this", "final", "int", "long", "string", "boolean",
             "null", "true", "false", "try", "catch", "throws"),
    "js": ("function", "var", "let", "const", "return", "if", "else",
           "for", "while", "new", "this", "null", "undefined", "true",
           "false", "import", "export", "from", "async", "await", "class"),
    "go": ("func", "package", "import", "return", "if", "else", "for",
           "range", "var", "const", "type", "struct", "interface", "map",
           "chan", "go", "defer", "nil", "true", "false", "err"),
}

# natural-language stoplist used for the driver `documents` table
# (langs en/de/zh/es/fr share synthetic English-ish text)
TEXT_STOPWORDS: tuple[str, ...] = (
    "a", "an", "the", "and", "or", "of", "to", "in", "on", "for",
    "with", "is", "are", "was", "be", "as", "at", "by", "it", "this",
    "that", "from",
)


def stoplist_for(lang: str) -> tuple[str, ...]:
    return CODE_STOPLISTS.get(lang, TEXT_STOPWORDS)


# =====================================================================
# 1) Spark Column implementation (JVM-side, whole-stage codegen — the
#    hot path; no Python involved)
# =====================================================================

def tokens_array(col: Column | str) -> Column:
    """content -> array<string> of tokens (Catalyst-native).

    Avoids higher-order functions: an ArrayFilter in the tree forces
    the WHOLE expression (all regex passes) onto the interpreted eval
    path — no whole-stage codegen, boxed per-row evaluation (observed
    via jstack as RegExpReplace.nullSafeEval under the index build).
    array_remove is a plain codegen-friendly expression with identical
    semantics (drop empty tokens after a literal-space split).
    """
    c = F.col(col) if isinstance(col, str) else col
    return tokens_array_profiled(c, "code")


def tokens_array_profiled(col: Column | str, profile: str) -> Column:
    """Profile-parameterized variant of ``tokens_array`` (same Catalyst
    shape; 'code' reproduces it exactly)."""
    p = PROFILES[profile]
    x = F.col(col) if isinstance(col, str) else col
    if p["camel"]:
        x = F.regexp_replace(x, CAMEL1, r"$1 $2")
        x = F.regexp_replace(x, CAMEL2, r"$1 $2")
    x = F.lower(x)
    x = F.regexp_replace(x, p["nontoken"], " ")
    x = F.trim(x)
    return F.array_remove(F.split(x, " "), "")


def tokens_exploded(df, text_col: str = "text", id_col: str = "doc_id",
                    profile: str = "code"):
    """documents -> (doc_id, pos [1-based], term), one row per token."""
    return (
        df.select(F.col(id_col).alias("doc_id"),
                  F.posexplode(tokens_array_profiled(text_col, profile))
                  .alias("pos0", "term"))
        .select("doc_id", (F.col("pos0") + 1).alias("pos"), "term")
    )


# =====================================================================
# 2) pandas-vectorized implementation (used inside mapInPandas readers
#    and by the single-node oracle; .str ops are C-vectorized)
# =====================================================================

def tokenize_series(s: pd.Series, profile: str = "code") -> pd.Series:
    """Series[str] -> Series[list[str]] (vectorized, no per-row Python)."""
    p = PROFILES[profile]
    x = s.fillna("").astype(str)
    if p["camel"]:
        x = x.str.replace(CAMEL1, r"\1 \2", regex=True)
        x = x.str.replace(CAMEL2, r"\1 \2", regex=True)
    x = x.str.lower()
    x = x.str.replace(p["nontoken"], " ", regex=True)
    x = x.str.strip()
    return x.str.split(" ").map(lambda toks: [t for t in toks if t])


def tokenize_text(text: str, profile: str = "code") -> list[str]:
    """Single-string convenience (tests / oracle)."""
    p = PROFILES[profile]
    x = text
    if p["camel"]:
        x = _RE_CAMEL1.sub(r"\1 \2", x)
        x = _RE_CAMEL2.sub(r"\1 \2", x)
    x = re.sub(p["nontoken"], " ", x.lower()).strip()
    return [t for t in x.split(" ") if t]


# =====================================================================
# 2b) Arrow-native implementation (pyarrow.compute / RE2, zero Python
#     per row — the `mapInArrow` ingest path of BASELINE input_hint:
#     "tokenize content via vectorized Arrow/pandas UDFs"). Keeps all
#     string churn in Arrow buffers, off the JVM heap. Measured at
#     parity with the Catalyst path on the segments phase (the RE2 win
#     is spent on the Arrow IPC transfer of the exploded tokens), so
#     the Catalyst expression stays the default; this path is for
#     ingest pipelines that are already inside mapInArrow/mapInPandas.
# =====================================================================

def arrow_tokenize_batch(batch, text_col: str = "text",
                         id_col: str = "doc_id",
                         profile: str = "code"):
    """RecordBatch(id, text) -> RecordBatch(doc_id, term) exploded.

    Lockstep with the other three implementations (tests/test_tokenizer
    compares all outputs). All steps are pyarrow.compute kernels (C++,
    RE2): two camel splits, lower, non-alnum collapse, trim, split,
    empty-token filter via flatten + parent-index mask.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    p = PROFILES[profile]
    x = batch.column(text_col)
    if p["camel"]:
        x = pc.replace_substring_regex(x, pattern=CAMEL1,
                                       replacement=r"\1 \2")
        x = pc.replace_substring_regex(x, pattern=CAMEL2,
                                       replacement=r"\1 \2")
    x = pc.utf8_lower(x)
    x = pc.replace_substring_regex(x, pattern=p["nontoken"],
                                   replacement=" ")
    x = pc.utf8_trim_whitespace(x)
    lists = pc.split_pattern(x, pattern=" ")
    flat = pc.list_flatten(lists)
    parent = pc.list_parent_indices(lists)
    mask = pc.not_equal(flat, "")
    return pa.RecordBatch.from_arrays(
        [pc.take(batch.column(id_col), pc.filter(parent, mask)),
         pc.filter(flat, mask)],
        names=["doc_id", "term"])


def arrow_tokens_exploded(df, text_col: str = "text",
                          id_col: str = "doc_id"):
    """documents -> (doc_id, term) via mapInArrow (Arrow-native path)."""
    def gen(it):
        for batch in it:
            yield arrow_tokenize_batch(batch, text_col, id_col)
    return (df.select(F.col(id_col).alias(id_col),
                      F.col(text_col).alias(text_col))
            .mapInArrow(gen, f"{id_col} long, term string"))


# =====================================================================
# 3) DuckDB SQL implementation (the oracle twin; RE2 regex, \1 backrefs,
#    'g' global flag)
# =====================================================================

def duckdb_tokens_expr(text_col: str, profile: str = "code") -> str:
    """SQL expression: text column -> LIST of tokens."""
    p = PROFILES[profile]
    inner = text_col
    if p["camel"]:
        inner = (f"regexp_replace(regexp_replace({text_col}, "
                 "'([a-z0-9])([A-Z])', '\\1 \\2', 'g'), "
                 "'([A-Z]+)([A-Z][a-z])', '\\1 \\2', 'g')")
    nontoken = p["nontoken"].replace("'", "''")
    return (
        f"list_filter(string_split(trim(regexp_replace(lower({inner}), "
        f"'{nontoken}', ' ', 'g')), ' '), t -> t <> '')"
    )


def duckdb_toks_cte(table: str = "documents", text_col: str = "text",
                    id_col: str = "doc_id", profile: str = "code") -> str:
    """CTE body: `tl` (token lists) and `toks` (doc_id, pos, term)."""
    return (
        f"tl AS (SELECT {id_col} AS doc_id, "
        f"{duckdb_tokens_expr(text_col, profile)} AS toks FROM {table}),\n"
        "toks AS (SELECT doc_id, unnest(toks) AS term, "
        "generate_subscripts(toks, 1) AS pos FROM tl)"
    )


def sql_quote(s: str) -> str:
    """SQL single-quoted string literal (the one escaping site)."""
    return "'" + s.replace("'", "''") + "'"


def sql_str_list(items) -> str:
    """('a','b') -> "('a','b')" for IN clauses (items must be sql-safe)."""
    return "(" + ", ".join(sql_quote(i) for i in items) + ")"
