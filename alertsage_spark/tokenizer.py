"""Code-aware tokenizer — ONE spec, three parity-tested implementations.

Spec (applied in order):
  1. camelCase boundary:  insert a space between ``[a-z0-9]`` and ``[A-Z]``
  2. acronym boundary:    insert a space between ``[A-Z]+`` and ``[A-Z][a-z]``
  3. lowercase
  4. snake_case split:    ``_`` -> space
  5. token extraction:    all matches of ``[a-z][a-z0-9]+``  (>=2 chars,
     starts with a letter — generalizes the reference's sklearn
     ``token_pattern=r"(?u)\\b[a-z][a-z0-9]+\\b"``, see
     /root/reference/notebooks/02_prepare_text_and_features.ipynb cell 9,
     and its shared scalar normalizer
     /root/reference/src/triage/preprocess.py:4-47)
  6. optional ``code`` mode: additionally emit character trigrams of each
     token of length >= 4, prefixed ``#`` (so term namespaces can't
     collide), per the north rule's "identifier + trigram terms".

Implementations:
  * :func:`tokenize_col`  — pure Spark SQL Column expression (JVM-side,
    whole-stage-codegen friendly; ZERO Python on the hot path).
  * :func:`tokenize_pandas_udf` — vectorized Arrow/pandas UDF variant
    (the north rule's required UDF form; used where the SQL form gets
    unwieldy, e.g. trigram mode on very wide rows).
  * :func:`tokenize_py`   — pure-Python reference implementation used by
    the independent BM25 oracle and unit tests.
  * :func:`duckdb_tokens_sql` — a DuckDB SQL fragment producing the same
    token list, used by the driver's DuckDB correctness oracle.

All four MUST stay in lockstep; tests/test_tokenizer.py asserts parity.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# one escape level per consumer; keep raw patterns here
CAMEL1 = ("([a-z0-9])([A-Z])", " ")  # fooBar -> foo Bar
CAMEL2 = ("([A-Z]+)([A-Z][a-z])", " ")  # HTTPServer -> HTTP Server
TOKEN_RE = "[a-z][a-z0-9]+"
TRIGRAM_MIN_LEN = 4
TRIGRAM_PREFIX = "#"


# ---------------------------------------------------------------- Spark SQL
def _normalize_col(col: Column) -> Column:
    c = F.regexp_replace(col, CAMEL1[0], r"$1 $2")
    c = F.regexp_replace(c, CAMEL2[0], r"$1 $2")
    c = F.lower(c)
    c = F.replace(c, F.lit("_"), F.lit(" "))
    return c


def tokenize_col(col: Column, mode: str = "text") -> Column:
    """Token array as a pure Spark SQL expression (ArrayType(StringType)).

    ``mode='code'`` additionally emits '#'-prefixed character trigrams of
    every token with length >= 4, via higher-order functions (still fully
    JVM-side).
    """
    toks = F.regexp_extract_all(_normalize_col(col), F.lit(TOKEN_RE), F.lit(0))
    if mode == "text":
        return toks
    if mode != "code":
        raise ValueError(f"unknown tokenizer mode: {mode}")
    trigrams = F.flatten(
        F.transform(
            F.filter(toks, lambda t: F.length(t) >= TRIGRAM_MIN_LEN),
            lambda t: F.transform(
                F.sequence(F.lit(1), F.length(t) - 2),
                lambda i: F.concat(F.lit(TRIGRAM_PREFIX), t.substr(i, F.lit(3))),
            ),
        )
    )
    return F.concat(toks, trigrams)


# ------------------------------------------------------------- pandas UDF
_CAMEL1_C = re.compile(CAMEL1[0])
_CAMEL2_C = re.compile(CAMEL2[0])
_TOKEN_C = re.compile(TOKEN_RE)


def tokenize_py(text: str, mode: str = "text") -> list[str]:
    """Pure-Python reference implementation (oracle + unit tests)."""
    if text is None:
        return []
    s = _CAMEL1_C.sub(r"\1 \2", text)
    s = _CAMEL2_C.sub(r"\1 \2", s)
    s = s.lower().replace("_", " ")
    toks = _TOKEN_C.findall(s)
    if mode == "code":
        tris = [
            TRIGRAM_PREFIX + t[i : i + 3]
            for t in toks
            if len(t) >= TRIGRAM_MIN_LEN
            for i in range(len(t) - 2)
        ]
        return toks + tris
    return toks


def tokenize_pandas_udf(mode: str = "text"):
    """Vectorized Arrow/pandas UDF form (Series[str] -> Series[list[str]]).

    Arrow-batched (ArrowEvalPython in the plan, never BatchEvalPython);
    the per-batch body leans on pandas vectorized str ops for the
    normalization stages and a single compiled-regex findall per cell.
    """

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _tok(s: pd.Series) -> pd.Series:
        s = s.fillna("")
        s = s.str.replace(_CAMEL1_C, r"\1 \2", regex=True)
        s = s.str.replace(_CAMEL2_C, r"\1 \2", regex=True)
        s = s.str.lower().str.replace("_", " ", regex=False)
        if mode == "code":
            return s.map(lambda x: _findall_with_trigrams(x))
        return s.map(_TOKEN_C.findall)

    return _tok


def _findall_with_trigrams(s: str) -> list[str]:
    toks = _TOKEN_C.findall(s)
    tris = [
        TRIGRAM_PREFIX + t[i : i + 3]
        for t in toks
        if len(t) >= TRIGRAM_MIN_LEN
        for i in range(len(t) - 2)
    ]
    return toks + tris


# ----------------------------------------------------------------- DuckDB
def duckdb_tokens_sql(col_expr: str) -> str:
    """DuckDB SQL fragment: same token list (text mode) for the driver's
    correctness oracle. DuckDB regexp_replace needs the 'g' flag and
    backslash backrefs (RE2)."""
    return (
        "regexp_extract_all("
        "replace(lower("
        f"regexp_replace(regexp_replace({col_expr}, "
        f"'{CAMEL1[0]}', '\\1 \\2', 'g'), "
        f"'{CAMEL2[0]}', '\\1 \\2', 'g')"
        "), '_', ' '), "
        f"'{TOKEN_RE}')"
    )
