"""Tokenization — reference: Words.cpp (Words::set), UTF-8 word
segmentation into alnum runs (SURVEY.md §2.8 X1).

Two modes, both vectorized (no per-row Python):

* simple  — split on whitespace, JVM-side (`F.split`): zero Python,
  whole-stage-codegen. This is the exact semantics of the driver's
  `documents.text` fixture (space-separated tokens) and the fast path
  for pre-tokenized corpora.
* code    — code-aware identifier splitting (camelCase, snake_case,
  digit runs, operators dropped) for the source-code corpus
  (input_hint: content is source code). Arrow-batched pandas_udf over
  `pd.Series.str` — vectorized C string ops, never a Python-level
  per-row loop.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

# A token is a letter/digit/underscore run; splits happen at
#   lower->Upper   (camelCase)          fooBar    -> foo bar
#   Upper+lower after Upper run (HTTPServer -> http server)
#   letter<->digit boundaries           utf8 -> utf 8
#   '_' and any non-alnum               snake_case -> snake case
_CAMEL_1 = r"(?<=[a-z0-9])(?=[A-Z])"
_CAMEL_2 = r"(?<=[A-Z])(?=[A-Z][a-z])"
_ALNUM_RUN = r"[A-Za-z]+|[0-9]+"


def _code_tokenize_series(s: pd.Series, lowercase: bool) -> pd.Series:
    # all ops are pandas/C vectorized over the whole Arrow batch;
    # lowering happens on the Series BEFORE findall (camel boundaries
    # are already spaces by then) — no per-row Python anywhere
    s = s.fillna("")
    s = s.str.replace(_CAMEL_1, " ", regex=True)
    s = s.str.replace(_CAMEL_2, " ", regex=True)
    if lowercase:
        s = s.str.lower()
    return s.str.findall(_ALNUM_RUN)


def code_tokens_udf(lowercase: bool = True):
    @F.pandas_udf(ArrayType(StringType()))
    def _tok(s: pd.Series) -> pd.Series:
        return _code_tokenize_series(s, lowercase)

    return _tok


def tokens_col(text: Column, mode: str = "simple", lowercase: bool = True) -> Column:
    """Return an array<string> column of tokens for `text`."""
    if mode == "simple":
        col = text
        if lowercase:
            col = F.lower(col)
        # split on whitespace runs, drop empties (JVM-side, codegen'd)
        arr = F.split(col, r"\s+")
        return F.filter(arr, lambda t: t != F.lit(""))
    if mode == "code":
        return code_tokens_udf(lowercase)(text)
    raise ValueError(f"unknown tokenizer mode: {mode}")
