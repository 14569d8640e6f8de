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


def _code_tokenize_series(
    s: pd.Series, lowercase: bool, stopwords: frozenset | tuple = ()
) -> pd.Series:
    # all ops are pandas/C vectorized over the whole Arrow batch;
    # lowering happens on the Series BEFORE findall (camel boundaries
    # are already spaces by then) — no per-row Python anywhere.
    # Unicode pin (tested in test_tokenizer): lowercasing first means a
    # non-ASCII char whose lowercase maps into ASCII (U+212A KELVIN
    # SIGN → 'k', 'İ' → 'i'+combining dot) yields ASCII tokens; this is
    # the contract for code corpora (stray Unicode in identifiers folds
    # to its ASCII skeleton rather than vanishing).
    s = s.fillna("")
    s = s.str.replace(_CAMEL_1, " ", regex=True)
    s = s.str.replace(_CAMEL_2, " ", regex=True)
    if lowercase:
        s = s.str.lower()
    toks = s.str.findall(_ALNUM_RUN)
    if stopwords:
        toks = _drop_stopwords(toks, stopwords)
    return toks


def _drop_stopwords(toks: pd.Series, stopwords) -> pd.Series:
    """Remove stopwords from a Series of token lists — flat-explode,
    np.isin mask, regroup by row: whole-batch numpy, no per-row loop."""
    import numpy as np

    lens = toks.str.len().to_numpy()
    if lens.sum() == 0:
        return toks
    flat = np.concatenate([np.asarray(t, dtype=object) for t in toks])
    row = np.repeat(np.arange(len(toks)), lens)
    keep = ~np.isin(flat, np.asarray(sorted(stopwords), dtype=object))
    kept = pd.Series(flat[keep]).groupby(row[keep]).agg(list)
    out = pd.Series([[]] * len(toks), index=range(len(toks)), dtype=object)
    out[kept.index] = kept
    out.index = toks.index
    return out


def code_tokens_udf(lowercase: bool = True, stopwords: frozenset | tuple = ()):
    stop = tuple(sorted(stopwords))

    @F.pandas_udf(ArrayType(StringType()))
    def _tok(s: pd.Series) -> pd.Series:
        return _code_tokenize_series(s, lowercase, stop)

    return _tok


def tokens_col(
    text: Column,
    mode: str = "simple",
    lowercase: bool = True,
    stopwords: frozenset | tuple = (),
) -> Column:
    """Return an array<string> column of tokens for `text`.

    ``stopwords`` (X6 — reference: StopWords.cpp isStopWord tables,
    SURVEY.md §2.8) drops the listed terms post-fold in BOTH modes;
    empty set = keep everything (the driver-oracle contract)."""
    if mode == "simple":
        col = text
        if lowercase:
            col = F.lower(col)
        # split on whitespace runs, drop empties (JVM-side, codegen'd)
        arr = F.split(col, r"\s+")
        if stopwords:
            stop_arr = F.array(*[F.lit(s) for s in sorted(stopwords)])
            return F.filter(
                arr,
                lambda t: (t != F.lit("")) & ~F.array_contains(stop_arr, t),
            )
        return F.filter(arr, lambda t: t != F.lit(""))
    if mode == "code":
        return code_tokens_udf(lowercase, stopwords)(text)
    raise ValueError(f"unknown tokenizer mode: {mode}")
