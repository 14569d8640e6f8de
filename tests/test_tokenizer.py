"""Tokenizer goldens (SURVEY.md §2.8 X1, §5.1)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from open_source_search_engine_spark.functions.tokenizer import (
    _code_tokenize_series,
    tokens_col,
)


def _simple(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    return [r[0] for r in df.select(tokens_col(F.col("text"), mode="simple")).collect()]


def test_simple_matches_whitespace_split(spark):
    texts = ["a b  c", "  leading", "trailing  ", "", "ONE Two three"]
    got = _simple(spark, texts)
    assert got == [
        ["a", "b", "c"],
        ["leading"],
        ["trailing"],
        [],
        ["one", "two", "three"],
    ]


def test_code_tokenizer_goldens():
    cases = {
        "fooBar": ["foo", "bar"],
        "snake_case_name": ["snake", "case", "name"],
        "HTTPServer2": ["http", "server", "2"],
        "utf8_decode()": ["utf", "8", "decode"],
        "x+=1;": ["x", "1"],
        "": [],
        "readFileToString": ["read", "file", "to", "string"],
    }
    got = _code_tokenize_series(pd.Series(list(cases)), lowercase=True)
    for (src, want), toks in zip(cases.items(), got):
        assert toks == want, f"{src}: {toks} != {want}"


def test_code_tokenizer_is_vectorized_nullsafe():
    s = pd.Series([None, "aB"])
    out = _code_tokenize_series(s, lowercase=True)
    assert list(out) == [[], ["a", "b"]]


def test_stopwords_simple_mode(spark):
    df = spark.createDataFrame([("the quick the fox",), ("the the",)], "text string")
    got = [
        r[0]
        for r in df.select(
            tokens_col(F.col("text"), mode="simple", stopwords=frozenset({"the"}))
        ).collect()
    ]
    assert got == [["quick", "fox"], []]


def test_stopwords_code_mode():
    out = _code_tokenize_series(
        pd.Series(["theValue = the + x", "nothing"]),
        lowercase=True,
        stopwords=("the",),
    )
    # camel split happens BEFORE stopword removal: theValue → the value
    assert list(out) == [["value", "x"], ["nothing"]]


def test_unicode_lowercase_pin():
    """Pinned contract (ADVICE r01): lowercasing precedes findall, so
    non-ASCII chars whose lowercase folds into ASCII yield tokens
    ('İ'.lower() == 'i' + combining dot → 'i'; KELVIN SIGN → 'k').
    Stray Unicode in identifiers folds to its ASCII skeleton rather
    than being dropped."""
    out = _code_tokenize_series(pd.Series(["K", "İstanbul"]), lowercase=True)
    assert list(out) == [["k"], ["i", "stanbul"]]
