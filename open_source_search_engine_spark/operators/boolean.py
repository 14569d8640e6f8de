"""Boolean / set-operator query surface over posting lists.

Reference: Query.cpp term signs + boolean Expression evaluation
(SURVEY.md §2.2 F1/F2/F5, §2.7 U1-U3). In DataFrame algebra these are
semi/anti joins and distinct unions over the per-term doc-id sets —
Catalyst turns the tiny term-set filters into broadcast-able plans and
prunes the postings scan by `term`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from open_source_search_engine_spark.operators.postings import doc_tokens


def _term_docs(docs: DataFrame, terms: list[str], tokenizer_mode: str = "simple") -> DataFrame:
    """(doc_id, term) distinct pairs for the given terms."""
    toks = doc_tokens(docs, mode=tokenizer_mode)
    return toks.filter(F.col("term").isin(list(set(terms)))).select("doc_id", "term").distinct()


def term_lookup(docs: DataFrame, term: str, tokenizer_mode: str = "simple") -> DataFrame:
    """Single-term posting list (doc_id, tf) — the Rdb list read
    (SURVEY §2.1 S3) in oracle form."""
    toks = doc_tokens(docs, mode=tokenizer_mode)
    return (
        toks.filter(F.col("term") == term)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
        .orderBy("doc_id")
    )


def and_intersect(docs: DataFrame, terms: list[str], tokenizer_mode: str = "simple") -> DataFrame:
    """Docs containing ALL terms (J1 oracle form: count-distinct
    equality beats a k-way self-join chain — one shuffle, no skew
    amplification)."""
    n = len(set(terms))
    td = _term_docs(docs, terms, tokenizer_mode)
    return (
        td.groupBy("doc_id")
        .agg(F.countDistinct("term").alias("nt"))
        .filter(F.col("nt") == n)
        .select("doc_id")
        .orderBy("doc_id")
    )


def or_union(docs: DataFrame, terms: list[str], tokenizer_mode: str = "simple") -> DataFrame:
    td = _term_docs(docs, terms, tokenizer_mode)
    return td.select("doc_id").distinct().orderBy("doc_id")


def not_exclude(docs: DataFrame, term: str, minus: str, tokenizer_mode: str = "simple") -> DataFrame:
    """`term -minus` — left anti-join of the positive list against the
    excluded term's list (SURVEY §2.2 F1)."""
    td = _term_docs(docs, [term, minus], tokenizer_mode)
    pos = td.filter(F.col("term") == term).select("doc_id")
    neg = td.filter(F.col("term") == minus).select("doc_id")
    return pos.join(neg, "doc_id", "left_anti").distinct().orderBy("doc_id")


def numeric_range(
    docs: DataFrame, term: str, col: str, lo: int, hi: int, tokenizer_mode: str = "simple"
) -> DataFrame:
    """`term gbminint:col:lo gbmaxint:col:hi` (SURVEY §2.2 F4): term
    match restricted to a numeric metadata range."""
    td = _term_docs(docs, [term], tokenizer_mode)
    keep = docs.filter(F.col(col).between(lo, hi)).select("doc_id")
    return td.select("doc_id").join(keep, "doc_id", "left_semi").distinct().orderBy("doc_id")
