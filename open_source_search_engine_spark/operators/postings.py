"""Posting construction — reference: XmlDoc.cpp hashAll/getMetaList
building posdb keys (one key per word occurrence, Posdb.cpp makeKey;
SURVEY.md §3.2).

Pure DataFrame algebra: tokenize → posexplode → groupBy(doc, term).
tf is the occurrence count (the reference encodes it as the run-length
of half-keys per (term,doc)); positions are kept for phrase/proximity
ops (§2.8 X4, §2.5 W3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from open_source_search_engine_spark.functions.hashing import term_id_col
from open_source_search_engine_spark.functions.tokenizer import tokens_col


def doc_tokens(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    mode: str = "simple",
) -> DataFrame:
    """(doc_id, pos, term) — one row per token occurrence."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokens_col(F.col(text_col), mode=mode)).alias("pos", "term"),
    )


def postings(tokens: DataFrame, with_positions: bool = True) -> DataFrame:
    """(term, term_id, doc_id, tf[, positions sorted asc])."""
    aggs = [F.count(F.lit(1)).cast("int").alias("tf")]
    if with_positions:
        aggs.append(F.sort_array(F.collect_list("pos")).alias("positions"))
    out = tokens.groupBy("term", "doc_id").agg(*aggs)
    return out.withColumn("term_id", term_id_col(F.col("term")))


def build_postings(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    mode: str = "simple",
    with_positions: bool = True,
) -> DataFrame:
    return postings(doc_tokens(docs, text_col, id_col, mode), with_positions)
