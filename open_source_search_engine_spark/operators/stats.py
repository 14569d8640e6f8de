"""Corpus statistics — reference: Posdb::getTermFreq (APPROXIMATE df
from RdbMap page counts) and per-doc word counts in XmlDoc/Words
(SURVEY.md §2.4 A1-A3, A7). Ours are exact DataFrame aggregations,
computed in the same pass as the build.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def doc_meta(
    docs: DataFrame,
    tokens: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    extra_cols: list[str] | None = None,
) -> DataFrame:
    """(doc_id, doc_len, content_sha256 [, extras]) — doc_len is the
    token count; content_sha256 is the per-row invariant vs the source
    table (BASELINE.json input_hint)."""
    lens = tokens.groupBy("doc_id").agg(F.count(F.lit(1)).cast("int").alias("doc_len"))
    cols = [
        F.col(id_col).alias("doc_id"),
        F.sha2(F.col(text_col).cast("binary"), 256).alias("content_sha256"),
    ] + [F.col(c) for c in (extra_cols or [])]
    return docs.select(*cols).join(lens, "doc_id", "left").fillna({"doc_len": 0})


def term_stats(postings_df: DataFrame) -> DataFrame:
    """(term, term_id, df) — exact document frequency."""
    return postings_df.groupBy("term", "term_id").agg(
        F.count(F.lit(1)).alias("df")
    )


def corpus_stats(doc_meta_df: DataFrame) -> DataFrame:
    """Single-row (n_docs, avgdl). Kept as a DataFrame (cross-joined by
    consumers) so nothing collects to the driver in the build path."""
    return doc_meta_df.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg("doc_len").alias("avgdl"),
    )
