"""P1-P3 — match finding, summary window, highlighting
(SURVEY.md §2.9; reference: Matches.cpp Matches::set finds query-term
hits in the doc, Summary.cpp Summary::setSummary picks the best
word-position window around them, Highlight.cpp wraps the terms).

Spark-first: the top-k result set is tiny (≤ k rows), so the summary
join is a broadcast of the result ids back onto the docs table (the
Msg20/Msg22 docid→TitleRec lookup, SURVEY.md §2.3 J2), and window
selection + highlighting are pure JVM column algebra over token
arrays (split / array_position / slice / transform) — whole-stage
codegen, no Python, no regex (keeps Spark-Java and DuckDB-RE2
semantics identical for the oracle).

Deterministic semantics (oracle-checkable):
  * anchor   = smallest token position of any query term (first hit,
    like the reference's first-window preference)
  * snippet  = WINDOW tokens starting 3 left of the anchor
  * highlight = snippet with query-term tokens wrapped in <b>…</b>
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from open_source_search_engine_spark.operators import bm25

WINDOW = 7
LEFT_CTX = 3


def _window_cols(text: Column, terms: list[str]) -> tuple[Column, Column]:
    ts = sorted(set(terms))
    toks = F.split(F.lower(text), r"\s+")
    pos = [F.array_position(toks, F.lit(t)) for t in ts]  # 0 if absent
    nz = [F.when(p > 0, p) for p in pos]
    anchor = F.least(*nz) if len(nz) > 1 else nz[0]
    start = F.greatest(F.lit(1), anchor - F.lit(LEFT_CTX))
    window = F.when(
        anchor.isNotNull(), F.slice(toks, start, WINDOW)
    ).otherwise(F.array().cast("array<string>"))
    term_arr = F.array(*[F.lit(t) for t in ts])
    marked = F.transform(
        window,
        lambda t: F.when(
            F.array_contains(term_arr, t), F.concat(F.lit("<b>"), t, F.lit("</b>"))
        ).otherwise(t),
    )
    return F.array_join(window, " "), F.array_join(marked, " ")


def search_with_snippets(
    docs: DataFrame,
    terms: list[str],
    k: int = 10,
    mode: str = "and",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Full search lifecycle §3.1: BM25 top-k → broadcast join back to
    the doc store → snippet + highlight columns."""
    topk = bm25.bm25_topk_oracle(
        docs, terms, k=k, mode=mode, text_col=text_col, id_col=id_col
    )
    joined = docs.join(
        F.broadcast(topk), docs[id_col] == topk["doc_id"], "inner"
    ).select(topk["doc_id"], topk["score"], F.col(text_col).alias("_text"))
    snip, hl = _window_cols(F.col("_text"), terms)
    return (
        joined.withColumn("snippet", snip)
        .withColumn("highlight", hl)
        .drop("_text")
        .orderBy(F.desc("score"), F.asc("doc_id"))
    )


def search_with_snippets_indexed(
    spark,
    index_dir,
    docs: DataFrame,
    terms: list[str],
    k: int = 10,
    mode: str = "and",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Same lifecycle with the SCORING leg from the segment store
    (WAND top-k): the corpus is touched only by the ≤k-row broadcast
    join for snippet extraction — the Msg20 summary fetch against
    titledb, which in our engine IS the source table."""
    from open_source_search_engine_spark.index import wand

    topk = wand.wand_topk(spark, index_dir, terms, k=k, mode=mode)
    joined = docs.join(
        F.broadcast(topk), docs[id_col] == topk["doc_id"], "inner"
    ).select(topk["doc_id"], topk["score"], F.col(text_col).alias("_text"))
    snip, hl = _window_cols(F.col("_text"), terms)
    return (
        joined.withColumn("snippet", snip)
        .withColumn("highlight", hl)
        .drop("_text")
        .orderBy(F.desc("score"), F.asc("doc_id"))
    )


def doc_lookup(docs: DataFrame, doc_id: int, id_col: str = "doc_id") -> DataFrame:
    """Direct docid lookup — the `gbdocid:` / `/get?d=` path
    (SURVEY.md §3.3; Msg22::getTitleRec). Catalyst pushes the equality
    predicate into the parquet scan."""
    return docs.filter(F.col(id_col) == doc_id)
