"""Result-set shaping: per-site clustering cap, pagination, sort-by.

Reference: TopTree.cpp bounded top-k tree with ≤2-per-site cap
(SURVEY.md §2.5 W1), SearchInput first-result offset (W2),
gbsortby: field ordering (W4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from open_source_search_engine_spark.config import EngineConfig
from open_source_search_engine_spark.operators.bm25 import bm25_scores
from open_source_search_engine_spark.operators.boolean import and_intersect


def topk_sitecap(
    docs: DataFrame,
    terms: list[str],
    k: int = 10,
    cap: int = 2,
    site_col: str = "source",
    cfg: EngineConfig = EngineConfig(),
) -> DataFrame:
    """Top-k with at most `cap` results per site (TopTree site
    clustering). Window rank within site, then global top-k — the same
    partial/final shape Msg3a's merge has. The site-cap window runs
    directly on the distributed scored set (one shuffle keyed by site);
    only the ≤cap-per-site survivors reach the final global top-k, so
    nothing funnels the full match set to one point."""
    scored = bm25_scores(docs, terms, mode="and", cfg=cfg)
    joined = scored.join(docs.select("doc_id", F.col(site_col).alias("source")), "doc_id")
    w = Window.partitionBy("source").orderBy(F.desc("_score"), F.asc("doc_id"))
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= cap)
        .orderBy(F.desc("_score"), F.asc("doc_id"))
        .limit(k)
        .select("doc_id", F.round(F.col("_score"), 5).alias("score"), "source")
    )


def paginate(
    docs: DataFrame,
    terms: list[str],
    offset: int,
    limit: int,
    cfg: EngineConfig = EngineConfig(),
) -> DataFrame:
    """Page (offset, limit) of the ranked result list (W2). Spark 4
    supports DataFrame.offset natively; orderBy + offset + limit plans
    as TakeOrdered of (offset+limit) rows per partition — bounded by
    the page depth, never by the match-set size."""
    scored = bm25_scores(docs, terms, mode="and", cfg=cfg)
    return (
        scored.orderBy(F.desc("_score"), F.asc("doc_id"))
        .offset(offset)
        .limit(limit)
        .select("doc_id", F.round(F.col("_score"), 5).alias("score"))
    )


def sort_by_field(
    docs: DataFrame,
    terms: list[str],
    sort_col: str = "n_chars",
    k: int = 10,
) -> DataFrame:
    """gbsortby: — matched docs ordered by a numeric metadata field
    (W4); no scoring at all, mirrors the reference's score-bypass."""
    matched = and_intersect(docs, terms)
    return (
        docs.join(matched, "doc_id", "left_semi")
        .select("doc_id", F.col(sort_col).alias("sort_key"))
        .orderBy(F.desc("sort_key"), F.asc("doc_id"))
        .limit(k)
    )
