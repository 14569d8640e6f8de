"""Facets — reference: gbfacetstr/gbfacetint per-shard hash-agg merged
at the coordinator (Msg39/Msg3a FacetEntry tables, SURVEY.md §2.4 A5).

Catalyst's partial+final hash aggregate is exactly the reference's
two-phase facet merge; we just express `groupBy(field).count()` over
the match set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from open_source_search_engine_spark.operators.boolean import or_union


def facet_counts(
    docs: DataFrame,
    terms: list[str],
    facet_col: str = "lang",
    tokenizer_mode: str = "simple",
) -> DataFrame:
    matches = or_union(docs, terms, tokenizer_mode)
    return (
        docs.join(matches, "doc_id", "left_semi")
        .groupBy(F.col(facet_col).alias("facet_value"))
        .agg(F.count(F.lit(1)).alias("facet_count"))
        .orderBy("facet_value")
    )


def facet_ranges(
    docs: DataFrame,
    terms: list[str],
    facet_col: str = "n_chars",
    bucket_width: int = 100,
    tokenizer_mode: str = "simple",
) -> DataFrame:
    """Numeric range facets (gbfacetint with bucketing — SURVEY §2.4
    A5, reference FacetEntry int ranges): match set histogrammed into
    fixed-width buckets of ``facet_col``. (bucket_lo, facet_count)."""
    matches = or_union(docs, terms, tokenizer_mode)
    lo = (F.floor(F.col(facet_col) / bucket_width) * bucket_width).cast("bigint")
    return (
        docs.join(matches, "doc_id", "left_semi")
        .groupBy(lo.alias("bucket_lo"))
        .agg(F.count(F.lit(1)).alias("facet_count"))
        .orderBy("bucket_lo")
    )
