"""open_source_search_engine_spark — a from-scratch PySpark-native
inverted-index + BM25 full-text engine.

Reimplements the indexing and scoring core of the reference
(karuradev/open-source-search-engine, a Gigablast fork — see SURVEY.md)
as idiomatic Spark: DataFrame algebra for build/stats/oracle paths,
delta-gap + varint compressed posting segments for the index store, and
a vectorized block-max WAND kernel for top-k scoring. No per-row Python
anywhere on a hot path (BASELINE.json input_hint).

Layout
------
functions/   scalar / vectorized column functions (tokenize, hash, codec)
operators/   relational + IR operators (postings, bm25, boolean, wand, dedup…)
sources/     table IO (Iceberg-or-parquet) and the segment store
plans/       end-to-end pipelines (resumable index build, query engine)
streaming/   incremental (micro-batch) index maintenance
"""

from open_source_search_engine_spark.config import EngineConfig

__all__ = ["EngineConfig"]
__version__ = "0.1.0"
