"""sources/ — table IO between the engine and its storage formats.

table_io   read the source corpus (Iceberg when the runtime has the
           jar, parquet otherwise) and canonicalize it to the engine's
           (doc_id, text, …) shape with stable content-addressed ids.

The segment store's own IO lives in index/segments.py (it is part of
the index format, not a pluggable source).
"""

from open_source_search_engine_spark.sources.table_io import (
    canonicalize_corpus,
    read_corpus,
)

__all__ = ["read_corpus", "canonicalize_corpus"]
