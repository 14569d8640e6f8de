"""Continuous incremental indexing — the Spark-native analog of the
reference's crawler→index loop (SURVEY.md §2.10: Spider.cpp SpiderLoop
continuously feeds Msg4 adds into the LSM; Msg5 merges the live
memtable into every read).

The reference has NO streaming operators (no watermarks/event-time);
its model is batch-incremental ingestion. Ours maps that model onto
Structured Streaming:

    readStream over the source table directory (new parquet files =
    newly crawled/injected docs)
      → foreachBatch: merge.add_documents(replace=True)
          (each micro-batch becomes one index GENERATION — exactly an
           RdbDump of a memtable; replace=True tombstones old versions
           of re-ingested doc_ids, the negative-key update path)
      → queries see new docs immediately (wand reads all generations —
         the Msg5 merged read)
      → merge.compact() periodically (RdbBase::attemptMerge)

Exactly-once: foreachBatch + the streaming checkpoint give at-least-
once batch delivery; add_documents writes a new generation per batch
and re-delivery of a batch with the same doc_ids is idempotent under
replace=True (newest generation wins at read; compaction GCs).
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType

from open_source_search_engine_spark.index import merge


def start_incremental_indexer(
    spark: SparkSession,
    source_dir: str | Path,
    index_dir: str | Path,
    schema: StructType,
    checkpoint_dir: str | Path,
    replace: bool = True,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
    max_generations: int | None = None,
) -> StreamingQuery:
    """Stream new parquet files under ``source_dir`` into the index.

    ``available_now=True`` drains everything currently available and
    stops (the batch-incremental mode); ``False`` keeps running with
    micro-batches (the SpiderLoop mode).

    ``max_generations`` — forwards the automatic tiered merge policy
    (merge.maybe_compact, RdbBase::attemptMerge): without it a
    long-running stream accumulates one generation per micro-batch and
    every list read pays one decode per generation."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(str(source_dir))

    def process_batch(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        merge.add_documents(
            spark,
            batch_df,
            index_dir,
            replace=replace,
            input_snapshot=f"stream_batch_{batch_id}",
            max_generations=max_generations,
        )

    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", str(checkpoint_dir))
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
