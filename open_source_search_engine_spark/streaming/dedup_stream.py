"""Streaming exact dedup — a custom STATEFUL operator
(``applyInPandasWithState``) for the ingest pipeline: drop any document
whose content hash has already been admitted in ANY earlier
micro-batch.

Reference precedent: the crawler's content-hash dedup on ingest
(XmlDoc.cpp sets a content hash in the TitleRec and Msg40 dedups at
serve time — SURVEY.md §2.2 F7); a 100 TB TRAINING pipeline needs it
build-side and continuous, which the reference's batch world cannot
express — this is the Structured Streaming extension (§2.10).

Shape for scale:

* state is keyed by ``hash_prefix`` (first ``prefix_len`` hex chars of
  the content hash) — the key space is bounded (16^prefix_len groups)
  and the state store shards groups across executors; each group's
  state is the SET of full hashes seen, so memory per group is
  ~n_unique_docs/16^prefix_len hashes.
* within a micro-batch the FIRST occurrence (lowest doc_id) of a new
  hash is admitted — deterministic, so re-played batches admit the
  same survivors (at-least-once delivery stays idempotent downstream
  because admitted (doc_id, sha) pairs are stable).
* the operator emits admitted rows only; the indexer consumes the
  deduped stream (compose with incremental.start_incremental_indexer).

GroupStateTimeout: none — dedup state must live for the stream's
lifetime (a seen hash stays seen), exactly like the reference's
persistent content-hash table.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "doc_id long, sha string"
STATE_SCHEMA = "seen array<string>"


def _dedup_fn(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    seen = list(state.get[0]) if state.exists else []
    batch = pd.concat(list(pdfs), ignore_index=True)
    # deterministic survivor pick (lowest doc_id per hash), then drop
    # hashes already in state — whole-batch pandas ops, no row loop
    batch = (
        batch.sort_values("doc_id")
        .drop_duplicates("sha", keep="first")
    )
    fresh = batch[~batch["sha"].isin(seen)]
    if len(fresh):
        state.update((sorted(set(seen) | set(fresh["sha"])),))
    yield fresh[["doc_id", "sha"]]


def dedup_stream(
    docs_stream: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    prefix_len: int = 2,
) -> DataFrame:
    """(doc_id, sha) of ADMITTED (first-seen) docs — apply as a
    left-semi join onto the batch in foreachBatch, or consume directly.

    ``prefix_len`` controls state sharding: 2 hex chars = 256 state
    groups (tests); production would use 4-5 (65k-1M groups)."""
    hashed = docs_stream.select(
        F.col(id_col).alias("doc_id"),
        F.sha2(F.col(text_col).cast("binary"), 256).alias("sha"),
    ).withColumn("hash_prefix", F.substring("sha", 1, prefix_len))
    return hashed.groupBy("hash_prefix").applyInPandasWithState(
        _dedup_fn,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
