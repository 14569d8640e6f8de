"""M5 — incremental index maintenance: add / delete / compact.

LSM semantics lifted from the reference (SURVEY.md §1.1, §2.10):

  * ``add_documents``    → a new *generation* of segments (the RdbDump
    of a fresh memtable): only the new docs are tokenized/encoded; the
    existing generations are untouched. New postings are scored with
    the UPDATED corpus stats; older generations keep their build-time
    scores until compaction (the reference precedent: Posdb term
    frequencies are approximate and drift between merges,
    Posdb::getTermFreq — exactness is restored by ``compact``).
  * ``delete_documents`` → tombstone rows ``(doc_id,
    before_generation)`` — negative keys (RdbList.cpp delete-key
    annihilation). Queries apply them at read time (Msg5-style merged
    read); ``replace=True`` adds makes updates: old version
    annihilated, new version indexed.
  * ``compact``          → the tiered merge (RdbBase::attemptMerge /
    RdbMerge.cpp): decode all generations back to posting tuples
    (vectorized mapInPandas), drop tombstoned versions, rebuild a
    fresh generation-0 index with exact global stats. Sorted order is
    re-established per (bucket, salt) partition by the encoder — a
    distributed sorted merge expressed as shuffle + sortWithinPartitions
    rather than a hand-written k-way file merge.
"""

from __future__ import annotations

import json
import shutil
from collections.abc import Iterator
from pathlib import Path

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from open_source_search_engine_spark.config import EngineConfig
from open_source_search_engine_spark.functions.codec import (
    delta_decode,
    positions_byte_offsets,
    varint_decode,
)
from open_source_search_engine_spark.index import builder as B
from open_source_search_engine_spark.operators.postings import fast_postings
from open_source_search_engine_spark.operators.stats import term_stats

TOMBSTONE_SCHEMA = "doc_id long, before_generation int"


def _write_tombstones(index_dir: Path, doc_ids, gen: int) -> None:
    """Driver-side pyarrow write — tombstones are metadata-scale (the
    reference's negative keys are single records, Rdb::addRecord); a
    distributed write of a handful of ids costs ~5 s of job overhead."""
    import uuid

    import pyarrow as pa
    import pyarrow.parquet as pq

    tdir = index_dir / "tombstones"
    tdir.mkdir(parents=True, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([int(d) for d in doc_ids], pa.int64()),
                "before_generation": pa.array(
                    [gen] * len(doc_ids), pa.int32()
                ),
            }
        ),
        tdir / f"tombstones-{uuid.uuid4().hex}.parquet",
    )


def _cfg_from_meta(meta: dict) -> EngineConfig:
    c = dict(meta["config"])
    c["stopwords"] = frozenset(c.get("stopwords", ()))
    return EngineConfig(**c)


def current_generations(index_dir: str | Path) -> list[int]:
    seg = Path(index_dir) / "segments"
    return sorted(
        int(p.name.split("=")[1]) for p in seg.glob("generation=*") if p.is_dir()
    )


# tombstone tables up to this on-disk size ship as a map-side hash
# join; above it the merge joins them with a plain shuffle — a
# retention sweep / mass takedown written through the DataFrame
# overload of delete_documents is corpus-scale, and broadcasting it
# would funnel the whole delete set through the driver.
TOMBSTONE_BROADCAST_MAX_BYTES = 64 * 1024 * 1024


def _tombstones_per_doc(
    spark: SparkSession, index_dir: Path
) -> tuple[DataFrame, bool] | None:
    """One row per doc_id (max before_generation wins — the read-path
    aggregation) plus a fits-in-a-broadcast flag decided from the
    on-disk parquet size, or None when no tombstones exist."""
    tdir = Path(index_dir) / "tombstones"
    if not tdir.exists():
        return None
    on_disk = sum(p.stat().st_size for p in tdir.glob("*.parquet"))
    ts = (
        spark.read.parquet(str(tdir))
        .groupBy("doc_id")
        .agg(F.max("before_generation").alias("before_generation"))
    )
    return ts, on_disk <= TOMBSTONE_BROADCAST_MAX_BYTES


def _apply_tombstones(
    rows: DataFrame,
    ts_small: tuple[DataFrame, bool] | None,
    gen_col: str = "generation",
) -> DataFrame:
    """Annihilate rows whose ``gen_col`` sits below the doc's
    tombstone bar (RdbList delete-key semantics)."""
    if ts_small is None:
        return rows
    ts, small = ts_small
    return (
        rows.join(F.broadcast(ts) if small else ts, "doc_id", "left")
        .filter(
            F.col("before_generation").isNull()
            | (F.col(gen_col) >= F.col("before_generation"))
        )
        .drop("before_generation")
    )


def _live_postings(
    spark: SparkSession, index_dir: Path, generations: list[int] | None = None
) -> DataFrame:
    """decode → tombstone-filter → newest-generation-wins: the shared
    merged read (Msg5's view of an Rdb) used by both ``compact`` (all
    generations) and ``merge_deltas`` (the delta tier only)."""
    seg = spark.read.parquet(str(index_dir / "segments"))
    if generations is not None:
        seg = seg.filter(F.col("generation").isin([int(g) for g in generations]))
    posts = _apply_tombstones(
        decode_segments_to_postings(seg), _tombstones_per_doc(spark, index_dir)
    )
    aggs = [F.max_by("tf", "generation").cast("int").alias("tf")]
    if "pos_blob" in posts.columns:
        aggs.append(F.max_by("pos_blob", "generation").alias("pos_blob"))
    return posts.groupBy("term_id", "doc_id").agg(*aggs)


def _prune_tombstones(spark: SparkSession, index_dir: Path) -> None:
    """Drop tombstone rows that no longer mask anything, and collapse
    the rest to one row per doc. After a delta merge a tombstone
    ``(doc_id, bg)`` still matters iff it masks (a) base-generation
    postings — the doc was in the generation-0 build, i.e. doc_meta
    has a gen-0 row (every surviving delta posting carries a
    generation above every existing bg, so only generation 0 can be
    masked) — or (b) the doc_meta liveness view — the doc's newest
    meta row sits below bg (a doc added and then deleted entirely
    within the delta tier). The common replace-in-delta rows are dead
    after the merge, and without this sweep continuous replace-mode
    ingest grows the table by one row per updated doc per batch —
    an unbounded cost every read and every future merge would re-join.

    Crash-safe by construction: the pruned rows are APPENDED into the
    tombstones dir first (union semantics are unchanged — the pruned
    set is a semantic subset and reads take max-per-doc), then the old
    files are unlinked; any crash point leaves a correct superset."""
    tdir = Path(index_dir) / "tombstones"
    tsd = _tombstones_per_doc(spark, index_dir)
    if tsd is None:
        return
    ts, _ = tsd
    dm = (
        spark.read.parquet(str(index_dir / "doc_meta"))
        .groupBy("doc_id")
        .agg(
            F.max("gen").alias("max_gen"),
            F.max((F.col("gen") == 0).cast("int")).alias("has_base"),
        )
    )
    live = (
        ts.join(dm, "doc_id", "left")
        .filter(
            (F.col("has_base") == 1)
            | (F.col("max_gen") < F.col("before_generation"))
        )
        .select("doc_id", F.col("before_generation").cast("int").alias("before_generation"))
    )
    old_files = sorted(tdir.glob("*.parquet"))
    live.write.mode("append").parquet(str(tdir))
    for p in old_files:
        p.unlink()
    if not any(tdir.glob("*.parquet")):
        shutil.rmtree(tdir)


def delete_documents(
    spark: SparkSession, index_dir: str | Path, doc_ids: list[int] | DataFrame
) -> None:
    """Tombstone: annihilates every posting of doc_id from generations
    strictly below the next generation number.

    ``doc_ids`` — a small Python list is written driver-side (a delete
    of a handful of ids shouldn't pay a Spark job); a DataFrame with a
    ``doc_id`` column is appended DISTRIBUTED, so mass deletes (a
    retention sweep, a licence takedown over millions of docs) never
    route ids through the driver — the same fan-out the replace branch
    of add_documents uses."""
    index_dir = Path(index_dir)
    gen = max(current_generations(index_dir), default=0) + 1
    if isinstance(doc_ids, DataFrame):
        doc_ids.select(
            F.col("doc_id").cast("long"),
            F.lit(gen).cast("int").alias("before_generation"),
        ).write.mode("append").parquet(str(index_dir / "tombstones"))
    else:
        _write_tombstones(index_dir, doc_ids, gen)
    spark.catalog.refreshByPath(str(index_dir / "tombstones"))


def add_documents(
    spark: SparkSession,
    docs: DataFrame,
    index_dir: str | Path,
    replace: bool = False,
    input_snapshot: str = "incremental",
    anchor_edges: DataFrame | None = None,
    max_generations: int | None = None,
    compact_mode: str = "deltas",
) -> dict:
    """Index new docs as the next generation. ``replace=True`` first
    tombstones incoming doc_ids (update semantics).

    ``anchor_edges`` — inbound-anchor edges FOR THE DELTA DOCS (same
    shape as builder.build_index's): an anchored store should pass the
    new docs' inlink rows so their termlists carry anchor text like
    generation 0's (the reference re-hashes link info whenever a doc
    is reindexed, XmlDoc::hashIncomingLinkText).

    ``max_generations`` — automatic merge policy (RdbBase::attemptMerge,
    SURVEY.md §1.1/§4): after the add, if live generations exceed the
    budget, ``maybe_compact`` merges per ``compact_mode``. Without it
    generations accumulate unboundedly and every list read pays one
    decode per generation."""
    if (
        max_generations is not None
        and compact_mode == "deltas"
        and max_generations < 2
    ):
        # fail before the (expensive) add, not inside maybe_compact after it
        raise ValueError("max_generations must be >= 2 with compact_mode='deltas'")
    index_dir = Path(index_dir)
    meta = B.load_meta(index_dir, recover=True)
    cfg = _cfg_from_meta(meta)
    gen = max(current_generations(index_dir), default=0) + 1
    text_col, tok_mode = meta["text_col"], meta["tokenizer_mode"]
    tok_docs, tok_text_col = docs, text_col
    if anchor_edges is not None:
        agg = anchor_edges.groupBy(F.col("dst_doc_id").alias("doc_id")).agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("src_doc_id", "anchor_text"))
                    ),
                    lambda x: x["anchor_text"],
                ),
                " ",
            ).alias("__anchors")
        )
        tok_docs = docs.join(agg, "doc_id", "left").withColumn(
            "__text_anchored", F.concat_ws(" ", F.col(text_col), F.col("__anchors"))
        )
        tok_text_col = "__text_anchored"

    if replace:
        # distributed tombstone append — never collect incoming ids to
        # the driver (a large re-ingest would OOM it; the reference's
        # negative keys flow through the same Msg4 fan-out as adds).
        # Spark's _SUCCESS/_committed files start with '_' and are
        # ignored by both spark.read and pyarrow.dataset discovery, so
        # they coexist with the driver-written tombstone files.
        # NOTE df drift (documented): replaced docs' term_dict df is
        # not decremented here, so scores drift upward until compact();
        # under a long replace=True loop run compact() periodically.
        docs.select(
            F.col("doc_id"), F.lit(gen).cast("int").alias("before_generation")
        ).write.mode("append").parquet(str(index_dir / "tombstones"))

    posts = fast_postings(
        tok_docs, tok_text_col, "doc_id", mode=tok_mode, stopwords=cfg.stopwords
    )
    # field-prefixed termlists (F3) must cover new generations too, or
    # field-restricted queries silently miss every doc added after the
    # base build (same composite-term hook as builder.build_index)
    if meta.get("index_fields"):
        from open_source_search_engine_spark.functions.hashing import term_id_col

        fparts = [
            docs.select(
                F.concat(F.lit(f + ":"), F.col(f).cast("string")).alias("term"),
                F.col("doc_id"),
                F.lit(1).cast("int").alias("tf"),
                F.lit(0).cast("int").alias("doc_len"),
            ).filter(F.col("term").isNotNull())
            for f in meta["index_fields"]
        ]
        fposts = fparts[0]
        for p in fparts[1:]:
            fposts = fposts.unionByName(p)
        fposts = fposts.withColumn("term_id", term_id_col(F.col("term")))
        posts = posts.unionByName(fposts, allowMissingColumns=True)
    posts = posts.persist()
    lens = posts.groupBy("doc_id").agg(F.max("doc_len").alias("doc_len"))
    # carry the base doc_meta's extra columns (lang, site, nchars, …):
    # an append with a NARROWER schema makes spark.read's schema pick
    # nondeterministic (no mergeSchema) — facets/sorts would lose the
    # column outright after the first add_documents
    dm_fields = [
        f
        for f in spark.read.parquet(str(index_dir / "doc_meta")).schema.fields
        if f.name not in ("doc_id", "content_sha256", "doc_len", "gen")
    ]
    extra_exprs = [
        (
            F.col(f.name) if f.name in docs.columns else F.lit(None).cast(f.dataType)
        ).alias(f.name)
        for f in dm_fields
    ]
    new_meta_df = (
        docs.select(
            F.col("doc_id"),
            F.sha2(F.col(text_col).cast("binary"), 256).alias("content_sha256"),
            *extra_exprs,
        )
        .join(lens, "doc_id", "left")
        .fillna({"doc_len": 0})
    )
    new_meta_df.withColumn("gen", F.lit(gen)).write.mode("append").parquet(
        str(index_dir / "doc_meta")
    )

    # refresh global stats + term_dict (df adds up; N/avgdl recomputed
    # over the unioned doc_meta, newest row per doc — tiny agg row)
    all_meta = (
        spark.read.parquet(str(index_dir / "doc_meta"))
        .groupBy("doc_id")
        .agg(F.max_by("doc_len", "gen").alias("doc_len"))
    )
    row = all_meta.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg("doc_len").alias("avgdl"),
        F.max("doc_id").alias("max_doc_id"),
    ).collect()[0]
    old_dict = spark.read.parquet(str(index_dir / "term_dict"))
    merged_dict = (
        old_dict.unionByName(term_stats(posts))
        .groupBy("term", "term_id")
        .agg(F.sum("df").alias("df"))
    )
    # crash-safe swap: old dict is renamed aside (cheap) before the new
    # one takes its place, so no instant exists with NO term_dict on
    # disk; builder.load_meta recovers from term_dict_next if a crash
    # lands between the renames.
    tmp_dict = index_dir / "term_dict_next"
    old_dict_dir = index_dir / "term_dict_old"
    merged_dict.write.mode("overwrite").parquet(str(tmp_dict))
    if old_dict_dir.exists():
        shutil.rmtree(old_dict_dir)
    (index_dir / "term_dict").rename(old_dict_dir)
    tmp_dict.rename(index_dir / "term_dict")
    shutil.rmtree(old_dict_dir)
    # the dict just swapped: the re-score read below (and any warm
    # handle's persisted copy) must not be served the pre-swap cache
    B.refresh_read_caches(spark, index_dir)

    meta.update(
        n_docs=float(row["n_docs"]),
        avgdl=float(row["avgdl"]),
        max_doc_id=max(int(row["max_doc_id"]), meta["max_doc_id"]),
        generations=sorted(set(meta["generations"]) | {gen}),
    )
    (index_dir / "meta.json").write_text(json.dumps(meta, indent=1, sort_keys=True))

    try:
        tdict = spark.read.parquet(str(index_dir / "term_dict"))
        scored = B.scored_postings_df(
            posts, None, tdict, meta["n_docs"], meta["avgdl"], cfg
        )
        B._encode_and_write(
            scored, index_dir, gen, None, cfg, input_snapshot, meta["max_doc_id"]
        )
    finally:
        posts.unpersist()
    B.refresh_read_caches(spark, index_dir)
    if max_generations is not None:
        merged = maybe_compact(
            spark, index_dir, max_generations=max_generations, mode=compact_mode
        )
        if merged is not None:
            return merged
    return meta


def decode_segments_to_postings(seg: DataFrame) -> DataFrame:
    """Segments → (term_id, doc_id, tf, generation[, pos_blob])
    posting tuples. Arrow-batched mapInPandas; numpy decode, no
    per-row Python. Per-posting position streams are self-contained
    (codec.positions_encode), so compaction re-slices block pos_blobs
    at posting boundaries (continuation-bit scan) and carries the raw
    bytes through to the re-encoder — positions are never re-encoded."""
    has_pos = "pos_blob" in seg.columns
    schema = "term_id long, doc_id long, tf long, generation long"
    if has_pos:
        schema += ", pos_blob binary"

    def it(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs = []
            pos_col = pdf["pos_blob"] if has_pos else [None] * len(pdf)
            for term_id, gen, blob_d, blob_t, blob_p in zip(
                pdf["term_id"], pdf["generation"], pdf["docs_blob"],
                pdf["tfs_blob"], pos_col,
            ):
                d = delta_decode(bytes(blob_d)).astype("int64")
                t = varint_decode(bytes(blob_t)).astype("int64")
                out = pd.DataFrame(
                    {
                        "term_id": term_id,
                        "doc_id": d,
                        "tf": t,
                        "generation": gen,
                    }
                )
                if has_pos:
                    pb = bytes(blob_p) if blob_p is not None else b""
                    offs = positions_byte_offsets(pb, t)
                    out["pos_blob"] = [
                        pb[offs[i] : offs[i + 1]] for i in range(d.size)
                    ]
                outs.append(out)
            if outs:
                yield pd.concat(outs)
            else:
                empty = {"term_id": [], "doc_id": [], "tf": [], "generation": []}
                if has_pos:
                    empty["pos_blob"] = []
                yield pd.DataFrame(empty)

    return seg.mapInPandas(it, schema)


def compact(spark: SparkSession, index_dir: str | Path) -> dict:
    """Full merge: all generations − tombstones → fresh generation-0
    store with exact stats. Equivalent to a from-scratch build over the
    live document set (SURVEY.md §5.5 merge test)."""
    index_dir = Path(index_dir)
    meta = B.load_meta(index_dir, recover=True)
    cfg = _cfg_from_meta(meta)

    tdir = index_dir / "tombstones"
    posts = _live_postings(spark, index_dir)

    # live doc_meta: liveness comes from doc_meta MINUS tombstones,
    # NOT from surviving posting doc_ids — a live doc with zero
    # postings (empty/whitespace-only content) must keep its
    # sha256/meta row and count toward n_docs/avgdl, or compact would
    # silently diverge from a from-scratch build over the live set.
    dm_src = spark.read.parquet(str(index_dir / "doc_meta"))
    extra_cols = [c for c in dm_src.columns if c not in ("doc_id", "gen")]
    dm = dm_src.groupBy("doc_id").agg(
        *[F.max_by(c, "gen").alias(c) for c in extra_cols],
        F.max("gen").alias("gen"),
    )
    dm = _apply_tombstones(dm, _tombstones_per_doc(spark, index_dir), gen_col="gen")
    dm_live = dm.select("doc_id", *extra_cols)

    row = dm_live.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg("doc_len").alias("avgdl"),
        F.max("doc_id").alias("max_doc_id"),
    ).collect()[0]
    n_docs, avgdl, max_id = float(row["n_docs"]), float(row["avgdl"]), int(row["max_doc_id"])

    new_dict = (
        posts.groupBy("term_id")
        .agg(F.count(F.lit(1)).alias("df"))
        .join(
            spark.read.parquet(str(index_dir / "term_dict")).select("term", "term_id").distinct(),
            "term_id",
        )
    )

    scored = B.scored_postings_df(posts, dm_live, new_dict, n_docs, avgdl, cfg)

    # stage the new store, then swap (atomic-ish; on a real deployment
    # this is an Iceberg snapshot commit)
    stage = index_dir / "_compact_stage"
    if stage.exists():
        shutil.rmtree(stage)
    stage.mkdir(parents=True)
    B._encode_and_write(scored, stage, 0, None, cfg, "compact", max_id)
    dm_live.withColumn("gen", F.lit(0)).write.parquet(str(stage / "doc_meta"))
    new_dict.write.parquet(str(stage / "term_dict"))

    for name in ("segments", "manifest", "doc_meta", "term_dict"):
        old = index_dir / name
        if old.exists():
            shutil.rmtree(old)
        if (stage / name).exists():
            (stage / name).rename(old)
    shutil.rmtree(stage, ignore_errors=True)
    if tdir.exists():
        shutil.rmtree(tdir)

    meta.update(n_docs=n_docs, avgdl=avgdl, max_doc_id=max_id, generations=[0])
    (index_dir / "meta.json").write_text(json.dumps(meta, indent=1, sort_keys=True))
    B.refresh_read_caches(spark, index_dir)
    return meta


def merge_deltas(spark: SparkSession, index_dir: str | Path) -> dict | None:
    """Tiered merge (RdbBase::attemptMerge picking the SMALL tier —
    the reference merges the newest N files among themselves far more
    often than it touches the big base file): collapse every DELTA
    generation (>= 1) into ONE new generation, leaving generation 0 —
    the bulk of the store — untouched. At 100 TB this is the merge you
    can afford to run continuously: cost is proportional to the delta
    tier, not the corpus.

    Semantics:
      * existing tombstones are APPLIED to the merged postings (a
        delta posting an earlier delete/replace annihilated never
        reaches the new generation); rows still masking generation 0
        or the doc_meta liveness view are RETAINED (one row per doc),
        the rest PRUNED (``_prune_tombstones``) — so replace-heavy
        continuous ingest doesn't accumulate an unbounded tombstone
        table across merges.
      * newest-generation-wins is resolved among the merged deltas;
        the rewritten postings get the next generation number, so they
        still win over generation 0 at read time.
      * doc_meta is untouched: its ``gen`` column is a per-doc version
        ordinal ordered consistently with the (monotonic) new
        generation number, so liveness/max_by semantics are unchanged.
      * global stats / term_dict are NOT recomputed — same drift model
        as add_documents (Posdb::getTermFreq approximation); exactness
        is ``compact``'s job. Scored reads drift; membership reads
        (term lookup, boolean algebra, phrases) are exact.

    Swap is atomic-ish exactly like ``compact``'s (stage → rename new
    generation in → drop merged generation dirs); a crash inside the
    window is repaired by rerunning the merge or a full compact.

    Returns the new meta when a merge ran, None when there was nothing
    to merge (fewer than two delta generations — the same contract as
    ``maybe_compact``, so callers can tell a real merge from a no-op)."""
    index_dir = Path(index_dir)
    meta = B.load_meta(index_dir, recover=True)
    cfg = _cfg_from_meta(meta)
    gens = current_generations(index_dir)
    deltas = [g for g in gens if g >= 1]
    if len(deltas) < 2:
        return None
    new_gen = max(gens) + 1

    posts = _live_postings(spark, index_dir, generations=deltas)

    # re-score with the CURRENT stats (what add_documents would have
    # used) — tf/positions carry through unchanged
    dm = (
        spark.read.parquet(str(index_dir / "doc_meta"))
        .groupBy("doc_id")
        .agg(F.max_by("doc_len", "gen").alias("doc_len"))
    )
    tdict = spark.read.parquet(str(index_dir / "term_dict"))
    scored = B.scored_postings_df(
        posts, dm, tdict, meta["n_docs"], meta["avgdl"], cfg
    )

    stage = index_dir / "_merge_stage"
    if stage.exists():
        shutil.rmtree(stage)
    stage.mkdir(parents=True)
    B._encode_and_write(
        scored, stage, new_gen, None, cfg, "delta_merge", meta["max_doc_id"]
    )
    for name in ("segments", "manifest"):
        src = stage / name / f"generation={new_gen}"
        if src.exists():
            src.rename(index_dir / name / f"generation={new_gen}")
    shutil.rmtree(stage, ignore_errors=True)
    for g in deltas:
        for name in ("segments", "manifest"):
            old = index_dir / name / f"generation={g}"
            if old.exists():
                shutil.rmtree(old)

    meta.update(
        generations=sorted((set(gens) - set(deltas)) | {new_gen}),
    )
    (index_dir / "meta.json").write_text(json.dumps(meta, indent=1, sort_keys=True))
    _prune_tombstones(spark, index_dir)
    B.refresh_read_caches(spark, index_dir)
    return meta


def maybe_compact(
    spark: SparkSession,
    index_dir: str | Path,
    max_generations: int = 4,
    mode: str = "deltas",
) -> dict | None:
    """Automatic merge policy (RdbBase::attemptMerge / the
    ``<mergeFiles>`` trigger in the reference's Rdb config): merge
    when live generations exceed ``max_generations``, else no-op.

    ``mode="deltas"`` runs the tiered ``merge_deltas`` (cost ∝ delta
    tier — the continuous-ingest setting); ``mode="full"`` runs
    ``compact`` (cost ∝ corpus, restores exact stats — the periodic
    setting). Returns the new meta when a merge ran, None otherwise.

    ``max_generations`` must be ≥ 2 in deltas mode: a delta merge can
    never go below base + one delta, so a budget of 1 would trigger on
    every add yet never be met — raise instead of looping silently."""
    if mode not in ("deltas", "full"):
        raise ValueError(f"mode must be deltas|full, got {mode!r}")
    if mode == "deltas" and max_generations < 2:
        raise ValueError(
            "max_generations must be >= 2 in deltas mode (the tiered merge "
            "keeps generation 0 plus one merged delta); use mode='full' to "
            "compact down to a single generation"
        )
    if len(current_generations(index_dir)) <= max_generations:
        return None
    if mode == "full":
        return compact(spark, index_dir)
    return merge_deltas(spark, index_dir)
