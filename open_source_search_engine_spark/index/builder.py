"""M3 — segment-store index build: the Spark expression of the
reference's index pipeline (SURVEY.md §3.2):

    XmlDoc::hashAll            → tokenize + posexplode + groupBy  (postings)
    Msg4 fan-out to shards     → salted repartition by (term-bucket, doc-range)
    RdbTree sorted memtable    → sortWithinPartitions / in-kernel sort
    RdbDump sorted run + RdbMap→ applyInPandas block encoder (segments.py)
    Rdb stats                  → DataFrame aggs (doc_meta / term_dict / stats)

Layout under ``index_dir`` (plain parquet dirs; Iceberg would add its
manifests on top — no Iceberg jar in-sandbox, SURVEY.md §7 M0):

    meta.json                      engine config + corpus stats
    doc_meta/                      (doc_id, doc_len, content_sha256, …)
    term_dict/                     (term, term_id, df)
    segments/generation=G/bucket=B/   block rows (segments.BLOCK_SCHEMA)
    manifest/generation=G/         per-bucket lineage/checkpoint rows
    tombstones/                    (doc_id, before_generation)

Partitioning at scale: ``bucket = term_id % n_buckets`` makes query
term lookup partition-prunable (O(k) buckets touched per query, not
all — the sharded-by-termId layout, SURVEY.md §1.2); ``salt`` splits
each term's postings into contiguous doc_id ranges so one Zipf head
term cannot pin a single shuffle partition, while keeping every
(term, salt) run doc_id-sorted (concatenating salts in order is the
globally sorted list).

Resumability (north_rule): the manifest is the checkpoint — one row
per (generation, bucket) written only after that bucket's segment
files are on disk. A restarted build reads the manifest and encodes
only buckets with no manifest row; completed buckets are never
re-read or re-written.
"""

from __future__ import annotations

import json
import time
from dataclasses import asdict
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from open_source_search_engine_spark.config import EngineConfig
from open_source_search_engine_spark.index.segments import BLOCK_SCHEMA, encode_group
from open_source_search_engine_spark.operators.bm25 import bm25_term_score_col
from open_source_search_engine_spark.operators.postings import fast_postings
from open_source_search_engine_spark.operators.stats import term_stats

MANIFEST_SCHEMA = (
    "bucket int, n_terms long, n_blocks long, n_postings long, "
    "built_at string, input_snapshot string"
)


def _salt_col(doc_id: F.Column, max_doc_id: int, n_salts: int) -> F.Column:
    """Contiguous doc_id-range salt in [0, n_salts)."""
    width = max(1, (max_doc_id + n_salts) // n_salts)
    return F.least(
        (doc_id / F.lit(width)).cast("int"), F.lit(n_salts - 1)
    ).alias("salt")


def load_meta(index_dir: str | Path) -> dict:
    return json.loads((Path(index_dir) / "meta.json").read_text())


def _write_meta(index_dir: Path, meta: dict) -> None:
    (index_dir / "meta.json").write_text(json.dumps(meta, indent=1, sort_keys=True))


def scored_postings_df(
    posts: DataFrame,
    meta_df: DataFrame,
    tdict: DataFrame,
    n_docs: float,
    avgdl: float,
    cfg: EngineConfig,
) -> DataFrame:
    """Attach the precomputed float64 BM25 contribution to every
    posting (static-feature precompute, SURVEY.md §4). tdict supplies
    global df; broadcast — it is ~vocabulary-sized."""
    return (
        posts.join(F.broadcast(tdict.select("term_id", "df")), "term_id")
        .join(meta_df.select("doc_id", "doc_len"), "doc_id")
        .withColumn(
            "score",
            bm25_term_score_col(
                F.col("tf"), F.col("df"), F.col("doc_len"),
                F.lit(float(n_docs)), F.lit(float(avgdl)), cfg,
            ),
        )
    )


def _encode_and_write(
    scored: DataFrame,
    index_dir: Path,
    generation: int,
    buckets: list[int] | None,
    cfg: EngineConfig,
    input_snapshot: str,
) -> None:
    """Encode (a subset of buckets of) scored postings into block rows,
    write segments + manifest rows. The applyInPandas groupBy is THE
    salted shuffle: (bucket, salt) keys spread a head term over
    n_salts partitions."""
    spark = scored.sparkSession
    sel = scored.select("bucket", "salt", "term_id", "doc_id", "tf", "score")
    if buckets is not None:
        sel = sel.filter(F.col("bucket").isin(buckets))
    bs = cfg.block_size
    blocks = sel.groupBy("bucket", "salt").applyInPandas(
        lambda pdf: encode_group(pdf, bs), BLOCK_SCHEMA
    )
    # cluster the encoded blocks by bucket before the partitioned
    # write: without this every write task holds rows of MANY buckets
    # and partitionBy explodes into tasks×buckets small files whose
    # commit serializes on the driver (measured anti-scaling 8→32
    # cores). One partition per bucket → one file per bucket dir; the
    # within-file term_id sort gives parquet row-group min/max stats
    # that the query path's term_id filter prunes on (RdbMap analog).
    blocks = (
        blocks.repartition(cfg.n_buckets, "bucket")
        .sortWithinPartitions("term_id", "salt", "block_id")
        .persist()
    )
    seg_dir = index_dir / "segments" / f"generation={generation}"
    blocks.write.mode("append").partitionBy("bucket").parquet(str(seg_dir))

    # manifest AFTER segments land (the commit point): aggregated from
    # the same materialized blocks that were just written — no second
    # full read of the segment store.
    man = blocks.groupBy("bucket").agg(
        F.countDistinct("term_id").alias("n_terms"),
        F.count(F.lit(1)).alias("n_blocks"),
        F.sum("n_docs").alias("n_postings"),
    )
    man = man.select(
        "bucket", "n_terms", "n_blocks", "n_postings",
        F.lit(time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())).alias("built_at"),
        F.lit(input_snapshot).alias("input_snapshot"),
    )
    man_dir = index_dir / "manifest" / f"generation={generation}"
    man.write.mode("append").parquet(str(man_dir))
    blocks.unpersist()


def done_buckets(spark: SparkSession, index_dir: str | Path, generation: int = 0) -> set[int]:
    man_dir = Path(index_dir) / "manifest" / f"generation={generation}"
    if not man_dir.exists():
        return set()
    rows = spark.read.parquet(str(man_dir)).select("bucket").distinct().collect()
    return {r["bucket"] for r in rows}


def build_index(
    spark: SparkSession,
    docs: DataFrame,
    index_dir: str | Path,
    cfg: EngineConfig = EngineConfig(),
    text_col: str = "text",
    id_col: str = "doc_id",
    extra_meta_cols: list[str] | None = None,
    tokenizer_mode: str = "simple",
    resume: bool = False,
    input_snapshot: str = "full",
) -> dict:
    """Full (generation-0) index build. Returns the meta dict.

    ``resume=True`` skips every bucket already present in the
    generation-0 manifest (checkpoint restart, north_rule)."""
    index_dir = Path(index_dir)
    index_dir.mkdir(parents=True, exist_ok=True)

    # ONE tokenize pass, materialized and reused by every downstream
    # stage (the RdbTree memtable moment — nothing re-reads raw text).
    # fast_postings aggregates tf inside the tokenizer batch and emits
    # pre-combined rows: no token-stream shuffle at all (measured 3.5×
    # less Arrow traffic; without the persist each stage re-tokenized).
    posts = fast_postings(docs, text_col, id_col, mode=tokenizer_mode).persist()

    meta_path = index_dir / "meta.json"
    dm_dir = index_dir / "doc_meta"
    td_dir = index_dir / "term_dict"
    try:
        if resume and meta_path.exists() and dm_dir.exists() and td_dir.exists():
            meta = load_meta(index_dir)
        else:
            # doc_len = Σ tf over the materialized postings — identical
            # to the token count, avoids a second tokenizer pass
            lens = posts.groupBy("doc_id").agg(
                F.sum("tf").cast("int").alias("doc_len")
            )
            id_cols = [
                F.col(id_col).alias("doc_id"),
                F.sha2(F.col(text_col).cast("binary"), 256).alias("content_sha256"),
            ] + [F.col(c) for c in (extra_meta_cols or [])]
            meta_df = (
                docs.select(*id_cols)
                .join(lens, "doc_id", "left")
                .fillna({"doc_len": 0})
            )
            meta_df.withColumn("gen", F.lit(0)).write.mode("overwrite").parquet(
                str(dm_dir)
            )
            term_stats(posts).write.mode("overwrite").parquet(str(td_dir))
            # stats pass: ONE tiny agg row to the driver
            stats_row = (
                spark.read.parquet(str(dm_dir))
                .agg(
                    F.count(F.lit(1)).cast("double").alias("n_docs"),
                    F.avg("doc_len").alias("avgdl"),
                    F.max("doc_id").alias("max_doc_id"),
                )
                .collect()[0]
            )
            meta = {
                "config": asdict(cfg) | {"stopwords": sorted(cfg.stopwords)},
                "n_docs": float(stats_row["n_docs"]),
                "avgdl": float(stats_row["avgdl"]),
                "max_doc_id": int(stats_row["max_doc_id"]),
                "generations": [0],
                "tokenizer_mode": tokenizer_mode,
                "text_col": text_col,
            }
            _write_meta(index_dir, meta)

        todo: list[int] | None = None
        if resume:
            done = done_buckets(spark, index_dir, 0)
            todo = sorted(set(range(cfg.n_buckets)) - done)
            if not todo:
                return meta

        meta_p = spark.read.parquet(str(dm_dir))
        tdict = spark.read.parquet(str(td_dir))
        scored = scored_postings_df(
            posts, meta_p, tdict, meta["n_docs"], meta["avgdl"], cfg
        ).select(
            F.pmod(F.col("term_id"), F.lit(cfg.n_buckets)).cast("int").alias("bucket"),
            _salt_col(F.col("doc_id"), meta["max_doc_id"], cfg.n_salts),
            "term_id", "doc_id", "tf", "score",
        )
        _encode_and_write(scored, index_dir, 0, todo, cfg, input_snapshot)
    finally:
        posts.unpersist()

    # every bucket (incl. legitimately empty ones) must reach the
    # manifest so a resumed build knows the generation is complete
    have = done_buckets(spark, index_dir, 0)
    missing_empty = sorted(set(range(cfg.n_buckets)) - have)
    if missing_empty:
        spark.createDataFrame(
            [(b, 0, 0, 0, "", input_snapshot) for b in missing_empty],
            MANIFEST_SCHEMA,
        ).write.mode("append").parquet(str(index_dir / "manifest" / "generation=0"))
    return meta
