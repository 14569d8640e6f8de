"""Diagnostic: per-phase wall times of the index build (r05 §serial-overhead).

Replicates build_index's phase sequence with timers around each Spark
action, at one parallelism level, so the Amdahl fixed term s ≈ 11 s
(BENCH.md §r05 final) can be attributed to concrete phases. Uses the
REAL internals (staged_postings, term_stats, the encode pipeline) —
any drift from builder.build_index is a diagnostic-only concern.

Usage (pinned, like the scaling protocol):
    taskset -c 0-7 python scripts/profile_build_phases.py 360000 8
"""

from __future__ import annotations

import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.observation import Observation  # noqa: E402

from fixtures.gen_corpus import gen_corpus  # noqa: E402
from open_source_search_engine_spark.config import EngineConfig  # noqa: E402
from open_source_search_engine_spark.index import builder  # noqa: E402
from open_source_search_engine_spark.operators.postings import staged_postings  # noqa: E402
from open_source_search_engine_spark.operators.stats import term_stats  # noqa: E402
from open_source_search_engine_spark.session import get_spark  # noqa: E402


def main() -> None:
    n_docs_in = int(sys.argv[1]) if len(sys.argv) > 1 else 360_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    corpus = Path(tempfile.gettempdir()) / f"scale_corpus_{n_docs_in}.parquet"
    if not corpus.exists():
        gen_corpus(n_docs_in).to_parquet(corpus, index=False, row_group_size=2000)

    spark = get_spark(
        f"profile-{cpus}", master=f"local[{cpus}]", shuffle_partitions=2 * cpus
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(str(corpus)).repartition(4 * cpus).cache()
    docs.count()

    cfg = EngineConfig(n_buckets=64, n_salts=8, block_size=128)
    idx_root = "/dev/shm" if Path("/dev/shm").is_dir() else None

    def one_build(tag: str) -> dict[str, float]:
        index_dir = Path(tempfile.mkdtemp(prefix=f"prof_{tag}_", dir=idx_root)) / "idx"
        index_dir.mkdir(parents=True, exist_ok=True)
        t: dict[str, float] = {}

        def mark(name: str, t0: float) -> float:
            now = time.perf_counter()
            t[name] = now - t0
            return now

        t0 = time.perf_counter()
        staging = index_dir / "_staging"
        staged_postings(
            docs, "content", "doc_id", mode="code", stopwords=cfg.stopwords
        ).write.mode("overwrite").parquet(str(staging))
        t0 = mark("tokenize_stage_write", t0)

        sp = spark.read.parquet(str(staging))
        posts = sp.filter(F.col("tf") > 0)
        obs = Observation(f"corpus_stats_{tag}")
        meta_df = sp.filter(F.col("tf") == 0).select(
            "doc_id", F.col("sha").alias("content_sha256"), "doc_len"
        )
        meta_df.withColumn("gen", F.lit(0)).observe(
            obs,
            F.count(F.lit(1)).cast("double").alias("n_docs"),
            F.avg("doc_len").alias("avgdl"),
            F.max("doc_id").alias("max_doc_id"),
        ).write.mode("overwrite").parquet(str(index_dir / "doc_meta"))
        stats_row = obs.get
        t0 = mark("doc_meta_write", t0)

        term_stats(posts).repartition(8, "term").sortWithinPartitions(
            "term"
        ).write.mode("overwrite").parquet(str(index_dir / "term_dict"))
        t0 = mark("term_dict_write", t0)

        max_doc_id = int(stats_row["max_doc_id"])
        # encode+write split from manifest read-back: patch the
        # read-back boundary by timing _encode_and_write total, then
        # separately re-running ONLY the manifest aggregation query.
        builder._encode_and_write(posts, index_dir, 0, None, cfg, "full", max_doc_id)
        t0 = mark("encode_write_plus_manifest", t0)

        from open_source_search_engine_spark.index.segments import BLOCK_SCHEMA

        seg_dir = index_dir / "segments" / "generation=0"
        written = spark.read.schema(BLOCK_SCHEMA).parquet(str(seg_dir))
        written.groupBy("bucket").agg(
            F.countDistinct("term_id").alias("n_terms"),
            F.count(F.lit(1)).alias("n_blocks"),
            F.sum("n_docs").alias("n_postings"),
        ).collect()
        t0 = mark("manifest_readback_rerun", t0)

        builder.refresh_read_caches(spark, index_dir)
        mark("refresh_caches", t0)

        t["TOTAL(sum)"] = sum(v for k, v in t.items() if k != "manifest_readback_rerun")
        return t

    for tag in ("warm", "timed1", "timed2"):
        t = one_build(tag)
        print(f"--- {tag} (local[{cpus}]) ---")
        for k, v in t.items():
            print(f"  {k:32s} {v:8.2f} s")

    spark.stop()


if __name__ == "__main__":
    main()
