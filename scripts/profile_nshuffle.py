"""Diagnostic: encode-phase wall time vs n_shuffle (r05 straggler probe).

512 (bucket, salt) groups hash-packed into 64 partitions gives 8
groups/partition; at 8 cores that is 8 waves whose last-wave fat
partitions stall the other cores. Finer partitions smooth the tail —
this measures the real encode+parquet phase at several partition
counts, configs interleaved so a co-tenant episode cannot bias one
config. Usage:
    taskset -c 0-7 python scripts/profile_nshuffle.py 360000 8 64 128 256
"""

from __future__ import annotations

import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from fixtures.gen_corpus import gen_corpus  # noqa: E402
from open_source_search_engine_spark.config import EngineConfig  # noqa: E402
from open_source_search_engine_spark.index.builder import _salt_col  # noqa: E402
from open_source_search_engine_spark.index.segments import (  # noqa: E402
    BLOCK_SCHEMA,
    make_encode_kernel,
)
from open_source_search_engine_spark.operators.postings import staged_postings  # noqa: E402
from open_source_search_engine_spark.session import get_spark  # noqa: E402


def main() -> None:
    n_docs_in = int(sys.argv[1])
    cpus = int(sys.argv[2])
    configs = [int(x) for x in sys.argv[3:]] or [64, 128, 256]

    corpus = Path(tempfile.gettempdir()) / f"scale_corpus_{n_docs_in}.parquet"
    if not corpus.exists():
        gen_corpus(n_docs_in).to_parquet(corpus, index=False, row_group_size=2000)

    spark = get_spark(
        f"nshuf-{cpus}", master=f"local[{cpus}]", shuffle_partitions=2 * cpus
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(str(corpus)).repartition(4 * cpus).cache()
    docs.count()

    cfg = EngineConfig(n_buckets=64, n_salts=8, block_size=128)
    idx_root = "/dev/shm" if Path("/dev/shm").is_dir() else None
    work = Path(tempfile.mkdtemp(prefix=f"nshuf_{cpus}_", dir=idx_root))

    staging = work / "staging"
    staged_postings(
        docs, "content", "doc_id", mode="code", stopwords=cfg.stopwords
    ).write.mode("overwrite").parquet(str(staging))

    posts = spark.read.parquet(str(staging)).filter(F.col("tf") > 0)
    max_doc_id = posts.agg(F.max("doc_id")).first()[0]
    sel = posts.select("term_id", "doc_id", "tf", "doc_len", "pos_blob")
    bucket_expr = F.pmod(F.col("term_id"), F.lit(cfg.n_buckets)).cast("int")
    salt_expr = _salt_col(F.col("doc_id"), max_doc_id, cfg.n_salts)

    def encode_run(n_shuffle: int, i: int) -> float:
        out = work / f"seg_{n_shuffle}_{i}"
        df = (
            sel.repartition(n_shuffle, bucket_expr, salt_expr)
            .sortWithinPartitions(
                bucket_expr, F.col("term_id"), salt_expr, F.col("doc_id")
            )
            .mapInArrow(
                make_encode_kernel(
                    cfg.block_size, cfg.n_buckets, max_doc_id, cfg.n_salts
                ),
                BLOCK_SCHEMA,
            )
        )
        t0 = time.perf_counter()
        df.write.mode("overwrite").partitionBy("bucket").parquet(str(out))
        return time.perf_counter() - t0

    # warm-up once at the first config (worker arenas, codegen)
    encode_run(configs[0], 99)
    times: dict[int, list[float]] = {c: [] for c in configs}
    for rep in range(3):
        for c in configs:  # interleaved: an episode hits all configs alike
            times[c].append(encode_run(c, rep))
    for c in configs:
        r = times[c]
        print(
            f"n_shuffle={c:4d}  best {min(r):6.2f} s  "
            f"median {sorted(r)[1]:6.2f} s  raw {[round(x,2) for x in r]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
