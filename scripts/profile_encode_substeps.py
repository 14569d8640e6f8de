"""Diagnostic: encode-phase sub-step scaling (r05 §serial-overhead).

Splits the encode pipeline into cumulative cuts, each terminated by a
noop write so nothing downstream of the cut runs:
  A. shuffle (salted repartition) only
  B. A + Tungsten sortWithinPartitions
  C. B + mapInArrow encode kernel
  D. C + parquet write (the real phase)
Also samples pinned-core utilization from /proc/stat during each cut.

Usage:
    taskset -c 0-7 python scripts/profile_encode_substeps.py 360000 8
"""

from __future__ import annotations

import sys
import tempfile
import threading
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


class CpuSampler:
    """Mean utilization of the first `cpus` cores while running."""

    def __init__(self, cpus: int):
        self.cpus, self.samples, self._stop = cpus, [], False

    def _read(self):
        vals = {}
        for line in Path("/proc/stat").read_text().splitlines():
            if line.startswith("cpu") and line[3].isdigit():
                parts = line.split()
                n = int(parts[0][3:])
                if n < self.cpus:
                    t = list(map(int, parts[1:]))
                    idle = t[3] + t[4]
                    vals[n] = (sum(t), idle)
        return vals

    def run(self):
        prev = self._read()
        while not self._stop:
            time.sleep(0.5)
            cur = self._read()
            tot = sum(cur[n][0] - prev[n][0] for n in cur)
            idle = sum(cur[n][1] - prev[n][1] for n in cur)
            if tot:
                self.samples.append(1 - idle / tot)
            prev = cur

    def __enter__(self):
        self.t = threading.Thread(target=self.run, daemon=True)
        self.t.start()
        return self

    def __exit__(self, *a):
        self._stop = True
        self.t.join()

    @property
    def mean(self):
        return sum(self.samples) / len(self.samples) if self.samples else 0.0


def main() -> None:
    n_docs_in = int(sys.argv[1]) if len(sys.argv) > 1 else 360_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    corpus = Path(tempfile.gettempdir()) / f"scale_corpus_{n_docs_in}.parquet"
    if not corpus.exists():
        gen_corpus(n_docs_in).to_parquet(corpus, index=False, row_group_size=2000)

    spark = get_spark(
        f"encprof-{cpus}", master=f"local[{cpus}]", shuffle_partitions=2 * cpus
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(str(corpus)).repartition(4 * cpus).cache()
    docs.count()

    cfg = EngineConfig(n_buckets=64, n_salts=8, block_size=128)
    idx_root = "/dev/shm" if Path("/dev/shm").is_dir() else None
    work = Path(tempfile.mkdtemp(prefix=f"encprof_{cpus}_", dir=idx_root))

    staging = work / "staging"
    t0 = time.perf_counter()
    with CpuSampler(cpus) as cs:
        staged_postings(
            docs, "content", "doc_id", mode="code", stopwords=cfg.stopwords
        ).write.mode("overwrite").parquet(str(staging))
    print(f"tokenize_stage_write  {time.perf_counter()-t0:7.2f} s  cpu {cs.mean:.2f}")

    sp = spark.read.parquet(str(staging))
    posts = sp.filter(F.col("tf") > 0)
    max_doc_id = posts.agg(F.max("doc_id")).first()[0]

    cols = ["term_id", "doc_id", "tf", "doc_len", "pos_blob"]
    sel = posts.select(*cols)
    bucket_expr = F.pmod(F.col("term_id"), F.lit(cfg.n_buckets)).cast("int")
    salt_expr = _salt_col(F.col("doc_id"), max_doc_id, cfg.n_salts)
    n_shuffle = 64

    shuffled = sel.repartition(n_shuffle, bucket_expr, salt_expr)
    sorted_ = shuffled.sortWithinPartitions(
        bucket_expr, F.col("term_id"), salt_expr, F.col("doc_id")
    )
    encoded = sorted_.mapInArrow(
        make_encode_kernel(cfg.block_size, cfg.n_buckets, max_doc_id, cfg.n_salts),
        BLOCK_SCHEMA,
    )

    def cut(name, df, writer="noop"):
        # two reps, best-of — same episode resistance as the protocol
        best, util = 1e9, 0.0
        for i in range(2):
            t0 = time.perf_counter()
            with CpuSampler(cpus) as cs:
                if writer == "noop":
                    df.write.format("noop").mode("overwrite").save()
                else:
                    df.write.mode("overwrite").parquet(
                        str(work / f"out_{name}_{i}")
                    )
            dt = time.perf_counter() - t0
            if dt < best:
                best, util = dt, cs.mean
        print(f"{name:22s} {best:7.2f} s  cpu {util:.2f}")

    cut("A_shuffle_noop", shuffled)
    cut("B_sort_noop", sorted_)
    cut("C_encode_noop", encoded)
    cut("D_full_parquet", encoded, writer="parquet")

    spark.stop()


if __name__ == "__main__":
    main()
