"""Diagnostic: tokenize-phase scaling — Python kernel vs parquet sink.

Times staged_postings terminated by (a) a noop sink (pure kernel +
Arrow) and (b) the real parquet staging write, best-of-3 reps, at one
parallelism level. Run at 2 and 8 to compare scaling of each cut.

Usage:
    taskset -c 0-7 python scripts/profile_tokenize.py 360000 8
"""

from __future__ import annotations

import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from fixtures.gen_corpus import gen_corpus  # noqa: E402
from open_source_search_engine_spark.config import EngineConfig  # noqa: E402
from open_source_search_engine_spark.operators.postings import staged_postings  # noqa: E402
from open_source_search_engine_spark.session import get_spark  # noqa: E402


def main() -> None:
    n_docs_in = int(sys.argv[1])
    cpus = int(sys.argv[2])

    corpus = Path(tempfile.gettempdir()) / f"scale_corpus_{n_docs_in}.parquet"
    if not corpus.exists():
        gen_corpus(n_docs_in).to_parquet(corpus, index=False, row_group_size=2000)

    spark = get_spark(
        f"tokprof-{cpus}", master=f"local[{cpus}]", shuffle_partitions=2 * cpus
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(str(corpus)).repartition(4 * cpus).cache()
    docs.count()

    cfg = EngineConfig(n_buckets=64, n_salts=8, block_size=128)
    idx_root = "/dev/shm" if Path("/dev/shm").is_dir() else None
    work = Path(tempfile.mkdtemp(prefix=f"tokprof_{cpus}_", dir=idx_root))

    staged = staged_postings(
        docs, "content", "doc_id", mode="code", stopwords=cfg.stopwords
    )

    def run(name, writer, i):
        t0 = time.perf_counter()
        if writer == "noop":
            staged.write.format("noop").mode("overwrite").save()
        else:
            staged.write.mode("overwrite").parquet(str(work / f"st_{i}"))
        return time.perf_counter() - t0

    run("warm", "noop", 99)
    res = {"noop": [], "parquet": []}
    for i in range(3):
        for w in ("noop", "parquet"):
            res[w].append(run(w, w, i))
    for w, r in res.items():
        print(
            f"tokenize->{w:8s} best {min(r):6.2f} s  median {sorted(r)[1]:6.2f} s"
            f"  raw {[round(x, 2) for x in r]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
