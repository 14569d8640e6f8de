"""TableIO — source-corpus ingestion (SURVEY.md §7 M0; §2.1 S1 row).

The reference's document store is titledb, keyed by a 38-bit docId
probed on collision (Titledb.h; XmlDoc::getDocId — SURVEY.md §1.3).
Here the source of truth is the input table itself (BASELINE.json
input_hint: ``(repo, path, commit, lang, content)``); this module
turns it into the engine's canonical build input:

    (doc_id long, text string, lang string [, passthrough meta cols])

Format gating (SURVEY.md §7 M0): ``spark.read.format("iceberg")`` /
``spark.read.table`` when the runtime carries the Iceberg jar, plain
parquet otherwise — the sandbox has no iceberg-spark-runtime jar, so
the parquet branch is what tests exercise; the iceberg branch is the
same DataFrame from the reader on, so every downstream plan
(pushdown, pruning, salting) is format-agnostic.

doc_id assignment
-----------------
``doc_id = xxhash64(repo, path, commit) & MAX_LONG`` — content-
addressed and STABLE across snapshots (the same file version always
gets the same id), which is what makes incremental/streaming builds
and tombstone deletes addressable without a global id registry.
Masking to 63 bits keeps ids non-negative for the builder's
contiguous doc_id-range salting (builder._salt_col).

Collision honesty: 63-bit birthday math gives ~5e4 expected pairwise
collisions at 10^12 docs (~1e-8 of the corpus). The reference probes
titledb and increments the docId on collision — an inherently serial
registry we deliberately do NOT replicate. Instead ``read_corpus``
exposes ``check_collisions`` (one distinct-count aggregation) so a
production build can fail loudly and route collided rows to a salted
re-hash; at test scale the check is exact and cheap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MAX_LONG = (1 << 63) - 1

#: the BASELINE.json input_hint shape
CORPUS_COLS = ("repo", "path", "commit", "lang", "content")


def iceberg_available(spark: SparkSession) -> bool:
    """True iff the JVM classpath carries the Iceberg Spark runtime."""
    try:
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001
            "org.apache.iceberg.spark.source.IcebergSource"
        )
        return True
    except Exception:
        return False


def read_corpus(
    spark: SparkSession,
    location: str,
    fmt: str = "auto",
    check_collisions: bool = False,
) -> DataFrame:
    """Read the source corpus and canonicalize it.

    fmt:
      * ``"iceberg"`` — ``location`` is a catalog table name
        (``db.tbl``) → ``spark.read.table``; or a path →
        ``format("iceberg").load``. Raises if the jar is absent.
      * ``"parquet"`` — ``spark.read.parquet(location)``.
      * ``"auto"`` — iceberg when the jar is present AND location is
        not an existing filesystem path; parquet otherwise.
    """
    if fmt == "auto":
        from pathlib import Path

        is_path = "/" in location or Path(location).exists()
        if is_path:
            fmt = "parquet"
        elif iceberg_available(spark):
            fmt = "iceberg"
        else:
            # a table-shaped location ('db.tbl') can only resolve via
            # the catalog — falling through to spark.read.parquet would
            # fail with a misleading path-not-found error
            raise RuntimeError(
                f"fmt='auto' resolved {location!r} to a catalog table name "
                "(no '/' and not an existing path) but iceberg-spark-runtime "
                "is not on the JVM classpath; pass fmt='parquet' with a "
                "filesystem path, or add the Iceberg jar"
            )
    if fmt == "iceberg":
        if not iceberg_available(spark):
            raise RuntimeError(
                "fmt='iceberg' but iceberg-spark-runtime is not on the "
                "JVM classpath; pass fmt='parquet' or add the jar"
            )
        df = (
            spark.read.table(location)
            if "/" not in location
            else spark.read.format("iceberg").load(location)
        )
    elif fmt == "parquet":
        df = spark.read.parquet(location)
    else:
        raise ValueError(f"unknown fmt {fmt!r}")
    return canonicalize_corpus(df, check_collisions=check_collisions)


def canonicalize_corpus(df: DataFrame, check_collisions: bool = False) -> DataFrame:
    """Map a source table to the engine's canonical build input.

    * input_hint shape ``(repo, path, commit, lang, content)`` →
      content-addressed ``doc_id``, ``content`` aliased to ``text``,
      ``repo``/``path``/``commit`` kept as passthrough metadata
      (titledb's TitleRec fields — they ride doc_meta via
      ``extra_meta_cols`` and are never tokenized).
    * already-canonical ``(doc_id, text, …)`` → returned as-is.

    All column work is JVM-side expressions — the projection and the
    xxhash64 fold into the scan stage, so a downstream
    ``select("doc_id", "text")`` still prunes the parquet read to the
    referenced source columns only.
    """
    cols = set(df.columns)
    if {"doc_id", "text"} <= cols:
        # already-canonical tables still get the collision guard a
        # caller asked for — pre-keyed ids can collide too
        if check_collisions:
            _check_collisions(df)
        return df
    missing = [c for c in CORPUS_COLS if c not in cols]
    if missing:
        raise ValueError(
            f"corpus table lacks {missing}; expected the input_hint shape "
            f"{CORPUS_COLS} or a canonical (doc_id, text, …) table"
        )
    out = df.select(
        (
            F.xxhash64(F.col("repo"), F.col("path"), F.col("commit"))
            .bitwiseAND(F.lit(MAX_LONG))
        ).alias("doc_id"),
        F.col("content").alias("text"),
        # a pre-existing `text` column would collide with the aliased
        # content — it loses to the input_hint mapping
        *[F.col(c) for c in df.columns if c not in ("content", "doc_id", "text")],
    )
    if check_collisions:
        _check_collisions(out)
    return out


def _check_collisions(df: DataFrame) -> None:
    """One distinct-count aggregation; fails loudly on duplicate ids."""
    n, nd = df.agg(
        F.count("doc_id").alias("n"),
        F.count_distinct("doc_id").alias("nd"),
    ).first()
    if n != nd:
        raise ValueError(
            f"doc_id collision: {n - nd} of {n} rows collide — "
            "re-key with a per-snapshot salt or a registry"
        )


# --- driver contract (value-verified ingestion) ---------------------
#
# The synthetic input_hint table is derived DETERMINISTICALLY from the
# fixture documents table with SQL-expressible column math, so DuckDB
# can rebuild the identical source rows. The doc_id itself is Spark's
# xxhash64 (no DuckDB equivalent), so the oracle pins everything AROUND
# it instead: text==content passthrough, sha256 invariant, and
# injectivity (ids_per_key, a window count per doc_id, must hash-match
# the oracle's literal 1 for every row — any xxhash64 collision or a
# dropped/duplicated row breaks the value hash; check_collisions=True
# additionally raises in-line).

def _synthetic_hint(docs: DataFrame) -> DataFrame:
    return docs.select(
        F.concat(F.lit("repo_"), (F.col("doc_id") % 20).cast("string")).alias("repo"),
        F.concat(
            F.lit("src/f"), F.col("doc_id").cast("string"), F.lit(".txt")
        ).alias("path"),
        F.concat(
            F.lit("c"), ((F.col("doc_id") * 2654435761) % 1000000007).cast("string")
        ).alias("commit"),
        F.col("lang"),
        F.col("text").alias("content"),
    )


def driver_queries():
    from pyspark.sql import Window

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        canon = canonicalize_corpus(_synthetic_hint(docs), check_collisions=True)
        return canon.select(
            "repo",
            "path",
            "commit",
            "lang",
            "text",
            F.sha2(F.col("text").cast("binary"), 256).alias("sha"),
            F.count(F.lit(1))
            .over(Window.partitionBy("doc_id"))
            .cast("bigint")
            .alias("ids_per_key"),
        ).orderBy("path")

    return {"table_io_canonical": run}


def driver_oracles():
    return {
        "table_io_canonical": """WITH hint AS (
  SELECT 'repo_' || (doc_id % 20) AS repo,
         'src/f' || doc_id || '.txt' AS path,
         'c' || ((doc_id * 2654435761) % 1000000007) AS "commit",
         lang, text AS content
  FROM documents
)
SELECT repo, path, "commit" AS commit, lang, content AS text,
       sha256(content) AS sha, 1::BIGINT AS ids_per_key
FROM hint ORDER BY path"""
    }
