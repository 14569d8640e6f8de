"""sources.table_io — ingest the input_hint-shaped corpus and build.

Pins: stable content-addressed doc_id, passthrough metadata into
doc_meta, the sha256 per-row invariant vs the SOURCE table (north_rule
per-row invariant over the ingested shape), and the collision check.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from open_source_search_engine_spark.sources import canonicalize_corpus, read_corpus
from open_source_search_engine_spark.sources.table_io import iceberg_available


@pytest.fixture(scope="module")
def corpus_path(tmp_path_factory):
    from fixtures.gen_corpus import gen_corpus

    pdf = gen_corpus(200).drop(columns=["doc_id"])
    p = tmp_path_factory.mktemp("src") / "corpus.parquet"
    pdf.to_parquet(p, index=False)
    return str(p)


def test_canonicalize_assigns_stable_ids(spark, corpus_path):
    df1 = read_corpus(spark, corpus_path, fmt="parquet", check_collisions=True)
    df2 = read_corpus(spark, corpus_path, fmt="parquet")
    assert {"doc_id", "text", "repo", "path", "commit", "lang"} <= set(df1.columns)
    ids1 = sorted(r.doc_id for r in df1.select("doc_id").collect())
    ids2 = sorted(r.doc_id for r in df2.select("doc_id").collect())
    assert ids1 == ids2  # content-addressed: identical across reads
    assert len(ids1) == 200 and len(set(ids1)) == 200
    assert min(ids1) >= 0  # builder._salt_col needs non-negative ids


def test_canonical_table_passthrough(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "text": ["a b", "c d"], "lang": ["en", "en"]})
    )
    out = canonicalize_corpus(df)
    assert out is df  # already canonical — untouched plan


def test_missing_columns_raise(spark):
    df = spark.createDataFrame(pd.DataFrame({"repo": ["r"], "content": ["x"]}))
    with pytest.raises(ValueError, match="lacks"):
        canonicalize_corpus(df)


def test_collision_check_fires(spark):
    pdf = pd.DataFrame(
        {
            "repo": ["r", "r"],
            "path": ["p", "p"],
            "commit": ["c", "c"],
            "lang": ["py", "py"],
            "content": ["one", "two"],
        }
    )
    df = spark.createDataFrame(pdf)
    with pytest.raises(ValueError, match="collision"):
        canonicalize_corpus(df, check_collisions=True)


def test_iceberg_gated(spark, corpus_path):
    # the sandbox has no iceberg jar: auto falls back to parquet for a
    # path, and an explicit fmt='iceberg' fails loudly rather than
    # silently reading the wrong format
    assert read_corpus(spark, corpus_path).count() == 200
    if not iceberg_available(spark):
        with pytest.raises(RuntimeError, match="iceberg"):
            read_corpus(spark, "db.tbl", fmt="iceberg")


def test_build_from_ingested_corpus_sha_invariant(spark, corpus_path, tmp_path):
    from open_source_search_engine_spark.config import EngineConfig
    from open_source_search_engine_spark.index import builder, wand

    docs = read_corpus(spark, corpus_path, fmt="parquet")
    idx = tmp_path / "idx"
    builder.build_index(
        spark,
        docs,
        idx,
        cfg=EngineConfig(n_buckets=4, n_salts=2, block_size=32),
        text_col="text",
        tokenizer_mode="code",
        extra_meta_cols=["repo", "path", "lang"],
    )
    dm = spark.read.parquet(str(idx / "doc_meta"))
    # per-row invariant (BASELINE.json): sha256(content) equality
    # between the SOURCE table and doc_meta, every row
    src = docs.select(
        "doc_id", F.sha2(F.col("text").cast("binary"), 256).alias("src_sha")
    )
    bad = (
        dm.join(src, "doc_id", "full")
        .where(
            F.col("content_sha256").isNull()
            | F.col("src_sha").isNull()
            | (F.col("content_sha256") != F.col("src_sha"))
        )
        .count()
    )
    assert bad == 0
    assert dm.filter(F.col("repo").isNull() | F.col("path").isNull()).count() == 0
    # the store is queryable end-to-end off the ingested ids
    top = wand.wand_topk(spark, idx, ["def", "return"], k=5, mode="or")
    assert top.count() > 0


def test_preexisting_text_column_does_not_collide(spark):
    pdf = pd.DataFrame(
        {
            "repo": ["r"],
            "path": ["p"],
            "commit": ["c"],
            "lang": ["py"],
            "content": ["real body"],
            "text": ["stale column"],
        }
    )
    out = canonicalize_corpus(spark.createDataFrame(pdf))
    assert out.columns.count("text") == 1
    assert out.select("text").first().text == "real body"


def test_collision_check_applies_to_precanonical_tables(spark):
    # a caller asking for the guard on an already-keyed table gets a
    # real check, not a silent pass-through
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 1], "text": ["one", "two"]})
    )
    with pytest.raises(ValueError, match="collision"):
        canonicalize_corpus(df, check_collisions=True)


def test_auto_table_name_without_iceberg_raises_loudly(spark):
    # fmt='auto' with a catalog-shaped location and no Iceberg jar must
    # give the jar-absent error, never a confusing parquet path failure
    if iceberg_available(spark):
        pytest.skip("iceberg jar present in this runtime")
    with pytest.raises(RuntimeError, match="[Ii]ceberg"):
        read_corpus(spark, "db.tbl")
