"""A6 siteRank over a synthetic repo-import edge table."""

from __future__ import annotations

from open_source_search_engine_spark.operators.site_rank import site_inlinks, site_rank


def test_site_rank_buckets(spark):
    edges = spark.createDataFrame(
        [("a", "hub")] * 3  # duplicate edges count once
        + [(s, "hub") for s in "bcdefgh"]  # 8 distinct inlinkers total
        + [("a", "mid"), ("b", "mid"), ("mid", "mid")]  # self link ignored
        + [("a", "leaf")],
        "src_site string, dst_site string",
    )
    got = {r["site"]: r for r in site_rank(edges).collect()}
    assert got["hub"]["n_inlinkers"] == 8
    assert got["hub"]["site_rank"] == 3  # floor(log2(9)) = 3
    assert got["mid"]["n_inlinkers"] == 2
    assert got["mid"]["site_rank"] == 1
    assert got["leaf"]["site_rank"] == 1


def test_site_inlinks_excludes_self(spark):
    edges = spark.createDataFrame(
        [("x", "x"), ("y", "x")], "src_site string, dst_site string"
    )
    rows = {r["site"]: r["n_inlinkers"] for r in site_inlinks(edges).collect()}
    assert rows == {"x": 1}


def test_anchored_index_matches_corpus_path(spark, docs_001, tmp_path):
    """J3 at build time: a store built with anchor_edges serves the
    SAME top-k as the corpus-algebra anchored BM25, and the content
    sha256 invariant stays over the ORIGINAL text."""
    import pyspark.sql.functions as F

    from open_source_search_engine_spark.config import EngineConfig
    from open_source_search_engine_spark.index import builder
    from open_source_search_engine_spark.operators import anchors, indexed

    d = tmp_path / "anc"
    edges = anchors.synthetic_edges(docs_001)
    builder.build_index(
        spark, docs_001, d,
        cfg=EngineConfig(n_buckets=8, n_salts=2, block_size=16),
        text_col="text", anchor_edges=edges,
    )
    want = [
        (r["doc_id"], r["score"])
        for r in anchors.bm25_topk_anchored(
            docs_001, edges, ["join", "hash"], k=10
        ).collect()
    ]
    got = [
        (r["doc_id"], r["score"])
        for r in indexed.bm25_topk(spark, d, ["join", "hash"], k=10).collect()
    ]
    assert got == want
    dm = spark.read.parquet(str(d / "doc_meta")).select("doc_id", "content_sha256")
    src = docs_001.select(
        "doc_id", F.sha2(F.col("text").cast("binary"), 256).alias("s")
    )
    assert dm.join(src, "doc_id").filter(
        F.col("content_sha256") != F.col("s")
    ).count() == 0


def test_site_rank_persisted_boost(spark, docs_001, tmp_path):
    """site_rank persisted in doc_meta at build: the indexed boosted
    top-k equals the corpus path that re-derives ranks per query."""
    from open_source_search_engine_spark.config import EngineConfig
    from open_source_search_engine_spark.index import builder
    from open_source_search_engine_spark.operators import anchors, indexed

    d = tmp_path / "sr"
    builder.build_index(
        spark, docs_001, d,
        cfg=EngineConfig(n_buckets=8, n_salts=2, block_size=16),
        text_col="text", extra_meta_cols=["source"],
        site_rank_edges=anchors.synthetic_edges(docs_001), site_col="source",
    )
    want = [
        (r["doc_id"], r["score"], r["site"])
        for r in anchors.bm25_topk_site_boosted(
            docs_001, ["join", "hash"], k=10
        ).collect()
    ]
    got = [
        (r["doc_id"], r["score"], r["site"])
        for r in indexed.bm25_topk_site_boosted(
            spark, d, ["join", "hash"], k=10
        ).collect()
    ]
    assert got == want
