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
