"""Proximity ranking: corpus path == index path == hand semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from open_source_search_engine_spark.index import builder
from open_source_search_engine_spark.operators import proximity
from tests.conftest import TEST_CFG


@pytest.fixture(scope="module")
def prox_idx(spark, tiny_corpus, tmp_path_factory):
    d = tmp_path_factory.mktemp("idx_prox") / "idx"
    builder.build_index(
        spark, tiny_corpus, d, cfg=TEST_CFG, text_col="content", tokenizer_mode="code"
    )
    return d


def test_corpus_and_index_paths_agree(spark, tiny_corpus, prox_idx):
    for terms in [["index", "merge"], ["hash", "join", "scan"]]:
        want = proximity.proximity_topk(
            tiny_corpus, terms, k=10, text_col="content", tokenizer_mode="code"
        ).collect()
        got = proximity.proximity_topk_indexed(spark, prox_idx, terms, k=10).collect()
        assert [(r["doc_id"], r["score"]) for r in got] == [
            (r["doc_id"], r["score"]) for r in want
        ], terms


def test_single_term_is_empty(spark, tiny_corpus, prox_idx):
    # mindist is a pair distance — both paths must agree on the
    # degenerate single-term query (empty result, like the oracle)
    assert proximity.proximity_topk(
        tiny_corpus, ["index"], k=5, text_col="content", tokenizer_mode="code"
    ).count() == 0
    assert proximity.proximity_topk_indexed(spark, prox_idx, ["index"], k=5).count() == 0


def test_proximity_boost_semantics(spark):
    """Adjacent pair beats distant pair when BM25 is identical."""
    docs = spark.createDataFrame(
        [
            (0, "alpha beta filler filler filler"),
            (1, "alpha filler filler filler beta"),
        ],
        "doc_id long, text string",
    )
    out = proximity.proximity_topk(docs, ["alpha", "beta"], k=2).collect()
    assert [r["doc_id"] for r in out] == [0, 1]
    assert out[0]["score"] > out[1]["score"]
