"""M5 — incremental add / delete / update / compact (SURVEY.md §5.5):
multi-generation read equals logical truth; compaction equals a
from-scratch build over the live doc set."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from fixtures.gen_corpus import gen_corpus
from open_source_search_engine_spark.index import builder, merge, wand
from open_source_search_engine_spark.operators import bm25
from tests.conftest import TEST_CFG

TERMS = [["def", "return"], ["scan", "merge"], ["index"]]


def _oracle(docs, terms, mode="or", k=10):
    return bm25.bm25_topk_oracle(
        docs, terms, k=k, mode=mode, text_col="content", tokenizer_mode="code"
    ).toPandas()


@pytest.fixture(scope="module")
def corpora(spark):
    base_pdf = gen_corpus(n_docs=200)
    extra_pdf = gen_corpus(n_docs=260)
    extra_pdf = extra_pdf[extra_pdf["doc_id"] >= 200]
    base = spark.createDataFrame(base_pdf).cache()
    extra = spark.createDataFrame(extra_pdf).cache()
    full = base.unionByName(extra).cache()
    base.count(), extra.count(), full.count()
    return base, extra, full


def test_add_then_compact_matches_full_build(spark, corpora, tmp_path):
    base, extra, full = corpora
    d = tmp_path / "idx"
    builder.build_index(
        spark, base, d, cfg=TEST_CFG, text_col="content", tokenizer_mode="code"
    )
    merge.add_documents(spark, extra, d)
    assert merge.current_generations(d) == [0, 1]

    # multi-generation read finds docs from both generations (k covers
    # every match: membership check — scores are stale until compact)
    got = wand.wand_topk(spark, d, ["def", "return"], k=1000, mode="or").toPandas()
    want = _oracle(full, ["def", "return"], k=1000)
    assert set(got["doc_id"]) == set(want["doc_id"])

    # compact → exact stats → rank-identical to from-scratch oracle
    merge.compact(spark, d)
    assert merge.current_generations(d) == [0]
    for terms in TERMS:
        got = wand.wand_topk(spark, d, terms, k=10, mode="or").toPandas()
        want = _oracle(full, terms)
        assert list(got["doc_id"]) == list(want["doc_id"]), terms
        assert got["score"].tolist() == pytest.approx(want["score"].tolist(), abs=1e-5)


def test_delete_and_update(spark, corpora, tmp_path):
    base, _, _ = corpora
    d = tmp_path / "idx2"
    builder.build_index(
        spark, base, d, cfg=TEST_CFG, text_col="content", tokenizer_mode="code"
    )
    # find the current #1 doc for a query, delete it, expect it gone
    top = wand.wand_topk(spark, d, ["def"], k=1, mode="or").toPandas()
    victim = int(top["doc_id"].iloc[0])
    merge.delete_documents(spark, d, [victim])
    got = wand.wand_topk(spark, d, ["def"], k=50, mode="or").toPandas()
    assert victim not in set(got["doc_id"])

    # update: replace another doc's content; old postings must die
    top2 = wand.wand_topk(spark, d, ["return"], k=1, mode="or").toPandas()
    vic2 = int(top2["doc_id"].iloc[0])
    upd = base.filter(F.col("doc_id") == vic2).withColumn(
        "content", F.lit("zzzupdated only content now")
    )
    merge.add_documents(spark, upd, d, replace=True)
    got2 = wand.wand_topk(spark, d, ["zzzupdated"], k=5, mode="or").toPandas()
    assert set(got2["doc_id"]) == {vic2}
    got3 = wand.wand_topk(spark, d, ["return"], k=200, mode="or").toPandas()
    assert vic2 not in set(got3["doc_id"])

    # compact GCs tombstones and restores exact stats: rank-identical
    # to a from-scratch oracle over the LIVE doc set
    merge.compact(spark, d)
    assert not (d / "tombstones").exists()
    live = base.filter(F.col("doc_id") != victim).filter(
        F.col("doc_id") != vic2
    ).unionByName(upd)
    after = wand.wand_topk(spark, d, ["def", "return"], k=20, mode="or").toPandas()
    want = _oracle(live, ["def", "return"], k=20)
    assert list(after["doc_id"]) == list(want["doc_id"])
    assert after["score"].tolist() == pytest.approx(want["score"].tolist(), abs=1e-5)


def test_positions_survive_add_and_compact(spark, corpora, tmp_path):
    """Phrase matching (persisted pos_blob) must give identical answers
    across generations AND after compaction — the self-contained
    per-posting position streams re-slice correctly through the whole
    LSM lifecycle."""
    from open_source_search_engine_spark.index import lists
    from open_source_search_engine_spark.operators import phrase as phrase_ops

    base, extra, full = corpora
    d = tmp_path / "idx_pos"
    builder.build_index(
        spark, base, d, cfg=TEST_CFG, text_col="content", tokenizer_mode="code"
    )
    merge.add_documents(spark, extra, d)

    pairs = [("index", "merge"), ("def", "index"), ("scan", "scan")]

    def want(w1, w2):
        return [
            r["doc_id"]
            for r in phrase_ops.phrase_bigram(
                full.withColumnRenamed("content", "text"), w1, w2,
                tokenizer_mode="code",
            ).collect()
        ]

    for w1, w2 in pairs:
        got = [r["doc_id"] for r in lists.phrase_docs(spark, d, [w1, w2]).orderBy("doc_id").collect()]
        assert got == want(w1, w2), ("multi-gen", w1, w2)

    merge.compact(spark, d)
    for w1, w2 in pairs:
        got = [r["doc_id"] for r in lists.phrase_docs(spark, d, [w1, w2]).orderBy("doc_id").collect()]
        assert got == want(w1, w2), ("post-compact", w1, w2)
