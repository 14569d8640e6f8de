"""curate_corpus — one labelled training-split decision per doc."""

from __future__ import annotations

import pandas as pd

from open_source_search_engine_spark.operators.curate import curate_corpus

WORDS = [f"w{i}" for i in range(1, 30)]


def _doc(lo: int, hi: int) -> str:
    return " ".join(WORDS[lo - 1 : hi])


def test_reasons_and_priority(spark):
    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4, 5],
                "text": [
                    _doc(1, 12),          # kept
                    _doc(1, 12),          # exact dup of 1 → duplicate
                    "w1 w2",              # too_short (also a near-dup of nothing)
                    "the a the a the a the a",  # stopword-heavy → low_quality
                    _doc(15, 26),         # kept
                ],
            }
        )
    )
    out = {r.doc_id: r for r in curate_corpus(docs, max_stopword_ratio=0.5).collect()}
    assert len(out) == 5  # every input doc gets a verdict
    assert out[1].keep and out[1].drop_reason is None
    assert out[5].keep
    assert out[2].drop_reason == "duplicate"
    assert out[3].drop_reason == "too_short"
    assert out[4].drop_reason == "low_quality"


def test_cluster_mode_collapses_chains(spark):
    # 1~2 and 2~3 near-dups (not exact): cluster mode keeps only doc 1
    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": [_doc(1, 10), _doc(4, 13), _doc(7, 16)],
            }
        )
    )
    exact = {r.doc_id: r.keep for r in curate_corpus(docs, dedup="exact").collect()}
    assert exact == {1: True, 2: True, 3: True}  # no exact dups
    clus = {
        r.doc_id: (r.keep, r.drop_reason)
        for r in curate_corpus(docs, dedup="cluster", jaccard_threshold=0.4).collect()
    }
    assert clus == {
        1: (True, None),
        2: (False, "duplicate"),
        3: (False, "duplicate"),
    }


def test_decontamination_drops_bench_and_overlap(spark):
    bench = spark.createDataFrame(
        pd.DataFrame({"doc_id": [100], "text": [_doc(1, 10)]})
    )
    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 100],
                "text": [_doc(1, 10), _doc(15, 26), _doc(1, 10)],
            }
        )
    )
    out = {
        r.doc_id: (r.keep, r.drop_reason)
        for r in curate_corpus(
            docs, decontam_threshold=0.5, bench_docs=bench, dedup="none"
        ).collect()
    }
    assert out[1] == (False, "contaminated")  # verbatim eval copy
    assert out[2] == (True, None)
    assert out[100] == (False, "benchmark")  # the eval row itself never trains


def test_cluster_keeper_dropped_by_quality_does_not_lose_content(spark):
    # near-dup pair where the min-doc_id copy fails the length gate:
    # the keeper must be re-picked among quality-passing docs, never
    # dropping every copy of the content
    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2],
                "text": [_doc(1, 4), _doc(1, 8)],  # J = 2/6 = 0.333
            }
        )
    )
    out = {
        r.doc_id: (r.keep, r.drop_reason)
        for r in curate_corpus(
            docs, min_tokens=5, dedup="cluster", jaccard_threshold=0.3
        ).collect()
    }
    assert out[1] == (False, "too_short")
    assert out[2] == (True, None)  # sole surviving copy is kept


def test_bench_keeper_does_not_lose_cluster_content(spark):
    # near-dup chain 1~2~3 where doc 1 IS a benchmark row: doc 1 always
    # drops (reason 'benchmark'), so the cluster keeper must be
    # re-picked among training docs — doc 2 survives, doc 3 is the
    # duplicate. Before the fix every training copy dropped.
    bench = spark.createDataFrame(pd.DataFrame({"doc_id": [1], "text": [_doc(1, 10)]}))
    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": [_doc(1, 10), _doc(4, 13), _doc(7, 16)],
            }
        )
    )
    out = {
        r.doc_id: (r.keep, r.drop_reason)
        for r in curate_corpus(
            docs,
            dedup="cluster",
            jaccard_threshold=0.4,
            decontam_threshold=0.7,  # doc 2's bench overlap is 5/8 < 0.7
            bench_docs=bench,
        ).collect()
    }
    assert out[1] == (False, "benchmark")
    assert out[2] == (True, None)  # re-picked keeper — content survives
    assert out[3] == (False, "duplicate")


def test_exact_copy_of_bench_doc_is_contaminated(spark):
    # the exact-dup analog is safe by construction: a verbatim training
    # copy of a bench doc has overlap 1.0 and drops as contaminated
    bench = spark.createDataFrame(pd.DataFrame({"doc_id": [1], "text": [_doc(1, 10)]}))
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "text": [_doc(1, 10), _doc(1, 10)]})
    )
    out = {
        r.doc_id: (r.keep, r.drop_reason)
        for r in curate_corpus(
            docs, dedup="exact", decontam_threshold=0.5, bench_docs=bench
        ).collect()
    }
    assert out[1] == (False, "benchmark")
    assert out[2] == (False, "contaminated")
