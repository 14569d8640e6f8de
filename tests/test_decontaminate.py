"""decontaminate — n-gram overlap flagging against a benchmark set."""

from __future__ import annotations

import pandas as pd

from open_source_search_engine_spark.operators.textstats import decontaminate

WORDS = [f"w{i}" for i in range(1, 30)]


def _doc(lo: int, hi: int) -> str:
    return " ".join(WORDS[lo - 1 : hi])


def test_flags_overlapping_docs_only(spark):
    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": [
                    _doc(1, 10),  # verbatim copy of the bench doc → overlap 1.0
                    _doc(6, 15),  # tail overlap: shingles 6..8 of 8 → 3/8
                    "zz yy xx ww vv uu",  # disjoint
                ],
            }
        )
    )
    bench = spark.createDataFrame(
        pd.DataFrame({"doc_id": [100], "text": [_doc(1, 10)]})
    )
    out = {r.doc_id: r for r in decontaminate(docs, bench_docs=bench, threshold=0.3).collect()}
    assert set(out) == {1, 2}
    assert out[1].overlap == 1.0
    assert out[2].n_hit == 3 and out[2].n_sh == 8
    # higher bar drops the partial overlap
    strict = decontaminate(docs, bench_docs=bench, threshold=0.9)
    assert [r.doc_id for r in strict.collect()] == [1]


def test_bench_slice_excluded_from_train_side(spark):
    # doc 20 IS the synthetic bench slice (doc_id % 20 == 0): it must
    # not flag itself even though it trivially matches 100%
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [20, 21], "text": [_doc(1, 10), _doc(1, 10)]})
    )
    out = decontaminate(docs, threshold=0.5).collect()
    assert [(r.doc_id, r.overlap) for r in out] == [(21, 1.0)]


def test_shuffle_and_broadcast_paths_agree(spark):
    # the default synthetic slice is corpus-scale at 100 TB, so it runs
    # WITHOUT broadcast; forcing broadcast on the same inputs must not
    # change a single row (strategy, not semantics)
    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [20, 21, 22, 40],
                "text": [_doc(1, 10), _doc(1, 10), _doc(6, 15), _doc(11, 20)],
            }
        )
    )
    auto = sorted(map(tuple, decontaminate(docs, threshold=0.2).collect()))
    forced = sorted(
        map(tuple, decontaminate(docs, threshold=0.2, broadcast_bench=True).collect())
    )
    assert auto == forced and len(auto) >= 1

    bench = spark.createDataFrame(pd.DataFrame({"doc_id": [100], "text": [_doc(1, 10)]}))
    b_auto = sorted(
        map(tuple, decontaminate(docs, bench_docs=bench, threshold=0.2).collect())
    )
    b_shuffle = sorted(
        map(
            tuple,
            decontaminate(
                docs, bench_docs=bench, threshold=0.2, broadcast_bench=False
            ).collect(),
        )
    )
    assert b_auto == b_shuffle
