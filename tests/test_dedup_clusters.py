"""dedup_clusters — connected components over the near-dup pair graph.

Pins the transitivity semantics pairwise dedup misses: a chain
A~B, B~C with A!~C must land in ONE cluster with min-doc_id keeper,
and docs with no near-dup pair stay out of the output entirely.
"""

from __future__ import annotations

import pandas as pd

from open_source_search_engine_spark.operators.dedup import (
    dedup_clusters,
    ngram_jaccard_pairs,
)

WORDS = [f"w{i}" for i in range(1, 30)]


def _doc(lo: int, hi: int) -> str:
    return " ".join(WORDS[lo - 1 : hi])


def _chain_docs(spark):
    # overlapping 10-token windows, stride 3: adjacent docs share 5 of
    # 11 distinct shingles (J≈0.4545), next-but-one only 2 of 14
    # (J≈0.143) — threshold 0.4 yields edges 1-2, 2-3, 3-4 only
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 99],
            "text": [
                _doc(1, 10),
                _doc(4, 13),
                _doc(7, 16),
                _doc(10, 19),
                "zz yy xx ww vv uu",  # singleton: no near-dup pair
            ],
        }
    )
    return spark.createDataFrame(pdf)


def test_chain_collapses_to_one_cluster(spark):
    docs = _chain_docs(spark)
    pairs = ngram_jaccard_pairs(docs, threshold=0.4).collect()
    assert {(r.doc_id_a, r.doc_id_b) for r in pairs} == {(1, 2), (2, 3), (3, 4)}

    out = dedup_clusters(docs, threshold=0.4).collect()
    # the 3-hop chain needs >1 propagation round to reach doc 4
    assert {r.doc_id for r in out} == {1, 2, 3, 4}  # singleton 99 absent
    assert all(r.cluster_id == 1 for r in out)
    assert all(r.cluster_size == 4 for r in out)
    assert [r.doc_id for r in out if r.is_keeper] == [1]


def test_independent_clusters_stay_separate(spark):
    pdf = pd.DataFrame(
        {
            "doc_id": [10, 11, 20, 21],
            "text": [_doc(1, 10), _doc(1, 10), _doc(15, 24), _doc(15, 24)],
        }
    )
    out = dedup_clusters(spark.createDataFrame(pdf), threshold=0.4)
    got = {(r.doc_id, r.cluster_id, r.cluster_size) for r in out.collect()}
    assert got == {(10, 10, 2), (11, 10, 2), (20, 20, 2), (21, 20, 2)}


def test_no_pairs_empty_output(spark):
    pdf = pd.DataFrame({"doc_id": [1, 2], "text": [_doc(1, 10), "zz yy xx ww vv uu"]})
    df = dedup_clusters(spark.createDataFrame(pdf), threshold=0.4)
    assert df.count() == 0
    assert df.columns == ["doc_id", "cluster_id", "cluster_size", "is_keeper"]


# --- property test: the Spark kernel vs a pure-Python union-find ---

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _uf_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    out = {}
    for n in list(parent):
        out[n] = find(n)
    return out


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(st.integers(1, 25), st.integers(1, 25)).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=40,
    )
)
def test_connected_components_matches_union_find(spark, edges):
    from open_source_search_engine_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id_a": [min(a, b) for a, b in edges],
                "doc_id_b": [max(a, b) for a, b in edges],
            }
        )
    )
    got = {r.doc_id: r.cluster_id for r in connected_components(pairs).collect()}
    want = _uf_components(edges)
    assert got == want
    # cluster_id is always the component min
    assert all(cid == min(k for k, v in got.items() if v == cid) for cid in set(got.values()))


def test_long_chain_hits_max_iter_loudly_then_converges(spark):
    # a 12-node path graph has diameter 11 — hash-to-min needs ~11
    # propagation rounds, so max_iter=3 must fail LOUDLY (partial
    # labels would silently under-merge clusters), and the plumbed-up
    # budget converges to one component
    import pytest

    from open_source_search_engine_spark.operators.dedup import connected_components

    n = 12
    pairs = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id_a": list(range(1, n)), "doc_id_b": list(range(2, n + 1))}
        )
    )
    with pytest.raises(RuntimeError, match="converge"):
        connected_components(pairs, max_iter=3)
    out = {r.doc_id: r.cluster_id for r in connected_components(pairs, max_iter=n + 1).collect()}
    assert set(out.values()) == {1} and len(out) == n


def test_checkpoint_dir_rounds_are_durable_and_identical(spark, tmp_path):
    # parquet-round mode (the 100 TB durability path) must produce the
    # exact same labelling as localCheckpoint mode, and leave restart
    # points on disk
    docs = _chain_docs(spark)
    base = {
        (r.doc_id, r.cluster_id, r.cluster_size, r.is_keeper)
        for r in dedup_clusters(docs, threshold=0.4).collect()
    }
    ckpt = tmp_path / "cc_rounds"
    durable = {
        (r.doc_id, r.cluster_id, r.cluster_size, r.is_keeper)
        for r in dedup_clusters(docs, threshold=0.4, checkpoint_dir=str(ckpt)).collect()
    }
    assert durable == base
    # superseded rounds are deleted as the loop advances: on success
    # exactly ONE label table — the final round, the one the returned
    # DataFrame reads — survives (no stale-mix from earlier runs)
    rounds = sorted(p.name for p in ckpt.glob("labels_round_*"))
    assert len(rounds) == 1
    # rerunning in the same dir must not leave the old run's rounds
    rerun = {
        (r.doc_id, r.cluster_id, r.cluster_size, r.is_keeper)
        for r in dedup_clusters(docs, threshold=0.4, checkpoint_dir=str(ckpt)).collect()
    }
    assert rerun == base
    assert len(list(ckpt.glob("labels_round_*"))) == 1


def test_minhash_verify_shuffle_branch_matches_broadcast(spark):
    # a 50 %-near-duplicate corpus — the case where candidates are
    # corpus-scale and the broadcast verify would funnel them through
    # the driver. Both join strategies must return identical pairs.
    from open_source_search_engine_spark.operators.dedup import minhash_lsh_pairs

    rows = []
    for i in range(1, 21):
        rows.append((2 * i, _doc(1, 14) + f" tail{i}"))      # near-dup family
        rows.append((2 * i + 1, " ".join(f"u{i}x{j}" for j in range(8))))  # unique
    docs = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    bc = sorted(
        map(tuple, minhash_lsh_pairs(docs, threshold=0.5, broadcast_candidates=True).collect())
    )
    sh = sorted(
        map(tuple, minhash_lsh_pairs(docs, threshold=0.5, broadcast_candidates=False).collect())
    )
    assert bc == sh and len(bc) > 50  # dense dup family actually exercised
