"""Recall checks for the approximate similarity paths (the checks the
LSH docstrings promise — VERDICT r01 item 5).

The exact brute-force operators (`cosine_topk`, pairwise cosine) are
the oracles; the LSH variants are approximate BY DESIGN, so the pin is
a recall floor on the deterministic embeddings fixture, not equality.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from open_source_search_engine_spark.operators import similarity as S

EMB = "/root/testdata/sf0.001/embeddings.parquet"


@pytest.fixture(scope="module")
def embs(spark):
    df = spark.read.parquet(EMB).cache()
    df.count()
    return df


def test_lsh_ann_recall_vs_exact(embs, spark):
    """recall@10 of lsh_ann_topk vs cosine_topk ≥ 0.5 over several
    query points (the floor the settings were tuned for)."""
    recalls = []
    for qid in (0, 1, 2, 3, 4):
        exact = {r["vec_id"] for r in S.cosine_topk(embs, qid, 10).collect()}
        approx = {r["vec_id"] for r in S.lsh_ann_topk(embs, qid, 10).collect()}
        assert len(exact) == 10
        recalls.append(len(exact & approx) / 10.0)
    assert sum(recalls) / len(recalls) >= 0.5, recalls


def test_lsh_ann_results_are_true_cosines(embs):
    """Every (vec_id, cos_sim) the LSH path returns must equal the
    exact cosine for that pair — LSH may MISS neighbors, never invent
    or mis-score them."""
    approx = {r["vec_id"]: r["cos_sim"] for r in S.lsh_ann_topk(embs, 0, 10).collect()}
    exact_all = {
        r["vec_id"]: r["cos_sim"]
        for r in S.cosine_topk(embs, 0, k=10_000).collect()
    }
    for vid, cos in approx.items():
        assert abs(exact_all[vid] - cos) < 1e-9


def test_embedding_near_dup_recall(embs, spark):
    """embedding_near_dup must find ≥ 90% of true near-dup pairs at
    cos ≥ 0.99 and report nothing below threshold (precision 1.0 —
    the verify step is exact). The base fixture is uniform-random (no
    natural near-dups), so build the positive set deterministically:
    append a perturbed copy of each of the first 100 vectors (tiny
    seeded shift ⇒ cos(original, copy) ≥ 0.99)."""
    import numpy as np

    rng = np.random.default_rng(7)
    base = embs.filter(F.col("vec_id") < 100).toPandas()
    import pandas as pd

    pert = base.copy()
    pert["vec_id"] = pert["vec_id"] + 100_000
    pert["embedding"] = [
        (np.asarray(v, dtype=np.float64) + rng.normal(0, 0.01, len(v))).astype(
            np.float32
        ).tolist()
        for v in pert["embedding"]
    ]
    both = spark.createDataFrame(pd.concat([base, pert], ignore_index=True))
    got = S.embedding_near_dup(both, threshold=0.99).collect()
    got_pairs = {(r["id_a"], r["id_b"]) for r in got}
    want_pairs = {(i, i + 100_000) for i in range(100)}
    # verify the expected pairs really are ≥ 0.99 (perturbation is tiny)
    assert all(r["cos_sim"] >= 0.99 for r in got)  # precision
    found = len(got_pairs & want_pairs)
    assert found / len(want_pairs) >= 0.9, f"recall {found}/100"


def test_ivf_ann_recall_vs_exact(embs):
    """recall@10 of ivf_ann_topk (4/16 probes) vs exact ≥ 0.7 on the
    fixture (measured ~0.92); returned scores must be exact cosines."""
    recalls = []
    for qid in (0, 1, 2, 3, 4):
        exact = {r["vec_id"] for r in S.cosine_topk(embs, qid, 10).collect()}
        approx = {r["vec_id"] for r in S.ivf_ann_topk(embs, qid, 10).collect()}
        recalls.append(len(exact & approx) / 10.0)
    assert sum(recalls) / len(recalls) >= 0.7, recalls

    approx = {r["vec_id"]: r["cos_sim"] for r in S.ivf_ann_topk(embs, 0, 10).collect()}
    exact_all = {
        r["vec_id"]: r["cos_sim"] for r in S.cosine_topk(embs, 0, k=10_000).collect()
    }
    for vid, cos in approx.items():
        assert abs(exact_all[vid] - cos) < 1e-9


def test_ivf_prebuilt_store(embs, spark, tmp_path):
    """ivf_build + ivf_ann_topk_prebuilt: the plan must read only the
    probed cell partitions (no assignment window at query time), the
    returned scores must be exact cosines, and recall must at least
    match the inline path's floor."""
    store = str(tmp_path / "ivf")
    S.ivf_build(spark, embs, store)

    df = S.ivf_ann_topk_prebuilt(spark, store, embs, 0, 10)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "PartitionFilters: [cell" in plan

    exact_all = {
        r["vec_id"]: r["cos_sim"] for r in S.cosine_topk(embs, 0, k=10_000).collect()
    }
    rows = df.collect()
    assert len(rows) == 10
    for r in rows:
        assert abs(exact_all[r["vec_id"]] - r["cos_sim"]) < 1e-9

    recalls = []
    for qid in (0, 1, 2, 3, 4):
        exact = {r["vec_id"] for r in S.cosine_topk(embs, qid, 10).collect()}
        approx = {
            r["vec_id"]
            for r in S.ivf_ann_topk_prebuilt(spark, store, embs, qid, 10).collect()
        }
        recalls.append(len(exact & approx) / 10.0)
    assert sum(recalls) / len(recalls) >= 0.7, recalls


def test_ivf_knn_join_matches_per_query_probe(spark, embs, tmp_path):
    """The batched probe join must return, per query, exactly what the
    single-query prebuilt path returns — and the shuffle-probe branch
    (corpus-scale query sets) must match the broadcast branch row for
    row. The plan carries a dynamic-partition-pruning subquery on
    `cell`, the batched analog of the single path's driver-side
    isin() prune."""
    store = str(tmp_path / "ivf_batch")
    S.ivf_build(spark, embs, store)
    queries = (
        embs.orderBy("vec_id").limit(5).withColumnRenamed("vec_id", "query_id")
    )
    got = S.ivf_knn_join(spark, store, queries, k=3)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan
    by_q = {}
    for r in got.collect():
        by_q.setdefault(r["query_id"], []).append((r["vec_id"], r["cos_sim"]))
    assert set(by_q) == {0, 1, 2, 3, 4}
    for qid, rows in by_q.items():
        single = [
            (r["vec_id"], r["cos_sim"])
            for r in S.ivf_ann_topk_prebuilt(spark, store, embs, qid, 3).collect()
        ]
        assert sorted(rows) == sorted(single), qid

    shuffled = S.ivf_knn_join(spark, store, queries, k=3, broadcast_queries=False)
    assert sorted(map(tuple, shuffled.collect())) == sorted(
        map(tuple, got.collect())
    )


def test_ivf_add_incremental_ingest(embs, spark, tmp_path):
    """ivf_add (VERDICT r04 item 3): build on the even half, append the
    odd half under the FROZEN centroids. Invariants: (a) no vector is
    lost and every added vector sits in its argmax cell under the
    stored centroids (so any probe visiting that cell finds it
    exactly); (b) probes return exact cosines; (c) recall holds the
    same floor as the full build."""
    from pyspark.sql import functions as F

    store = str(tmp_path / "ivf_add")
    even = embs.filter(F.col("vec_id") % 2 == 0)
    odd = embs.filter(F.col("vec_id") % 2 == 1)
    S.ivf_build(spark, even, store)
    S.ivf_add(spark, store, odd)

    cells = spark.read.parquet(f"{store}/cells")
    assert cells.count() == embs.count()
    assert cells.select("vec_id").distinct().count() == embs.count()
    # added vectors are in their argmax cell under the stored centroids
    cents = spark.read.parquet(f"{store}/centroids")
    want = S._assign_cells(
        odd.select("vec_id", F.col("embedding").cast("array<double>").alias("v")),
        cents,
        "vec_id",
    ).select("vec_id", F.col("cell").alias("want_cell"))
    mismatched = (
        cells.join(want, "vec_id").filter(F.col("cell") != F.col("want_cell")).count()
    )
    assert mismatched == 0

    exact_all = {
        r["vec_id"]: r["cos_sim"] for r in S.cosine_topk(embs, 0, k=10_000).collect()
    }
    rows = S.ivf_ann_topk_prebuilt(spark, store, embs, 0, 10).collect()
    assert len(rows) == 10
    for r in rows:
        assert abs(exact_all[r["vec_id"]] - r["cos_sim"]) < 1e-9

    recalls = []
    for qid in (0, 1, 2, 3, 4):
        exact = {r["vec_id"] for r in S.cosine_topk(embs, qid, 10).collect()}
        approx = {
            r["vec_id"]
            for r in S.ivf_ann_topk_prebuilt(spark, store, embs, qid, 10).collect()
        }
        recalls.append(len(exact & approx) / 10.0)
    assert sum(recalls) / len(recalls) >= 0.7, recalls
