"""Similarity search over an embedding column (array<float>).

Baseline: brute-force cosine top-k as pure column math —
`F.zip_with` dot products folded with `F.aggregate` (JVM-side,
codegen, float64). Scale path: random-hyperplane LSH bucketing so the
candidate join is per-bucket, not all-pairs; the hyperplanes are
derived deterministically from md5 so recall tests are reproducible
with no stored model.

At 100 TB the brute-force form is a broadcast of the (tiny) query set
against the full table — one scan, no shuffle; the kNN self-join form
is the expensive one and exists as the exact oracle for the LSH
variant's recall tests.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

N_PLANES = 12


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine_topk(
    embs: DataFrame, query_vec_id: int = 0, k: int = 10, id_col: str = "vec_id"
) -> DataFrame:
    """Brute-force cosine top-k vs one stored vector.
    (vec_id, cos_sim) — includes the query itself (cos 1.0),
    deterministic tie-break by vec_id."""
    e = embs.select(id_col, F.col("embedding").cast("array<double>").alias("v"))
    q = e.filter(F.col(id_col) == query_vec_id).select(F.col("v").alias("qv"))
    scored = e.crossJoin(F.broadcast(q)).withColumn(
        "cos", _dot(F.col("v"), F.col("qv")) / (_norm(F.col("v")) * _norm(F.col("qv")))
    )
    return (
        scored.orderBy(F.desc("cos"), F.asc(id_col))
        .limit(k)
        .select(id_col, F.round("cos", 5).alias("cos_sim"))
    )


def cosine_topk_sql(query_vec_id: int = 0, k: int = 10) -> str:
    return f"""WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), q AS (
  SELECT v AS qv FROM e WHERE vec_id = {query_vec_id}
), flat AS (
  SELECT e.vec_id,
         unnest(e.v) AS x,
         unnest(q.qv) AS y
  FROM e CROSS JOIN q
), agg AS (
  SELECT vec_id,
         SUM(x * y) / (SQRT(SUM(x * x)) * SQRT(SUM(y * y))) AS cos
  FROM flat GROUP BY vec_id
)
SELECT vec_id, ROUND(cos, 5) AS cos_sim
FROM agg ORDER BY cos DESC, vec_id ASC LIMIT {k}"""


def knn_self_join(
    embs: DataFrame, max_query_id: int = 20, k: int = 1, id_col: str = "vec_id"
) -> DataFrame:
    """Exact nearest neighbor(s) for each of the first `max_query_id`
    vectors over the whole table (brute force — the recall oracle for
    LSH). (vec_id, neighbor_id, cos_sim)."""
    e = embs.select(id_col, F.col("embedding").cast("array<double>").alias("v"))
    qs = e.filter(F.col(id_col) < max_query_id).select(
        F.col(id_col).alias("qid"), F.col("v").alias("qv")
    )
    pairs = e.crossJoin(F.broadcast(qs)).filter(F.col(id_col) != F.col("qid"))
    scored = pairs.withColumn(
        "cos", _dot(F.col("v"), F.col("qv")) / (_norm(F.col("v")) * _norm(F.col("qv")))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc(id_col))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(
            F.col("qid").alias("vec_id"),
            F.col(id_col).alias("neighbor_id"),
            F.round("cos", 5).alias("cos_sim"),
        )
        .orderBy("vec_id", F.desc("cos_sim"))
    )


def knn_self_join_sql(max_query_id: int = 20, k: int = 1) -> str:
    return f"""WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), qs AS (
  SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < {max_query_id}
), flat AS (
  SELECT e.vec_id, qs.qid, unnest(e.v) AS x, unnest(qs.qv) AS y
  FROM e CROSS JOIN qs WHERE e.vec_id <> qs.qid
), agg AS (
  SELECT qid, vec_id,
         SUM(x * y) / (SQRT(SUM(x * x)) * SQRT(SUM(y * y))) AS cos
  FROM flat GROUP BY qid, vec_id
), ranked AS (
  SELECT qid, vec_id, cos,
         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id ASC) AS rn
  FROM agg
)
SELECT qid AS vec_id, vec_id AS neighbor_id, ROUND(cos, 5) AS cos_sim
FROM ranked WHERE rn <= {k}
ORDER BY vec_id, cos_sim DESC"""


def _hyperplanes(dim: int, n_planes: int = N_PLANES, seed: int = 42) -> np.ndarray:
    """Deterministic ±1 hyperplanes (sign of a seeded hash per cell) —
    no RNG state to persist, identical across runs and cluster sizes."""
    import hashlib

    signs = np.empty((n_planes, dim), dtype=np.float64)
    for p in range(n_planes):
        h = hashlib.md5(f"{seed}:{p}".encode()).digest()
        # expand to dim signs by re-hashing in 16-byte chunks
        buf = b""
        c = 0
        while len(buf) < dim:
            buf += hashlib.md5(h + c.to_bytes(4, "little")).digest()
            c += 1
        bits = np.frombuffer(buf[:dim], dtype=np.uint8)
        signs[p] = np.where(bits & 1, 1.0, -1.0)
    return signs


def lsh_ann_topk(
    embs: DataFrame,
    query_vec_id: int = 0,
    k: int = 10,
    n_planes: int = N_PLANES,
    id_col: str = "vec_id",
    dim: int = 64,
) -> DataFrame:
    """Approximate cosine top-k: random-hyperplane signature buckets →
    rerank only the query's bucket(s). Multi-probe: candidates share
    the full signature OR any 6-bit half — bounds the candidate set
    while keeping recall measurable vs `cosine_topk` (tests assert
    recall ≥ 0.5 at these settings on the fixture).

    The bucket join is a broadcast of the query signature; per-bucket
    candidate counts are ~N/2^planes — this is what replaces the full
    scan at 10^12 rows."""
    planes = _hyperplanes(dim, n_planes)
    plane_lits = F.array(
        *[F.array(*[F.lit(float(x)) for x in row]) for row in planes]
    )
    e = embs.select(id_col, F.col("embedding").cast("array<double>").alias("v"))
    sig = e.withColumn(
        "sig",
        F.concat(
            *[
                F.when(_dot(F.element_at(plane_lits, p + 1), F.col("v")) > 0, "1").otherwise("0")
                for p in range(n_planes)
            ]
        ),
    )
    half = n_planes // 2
    with_probes = sig.select(
        id_col,
        "v",
        "sig",
        F.substring("sig", 1, half).alias("sig_lo"),
        F.substring("sig", half + 1, half).alias("sig_hi"),
    )
    q = with_probes.filter(F.col(id_col) == query_vec_id).select(
        F.col("v").alias("qv"),
        F.col("sig").alias("qsig"),
        F.col("sig_lo").alias("qlo"),
        F.col("sig_hi").alias("qhi"),
    )
    cands = with_probes.crossJoin(F.broadcast(q)).filter(
        (F.col("sig") == F.col("qsig"))
        | (F.col("sig_lo") == F.col("qlo"))
        | (F.col("sig_hi") == F.col("qhi"))
    )
    scored = cands.withColumn(
        "cos", _dot(F.col("v"), F.col("qv")) / (_norm(F.col("v")) * _norm(F.col("qv")))
    )
    return (
        scored.orderBy(F.desc("cos"), F.asc(id_col))
        .limit(k)
        .select(id_col, F.round("cos", 5).alias("cos_sim"))
    )


def embedding_near_dup(
    embs: DataFrame, threshold: float = 0.99, id_col: str = "vec_id"
) -> DataFrame:
    """Embedding-cosine near-dup pairs (cos ≥ threshold) via LSH
    buckets + verify — the embedding leg of the dedup suite."""
    planes = _hyperplanes(64, N_PLANES)
    plane_lits = F.array(*[F.array(*[F.lit(float(x)) for x in row]) for row in planes])
    e = embs.select(id_col, F.col("embedding").cast("array<double>").alias("v"))
    sig = e.withColumn(
        "sig",
        F.concat(
            *[
                F.when(_dot(F.element_at(plane_lits, p + 1), F.col("v")) > 0, "1").otherwise("0")
                for p in range(N_PLANES)
            ]
        ),
    )
    a = sig.select(F.col(id_col).alias("id_a"), F.col("v").alias("va"), "sig")
    b = sig.select(F.col(id_col).alias("id_b"), F.col("v").alias("vb"), "sig")
    cands = a.join(b, "sig").filter(F.col("id_a") < F.col("id_b"))
    scored = cands.withColumn(
        "cos", _dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb")))
    )
    return (
        scored.filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", F.round("cos", 5).alias("cos_sim"))
        .orderBy("id_a", "id_b")
    )


def driver_queries():
    return {
        "ann_cosine_topk": lambda s, d: cosine_topk(_emb(s, d), 0, 10),
        "knn_self_join": lambda s, d: knn_self_join(_emb(s, d), 20, 1),
        "ann_lsh_topk": lambda s, d: lsh_ann_topk(_emb(s, d), 0, 10),  # rows-only
    }


def driver_oracles():
    return {
        "ann_cosine_topk": cosine_topk_sql(0, 10),
        "knn_self_join": knn_self_join_sql(20, 1),
        # ann_lsh_topk: approximate by design — no SQL oracle; recall
        # vs cosine_topk asserted in tests/test_similarity.py
    }


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")
