"""M4 — top-k BM25 over the segment store with block-max pruning.

Query lifecycle (Spark expression of SURVEY.md §3.1):

  1. term lookup in term_dict (replaces driver-side re-hashing; also
     yields exact df — Posdb::getTermFreq is approximate, ours exact)
  2. partition-pruned segment scan: ``bucket IN (...) AND term_id IN
     (...)`` — Catalyst prunes to the query's term buckets
     (the RdbMap ranged seek, SURVEY.md §2.1 S3) and parquet row-group
     stats skip non-matching term_ids inside a bucket
  3. per-salt kernel (applyInPandas over disjoint doc_id ranges — the
     per-shard Msg39 computation): decode + prune + score + local
     top-k via numpy
  4. driver merge: ``ORDER BY score DESC, doc_id ASC LIMIT k`` over
     ≤ n_salts × k rows (Msg3a::mergeLists, §2.6 O4)

Pruning inside the kernel is the MaxScore/block-max family
(Posdb.cpp getMaxPossibleScore is the reference precedent, §4):

  * AND mode: rarest-term-driven intersection; for every other term
    only blocks whose [doc_id_min, doc_id_max] can contain a candidate
    are decoded (vectorized block skipping via the metadata columns).
  * OR mode (MaxScore): U_t = max block_max per term; θ0 = kth best
    single-term score of the highest-impact term; terms whose
    cumulative U (ascending) stays below θ0 are non-essential — docs
    appearing ONLY in those lists cannot reach the top-k, so candidate
    generation unions essential lists only, and non-essential terms
    decode just the blocks overlapping surviving candidates.

Scoring sums per-posting float64 contributions in ascending term_id
order (FIXTURES.md §3 determinism pin). v2 blocks are stat-free: the
contributions are computed IN the kernel from (tf, dl) + the live
(df, N, avgdl) — exact between compactions (segments.bm25_rescore).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from open_source_search_engine_spark.index.builder import load_meta
from open_source_search_engine_spark.index.segments import block_bound, decode_blocks

KERNEL_SCHEMA = "doc_id long, score double, n_terms int"

# every column the salt kernel reads — scans select exactly these so
# parquet column pruning drops pos_blob (positions are for the
# phrase/proximity path, index/lists.py, never for top-k scoring)
KERNEL_INPUT_COLS = (
    "salt", "term_id", "generation", "n_docs", "doc_id_min",
    "doc_id_max", "block_max_tf", "block_min_dl", "docs_blob",
    "tfs_blob", "dls_blob",
)


def idf_map(trows: list[dict], n_docs: float) -> dict[int, float]:
    """term_id → BM25 idf under the LIVE stats — driver-side scalar
    math over the query's term rows (metadata-scale). Same expression
    tree as operators.bm25.idf_col."""
    import math

    return {
        int(r["term_id"]): math.log(
            (n_docs - float(r["df"]) + 0.5) / (float(r["df"]) + 0.5) + 1.0
        )
        for r in trows
    }


def scoring_ctx(meta: dict, trows: list[dict]):
    """(idf_by_tid, avgdl, k1, b) — everything a decode kernel needs to
    compute exact BM25 contributions from the stat-free v2 blocks."""
    cfg = meta["config"]
    return (
        idf_map(trows, float(meta["n_docs"])),
        float(meta["avgdl"]),
        float(cfg["k1"]),
        float(cfg["b"]),
    )


def query_term_rows(
    spark: SparkSession, index_dir: str | Path, terms: list[str]
) -> list[dict]:
    """(term, term_id, df) for the query's terms.

    Driver-side pyarrow read — no Spark job. The dictionary lookup is
    metadata-scale work (the reference keeps termId→listSize in the
    in-memory RdbMap, Posdb::getTermFreq); launching a distributed job
    for it costs more than the read. term_dict files are term-sorted,
    so the isin filter prunes on parquet row-group min/max stats.
    pyarrow.dataset reads local paths here and s3/hdfs URIs on a real
    deployment alike."""
    import pyarrow.dataset as ds

    d = ds.dataset(str(Path(index_dir) / "term_dict"), format="parquet")
    tbl = d.to_table(
        filter=ds.field("term").isin(list(set(terms))),
        columns=["term", "term_id", "df"],
    )
    return tbl.to_pylist()


# tombstone tables up to this on-disk size load driver-side into the
# kernel closure (one pyarrow read, zero extra shuffle — the common
# trickle-delete case, and merges prune the table besides); above it
# wand_topk switches to a cogrouped join so a mass delete (retention
# sweep via the delete_documents DataFrame overload) never funnels
# through the driver. Mirrors merge.TOMBSTONE_BROADCAST_MAX_BYTES.
TOMBSTONE_DRIVER_MAX_BYTES = 64 * 1024 * 1024


def _tombstones_on_disk_bytes(index_dir: str | Path) -> int:
    tdir = Path(index_dir) / "tombstones"
    if not tdir.exists():
        return 0
    return sum(p.stat().st_size for p in tdir.glob("*.parquet"))


def _arrays_from_pdf(pdf: pd.DataFrame) -> tuple[np.ndarray, np.ndarray] | None:
    if len(pdf) == 0:
        return None
    # one row per doc: the max before_generation wins
    pdf = pdf.groupby("doc_id", as_index=False)["before_generation"].max()
    pdf = pdf.sort_values("doc_id")
    return (
        pdf["doc_id"].to_numpy(np.int64),
        pdf["before_generation"].to_numpy(np.int64),
    )


def _load_tombstones(
    spark: SparkSession, index_dir: str | Path
) -> tuple[np.ndarray, np.ndarray] | None:
    """Driver-side (doc_id, bar) arrays for in-kernel annihilation.
    Right for the small/common case only — every read path (wand_topk,
    the positional/boolean kernels in index/lists.py, the warm
    QueryEngine) switches to cogrouped shipping above
    TOMBSTONE_DRIVER_MAX_BYTES via tombstones_plan()."""
    tdir = Path(index_dir) / "tombstones"
    if not tdir.exists():
        return None
    import pyarrow.dataset as ds

    pdf = ds.dataset(str(tdir), format="parquet").to_table().to_pandas()
    return _arrays_from_pdf(pdf)


def tombstones_plan(
    spark: SparkSession, index_dir: str | Path
) -> tuple[tuple[np.ndarray, np.ndarray] | None, DataFrame | None]:
    """(driver_arrays, ts_df) — the size-switched tombstone access plan
    every read path shares (VERDICT r04 item 1: the positional/boolean
    paths previously loaded the FULL table driver-side).

    At most one element is non-None: below TOMBSTONE_DRIVER_MAX_BYTES
    (trickle deletes — the common case; merges prune the table besides)
    the (doc_id, before_generation) arrays load driver-side, one
    pyarrow read, zero extra shuffle. Above it (a mass delete, e.g. a
    retention sweep through the delete_documents DataFrame overload)
    the caller gets an aggregated DataFrame instead and must ship it to
    its kernels via a cogrouped shuffle — the Msg5 shape: negative keys
    merged shard-side, never through a coordinator (SURVEY.md §1.1)."""
    if _tombstones_on_disk_bytes(index_dir) <= TOMBSTONE_DRIVER_MAX_BYTES:
        return _load_tombstones(spark, index_dir), None
    ts = (
        spark.read.parquet(str(Path(index_dir) / "tombstones"))
        .groupBy("doc_id")
        .agg(F.max("before_generation").alias("before_generation"))
    )
    return None, ts


def _blocks_overlapping(
    rows: pd.DataFrame, cand: np.ndarray
) -> np.ndarray:
    """Mask of block rows whose [doc_id_min, doc_id_max] contains at
    least one candidate doc_id (cand sorted asc). Vectorized."""
    lo = rows["doc_id_min"].to_numpy(np.int64)
    hi = rows["doc_id_max"].to_numpy(np.int64)
    left = np.searchsorted(cand, lo, side="left")
    right = np.searchsorted(cand, hi, side="right")
    return right > left


def _score_candidates(
    cand: np.ndarray,
    term_lists: list[tuple[int, np.ndarray, np.ndarray]],
) -> tuple[np.ndarray, np.ndarray]:
    """Sum per-term contributions for candidate docs in ascending
    term_id order (float64 determinism). Returns (scores, n_terms_hit).
    term_lists: [(term_id, doc_ids sorted, scores)]."""
    total = np.zeros(cand.size, dtype=np.float64)
    hits = np.zeros(cand.size, dtype=np.int32)
    for _tid, docs, scores in sorted(term_lists, key=lambda t: t[0]):
        if docs.size == 0:
            continue
        pos = np.searchsorted(docs, cand)
        pos_c = np.minimum(pos, docs.size - 1)
        m = docs[pos_c] == cand
        total[m] += scores[pos_c[m]]
        hits[m] += 1
    return total, hits


def make_salt_kernel(
    term_ids: list[int],
    k: int,
    mode: str,
    tombstones: tuple[np.ndarray, np.ndarray] | None,
    scoring,
):
    """Kernel run once per salt (disjoint doc_id range). Input: block
    rows of the query's terms only. Output: local top-k candidates.

    ``scoring`` = (idf_by_tid, avgdl, k1, b) from scoring_ctx: v2
    blocks are stat-free, so per-posting scores AND the MaxScore block
    bounds are computed here under the live stats (exact even between
    compactions — VERDICT r04 item 2)."""
    tids = sorted(set(term_ids))
    n_q = len(tids)
    idf_by, avgdl, k1, b = scoring

    def _rs(t):
        return (idf_by[int(t)], avgdl, k1, b)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        per_term = {t: g for t, g in pdf.groupby("term_id")}
        # empty group (cogrouped tombstone shipping can surface a salt
        # with tombstones but no postings) or unsatisfiable AND
        if len(per_term) == 0 or (mode == "and" and len(per_term) < n_q):
            return pd.DataFrame({"doc_id": [], "score": [], "n_terms": []}).astype(
                {"doc_id": "int64", "score": "float64", "n_terms": "int32"}
            )

        if mode == "and":
            # rarest term drives (shortest-list-first, §4): decode the
            # term with fewest postings fully, then intersect onward,
            # decoding only overlapping blocks of later terms.
            order = sorted(per_term, key=lambda t: int(per_term[t]["n_docs"].sum()))
            cand, _tf, _sc = decode_blocks(per_term[order[0]], tombstones=tombstones)
            # (intersection decodes skip the dls/rescore work — only the
            # final scoring pass below computes contributions)
            for t in order[1:]:
                if cand.size == 0:
                    break
                rows = per_term[t]
                mask = _blocks_overlapping(rows, cand)
                docs, _tfs, _s = decode_blocks(rows, mask, tombstones=tombstones)
                pos = np.searchsorted(docs, cand) if docs.size else None
                if docs.size == 0:
                    cand = cand[:0]
                    break
                pos_c = np.minimum(pos, docs.size - 1)
                cand = cand[docs[pos_c] == cand]
            if cand.size == 0:
                return pd.DataFrame(
                    {"doc_id": [], "score": [], "n_terms": []}
                ).astype({"doc_id": "int64", "score": "float64", "n_terms": "int32"})
            lists = []
            for t, rows in per_term.items():
                mask = _blocks_overlapping(rows, cand)
                docs, _tfs, scores = decode_blocks(
                    rows, mask, tombstones=tombstones, rescore=_rs(t)
                )
                lists.append((int(t), docs, scores))
            total, hits = _score_candidates(cand, lists)
            keep = hits == n_q
            cand, total, hits = cand[keep], total[keep], hits[keep]
        else:
            # MaxScore (block-max family). U_t from block metadata only
            # — v2: bounds computed from (block_max_tf, block_min_dl)
            # under the live stats (segments.block_bound; score monotone
            # in each, so this is a valid upper bound).
            U = {
                t: float(
                    block_bound(
                        g["block_max_tf"].to_numpy(np.float64),
                        g["block_min_dl"].to_numpy(np.float64),
                        idf_by[int(t)], avgdl, k1, b,
                    ).max()
                )
                for t, g in per_term.items()
            }
            drive = max(U, key=U.get)
            d_docs, _dt, d_scores = decode_blocks(
                per_term[drive], tombstones=tombstones, rescore=_rs(drive)
            )
            if d_scores.size >= k:
                theta0 = float(np.partition(d_scores, -k)[-k])
            else:
                theta0 = 0.0
            asc = sorted(U, key=U.get)
            cum, non_essential = 0.0, set()
            for t in asc:
                if cum + U[t] < theta0:
                    cum += U[t]
                    non_essential.add(t)
                else:
                    break
            decoded: dict[int, tuple[np.ndarray, np.ndarray]] = {
                int(drive): (d_docs, d_scores)
            }
            cand_parts = [d_docs]
            for t, rows in per_term.items():
                if t == drive or t in non_essential:
                    continue
                docs, _tfs, scores = decode_blocks(
                    rows, tombstones=tombstones, rescore=_rs(t)
                )
                decoded[int(t)] = (docs, scores)
                cand_parts.append(docs)
            cand = np.unique(np.concatenate(cand_parts)) if cand_parts else np.empty(0, np.int64)
            lists = [(t, d, s) for t, (d, s) in decoded.items()]
            for t in non_essential:
                rows = per_term[t]
                mask = _blocks_overlapping(rows, cand)
                docs, _tfs, scores = decode_blocks(
                    rows, mask, tombstones=tombstones, rescore=_rs(t)
                )
                lists.append((int(t), docs, scores))
            total, hits = _score_candidates(cand, lists)

        if cand.size > k:
            # local top-k with (score desc, doc_id asc) tie-break
            idx = np.lexsort((cand, -total))[:k]
        else:
            idx = np.lexsort((cand, -total))
        return pd.DataFrame(
            {
                "doc_id": cand[idx],
                "score": total[idx],
                "n_terms": hits[idx].astype(np.int32),
            }
        )

    return kernel


def wand_topk(
    spark: SparkSession,
    index_dir: str | Path,
    terms: list[str],
    k: int = 10,
    mode: str = "and",
    round_dp: int | None = 5,
) -> DataFrame:
    """Top-k (doc_id, score) — must be rank-identical to
    bm25.bm25_topk_oracle on the same corpus (§5.2 pinned oracle)."""
    meta = load_meta(index_dir)
    n_buckets = meta["config"]["n_buckets"]
    trows = query_term_rows(spark, index_dir, terms)
    found = {r["term"] for r in trows}
    missing_any = len(found) < len(set(terms))
    if not trows or (mode == "and" and missing_any):
        # a required term with no posting list ⇒ empty AND result
        # (Query.cpp default-AND semantics, SURVEY.md §2.2 F2)
        return spark.createDataFrame([], "doc_id long, score double")
    tids = sorted({int(r["term_id"]) for r in trows})
    buckets = sorted({t % n_buckets for t in tids})

    seg = spark.read.parquet(str(Path(index_dir) / "segments"))
    # generation filter = snapshot isolation on the partition column:
    # readers only see generations meta.json (the atomic commit
    # pointer) references, so a concurrent merge/compact's staged or
    # half-deleted generation dirs are invisible (ADVICE r04)
    seg = seg.filter(
        F.col("generation").isin([int(g) for g in meta["generations"]])
        & F.col("bucket").isin(buckets)
        & F.col("term_id").isin(tids)
    )
    # explicit projection: top-k scoring never touches pos_blob — the
    # parquet scan prunes the (largest) column entirely
    seg = seg.select(*KERNEL_INPUT_COLS)

    scoring = scoring_ctx(meta, trows)
    tombstones_arrays, ts_df = tombstones_plan(spark, index_dir)
    if ts_df is None:
        kernel = make_salt_kernel(tids, k, mode, tombstones_arrays, scoring)
        local = seg.groupBy("salt").applyInPandas(kernel, KERNEL_SCHEMA)
    else:
        # mass-delete path: ship tombstones to the kernels through a
        # cogrouped shuffle instead of the driver. Every salt group
        # needs the FULL per-doc set — a doc's salt can DRIFT across
        # generations (salts are doc-ranges over max_doc_id, which
        # grows with adds), and global tombstones are exactly what
        # makes that drift safe (a replaced doc's old-salt postings
        # are annihilated wherever they sit) — so replicate rows to
        # every salt (n_salts× shuffle volume, no driver round-trip).
        # Per-task memory is still O(|tombstones|): past that point
        # the answer is merge/compact, which prunes the table.
        n_salts = meta["config"]["n_salts"]
        ts = ts_df.crossJoin(
            spark.range(n_salts).select(F.col("id").cast("int").alias("salt"))
        )
        base_kernel = make_salt_kernel(tids, k, mode, None, scoring)

        def cokernel(seg_pdf: pd.DataFrame, ts_pdf: pd.DataFrame) -> pd.DataFrame:
            if len(seg_pdf) == 0:
                return pd.DataFrame(
                    {"doc_id": [], "score": [], "n_terms": []}
                ).astype({"doc_id": "int64", "score": "float64", "n_terms": "int32"})
            arrays = _arrays_from_pdf(ts_pdf[["doc_id", "before_generation"]])
            if arrays is None:
                return base_kernel(seg_pdf)
            return make_salt_kernel(tids, k, mode, arrays, scoring)(seg_pdf)

        local = (
            seg.groupBy("salt")
            .cogroup(ts.groupBy("salt"))
            .applyInPandas(cokernel, KERNEL_SCHEMA)
        )
    if mode == "and":
        local = local.filter(F.col("n_terms") == len(tids))
    out = local.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
    score = F.round(F.col("score"), round_dp) if round_dp is not None else F.col("score")
    return out.select("doc_id", score.alias("score"))


BATCH_KERNEL_SCHEMA = "query_id string, doc_id long, score double, n_terms int"


def make_batch_salt_kernel(
    resolved: list[tuple[str, list[int], str]],
    k: int,
    tombstones: tuple[np.ndarray, np.ndarray] | None,
    scoring,
):
    """Per-salt kernel serving MANY queries from one block partition.

    ``resolved`` = [(query_id, tids sorted, mode)]. Each query runs the
    EXACT single-query kernel (make_salt_kernel) over the sub-frame of
    its own term_ids — rank-identity with wand_topk is by construction,
    per query (pinned in tests). Shared terms decode once per query
    that uses them (bounded duplicate work; the scan and the shuffle —
    the scale costs — are already shared)."""
    kernels = [
        (qid, tids, mode, make_salt_kernel(tids, k, mode, tombstones, scoring))
        for qid, tids, mode in resolved
    ]

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        groups = {int(t): g for t, g in pdf.groupby("term_id")}
        outs = []
        for qid, tids, mode, kern in kernels:
            subs = [groups[t] for t in tids if t in groups]
            sub_pdf = pd.concat(subs) if subs else pdf.iloc[0:0]
            o = kern(sub_pdf)
            if mode == "and":
                o = o[o["n_terms"] == len(tids)]
            o = o.copy()
            o.insert(0, "query_id", qid)
            outs.append(o)
        return pd.concat(outs, ignore_index=True)

    return kernel


def resolve_batch_queries(
    queries: dict[str, tuple[list[str], str]], tid_of: dict[str, int]
) -> list[tuple[str, list[int], str]]:
    """[(query_id, tids sorted, mode)] with per-query empty-result
    semantics applied: a required term with no posting list (AND) or a
    query with no known terms contributes nothing — identical to
    wand_topk's default-AND handling, per query."""
    resolved: list[tuple[str, list[int], str]] = []
    for qid, (terms, mode) in sorted(queries.items()):
        found = [t for t in set(terms) if t in tid_of]
        if not found or (mode == "and" and len(found) < len(set(terms))):
            continue
        resolved.append((qid, sorted({tid_of[t] for t in found}), mode))
    return resolved


def merge_batch_topk(local: DataFrame, k: int, round_dp: int | None) -> DataFrame:
    """Per-query driver-side merge: window rank over the per-salt
    candidates (≤ n_salts × k rows per query)."""
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    out = (
        local.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn", "n_terms")
    )
    score = F.round(F.col("score"), round_dp) if round_dp is not None else F.col("score")
    return out.select("query_id", "doc_id", score.alias("score"))


def wand_topk_batch(
    spark: SparkSession,
    index_dir: str | Path,
    queries: dict[str, tuple[list[str], str]],
    k: int = 10,
    round_dp: int | None = 5,
) -> DataFrame:
    """Top-k for MANY queries in ONE job: (query_id, doc_id, score).

    The concurrent-load shape (Msg39 serving many queries per shard,
    SURVEY.md §2.6): a per-query Spark job pays scheduling + scan setup
    per query — fine for one user, wrong for a query stream. This
    batches N queries into one partition-pruned scan over the UNION of
    their term buckets (Catalyst prunes exactly as for one query — the
    isin sets are just wider), one per-salt kernel pass that runs each
    query's unchanged single-query kernel over its own term groups, and
    one per-query driver-side merge (window rank over
    ≤ n_salts × k × |Q| rows). Per-query results are rank-identical to
    wand_topk (tested, both tombstone paths); amortization is the
    whole point — job count is O(1) in |Q|.

    ``queries`` = {query_id: (terms, mode)}. Queries whose required
    term is missing (AND) or with no known terms contribute no rows —
    the same empty-result semantics as wand_topk per query."""
    meta = load_meta(index_dir)
    n_buckets = meta["config"]["n_buckets"]
    all_terms = sorted({t for terms, _m in queries.values() for t in terms})
    trows = query_term_rows(spark, index_dir, all_terms)
    tid_of = {r["term"]: int(r["term_id"]) for r in trows}

    resolved = resolve_batch_queries(queries, tid_of)
    if not resolved:
        return spark.createDataFrame([], "query_id string, doc_id long, score double")

    tids = sorted({t for _q, ts, _m in resolved for t in ts})
    buckets = sorted({t % n_buckets for t in tids})

    seg = spark.read.parquet(str(Path(index_dir) / "segments"))
    seg = seg.filter(
        F.col("generation").isin([int(g) for g in meta["generations"]])
        & F.col("bucket").isin(buckets)
        & F.col("term_id").isin(tids)
    ).select(*KERNEL_INPUT_COLS)

    scoring = scoring_ctx(meta, trows)
    tombstones_arrays, ts_df = tombstones_plan(spark, index_dir)
    if ts_df is None:
        kernel = make_batch_salt_kernel(resolved, k, tombstones_arrays, scoring)
        local = seg.groupBy("salt").applyInPandas(kernel, BATCH_KERNEL_SCHEMA)
    else:
        # mass-delete path: identical cogrouped shipping to wand_topk
        # (see the rationale there — global tombstones replicated per
        # salt keep cross-generation salt drift safe)
        n_salts = meta["config"]["n_salts"]
        ts = ts_df.crossJoin(
            spark.range(n_salts).select(F.col("id").cast("int").alias("salt"))
        )
        base_kernel = make_batch_salt_kernel(resolved, k, None, scoring)

        def cokernel(seg_pdf: pd.DataFrame, ts_pdf: pd.DataFrame) -> pd.DataFrame:
            if len(seg_pdf) == 0:
                return pd.DataFrame(
                    {"query_id": [], "doc_id": [], "score": [], "n_terms": []}
                ).astype(
                    {
                        "query_id": "object",
                        "doc_id": "int64",
                        "score": "float64",
                        "n_terms": "int32",
                    }
                )
            arrays = _arrays_from_pdf(ts_pdf[["doc_id", "before_generation"]])
            if arrays is None:
                return base_kernel(seg_pdf)
            return make_batch_salt_kernel(resolved, k, arrays, scoring)(seg_pdf)

        local = (
            seg.groupBy("salt")
            .cogroup(ts.groupBy("salt"))
            .applyInPandas(cokernel, BATCH_KERNEL_SCHEMA)
        )
    return merge_batch_topk(local, k, round_dp)
