"""QueryEngine — a warm handle over one index for repeated queries.

The reference keeps termlist metadata and hot lists in RdbCache
(RdbCache.cpp, SURVEY.md §4 'list caching'); the Spark analog is a
persisted term_dict DataFrame plus reused segments/doc_meta DataFrames
(file listing + schema inference done once, not per query). The
module-level functions (wand.wand_topk, operators.indexed.*) re-read
those from disk on every call — fine for one-shot jobs, wasted latency
for query loops; this wrapper is the query-loop path the bench
measures, and it fronts the WHOLE indexed operator surface: top-k,
boolean/facets/sort/pagination, phrase, the query language and nested
boolean expressions.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from open_source_search_engine_spark.index import wand as W
from open_source_search_engine_spark.index.builder import load_meta


class QueryEngine:
    """``auto_refresh=True`` (default) re-checks the store's commit
    markers (meta.json mtime + tombstone dir state — two stats) at
    each query entry point and reloads the warm state when a writer
    committed since the last load: the RdbCache-invalidation analog
    (the reference drops cache entries when an Rdb's file set
    changes). Pass False to never reload mid-loop (caller owns
    refresh() timing); note a False handle is not a strict snapshot —
    a same-session writer's refreshByPath still re-caches the
    persisted term_dict lazily from the new files."""

    def __init__(
        self,
        spark: SparkSession,
        index_dir: str | Path,
        auto_refresh: bool = True,
    ):
        self.spark = spark
        self.index_dir = Path(index_dir)
        self.auto_refresh = auto_refresh
        self._load()

    def _commit_stamp(self) -> tuple:
        """Cheap writer-commit fingerprint. meta.json is rewritten by
        build/add/merge/compact; delete_documents only touches the
        tombstones dir, so fold in its file set too."""
        meta_m = (self.index_dir / "meta.json").stat().st_mtime_ns
        tdir = self.index_dir / "tombstones"
        ts_state = (
            tuple(sorted(p.name for p in tdir.glob("*.parquet")))
            if tdir.exists()
            else ()
        )
        return (meta_m, ts_state)

    def _maybe_refresh(self) -> None:
        if self.auto_refresh and self._commit_stamp() != self._stamp:
            self.refresh()

    def _load(self) -> None:
        self._stamp = self._commit_stamp()
        self.meta = load_meta(self.index_dir)
        self.n_buckets = self.meta["config"]["n_buckets"]
        # vocabulary-sized; hot for every query → persist once
        self.term_dict = (
            self.spark.read.parquet(str(self.index_dir / "term_dict"))
            .select("term", "term_id", "df")
            .persist()
        )
        self.term_dict.count()
        self.segments = self.spark.read.parquet(str(self.index_dir / "segments"))
        from open_source_search_engine_spark.index.lists import live_doc_meta

        self._doc_meta = live_doc_meta(self.spark, self.index_dir, self.meta)
        # size-switched (ADVICE r04 medium): after a mass delete the
        # warm engine keeps a DataFrame plan instead of materializing a
        # corpus-scale tombstone table on the driver; every query entry
        # point then ships it to the kernels via a cogrouped shuffle
        self._ts_arrays, self._ts_df = W.tombstones_plan(
            self.spark, self.index_dir
        )

    def refresh(self) -> None:
        """Pick up new generations/tombstones (after add/delete)."""
        self.term_dict.unpersist()
        self.segments = None
        self._load()

    # ---- warm index-handle surface (duck-typed twin of
    # index.lists.ColdIndex): every operator in index/lists.py,
    # operators/indexed.py, plans/query_language.execute_indexed and
    # plans/boolean_expr.evaluate_indexed accepts `self` wherever it
    # accepts an index path, reusing the persisted term_dict, the
    # cached segment/doc_meta listings and the preloaded tombstones ----

    def term_rows(self, terms: list[str]) -> list[dict]:
        return [
            r.asDict()
            for r in self.term_dict.filter(
                F.col("term").isin(list(set(terms)))
            ).collect()
        ]

    def pruned_segments(self, tids: list[int], with_positions: bool = False) -> DataFrame:
        if with_positions:
            from open_source_search_engine_spark.index.lists import require_positions

            require_positions(self.meta)
        buckets = sorted({t % self.n_buckets for t in tids})
        cols = list(W.KERNEL_INPUT_COLS) + ["bucket"]
        if with_positions:
            cols.append("pos_blob")
        return self.segments.filter(
            F.col("generation").isin([int(g) for g in self.meta["generations"]])
            & F.col("bucket").isin(buckets)
            & F.col("term_id").isin(tids)
        ).select(*cols)

    def tombstones_plan(self):
        return self._ts_arrays, self._ts_df

    def doc_meta_df(self) -> DataFrame:
        return self._doc_meta

    def topk(
        self, terms: list[str], k: int = 10, mode: str = "and",
        round_dp: int | None = 5,
    ) -> DataFrame:
        self._maybe_refresh()
        trows = [
            r.asDict()
            for r in self.term_dict.filter(
                F.col("term").isin(list(set(terms)))
            ).collect()
        ]
        found = {r["term"] for r in trows}
        if not trows or (mode == "and" and len(found) < len(set(terms))):
            return self.spark.createDataFrame([], "doc_id long, score double")
        tids = sorted({int(r["term_id"]) for r in trows})
        buckets = sorted({t % self.n_buckets for t in tids})
        seg = self.segments.filter(
            F.col("generation").isin([int(g) for g in self.meta["generations"]])
            & F.col("bucket").isin(buckets)
            & F.col("term_id").isin(tids)
        ).select(*W.KERNEL_INPUT_COLS)
        from open_source_search_engine_spark.index.lists import (
            apply_tombstone_aware,
        )

        scoring = W.scoring_ctx(self.meta, trows)
        local = apply_tombstone_aware(
            self.spark, self, seg, ("salt",),
            lambda arrays: W.make_salt_kernel(tids, k, mode, arrays, scoring),
            W.KERNEL_SCHEMA,
        )
        if mode == "and":
            local = local.filter(F.col("n_terms") == len(tids))
        out = local.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
        score = (
            F.round(F.col("score"), round_dp) if round_dp is not None else F.col("score")
        )
        return out.select("doc_id", score.alias("score"))

    def topk_batch(
        self,
        queries: dict[str, tuple[list[str], str]],
        k: int = 10,
        round_dp: int | None = 5,
    ) -> DataFrame:
        """Warm-path wand_topk_batch: N queries in ONE job over the
        engine's persisted listings — (query_id, doc_id, score),
        rank-identical per query to topk() (the concurrent-load shape;
        see wand.wand_topk_batch). Tombstones ride the same
        size-switched plan as every warm read."""
        self._maybe_refresh()
        all_terms = sorted({t for terms, _m in queries.values() for t in terms})
        trows = [
            r.asDict()
            for r in self.term_dict.filter(F.col("term").isin(all_terms)).collect()
        ]
        tid_of = {r["term"]: int(r["term_id"]) for r in trows}
        resolved = W.resolve_batch_queries(queries, tid_of)
        if not resolved:
            return self.spark.createDataFrame(
                [], "query_id string, doc_id long, score double"
            )
        tids = sorted({t for _q, ts, _m in resolved for t in ts})
        buckets = sorted({t % self.n_buckets for t in tids})
        seg = self.segments.filter(
            F.col("generation").isin([int(g) for g in self.meta["generations"]])
            & F.col("bucket").isin(buckets)
            & F.col("term_id").isin(tids)
        ).select(*W.KERNEL_INPUT_COLS)
        from open_source_search_engine_spark.index.lists import (
            apply_tombstone_aware,
        )

        scoring = W.scoring_ctx(self.meta, trows)
        local = apply_tombstone_aware(
            self.spark, self, seg, ("salt",),
            lambda arrays: W.make_batch_salt_kernel(resolved, k, arrays, scoring),
            W.BATCH_KERNEL_SCHEMA,
        )
        return W.merge_batch_topk(local, k, round_dp)

    # ---- ergonomic delegates over the shared indexed operators ----

    def facets(self, terms: list[str], facet_col: str = "lang") -> DataFrame:
        from open_source_search_engine_spark.operators import indexed

        self._maybe_refresh()
        return indexed.facet_counts(self.spark, self, terms, facet_col)

    def phrase(self, words: list[str]) -> DataFrame:
        from open_source_search_engine_spark.index import lists

        self._maybe_refresh()
        return lists.phrase_docs(self.spark, self, words)

    def query(self, q: str, k: int = 10) -> DataFrame:
        """Full query-language front end, warm (Query.cpp set2)."""
        from open_source_search_engine_spark.plans import query_language

        self._maybe_refresh()
        return query_language.execute_indexed(self.spark, self, q, k=k)

    def boolean(self, expr: str) -> DataFrame:
        from open_source_search_engine_spark.plans import boolean_expr

        self._maybe_refresh()
        return boolean_expr.evaluate_indexed(self.spark, self, expr)

    def close(self) -> None:
        self.term_dict.unpersist()
