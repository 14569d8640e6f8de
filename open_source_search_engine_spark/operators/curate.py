"""Corpus curation: compose the pipeline operators into one
training-split decision per document.

A 100 TB training-data run doesn't call quality / dedup / decontam
as separate audits — it wants ONE labelled pass: which docs survive,
and why each dropped doc dropped. ``curate_corpus`` composes the
already-tested primitives (textstats.text_quality, dedup.dedup_exact,
dedup.dedup_clusters, textstats.decontaminate) into that decision
table. The reference has no corpus-curation surface (it filters at
query time — Msg40 dedup/family filter, SURVEY.md §2.2 F6/F7); this
is the build-time analog an LLM pipeline needs.

Plan shape: every component is one shuffle keyed by doc_id (quality
agg, exact-dup keeper agg, broadcast decontam probe) except near-dup
clustering (O(diameter) rounds over the pair graph only, see
dedup.dedup_clusters). The final assembly is doc_id-keyed left joins
— co-partitioned after the first shuffle, no extra wide nodes. Drop
reasons resolve in a fixed priority so a doc gets ONE deterministic
verdict: too_short > low_quality > benchmark > duplicate >
contaminated (benchmark outranks duplicate because bench docs are
excluded from keeper eligibility — see the dedup note below — so a
bench doc in a dup group must still surface as ``benchmark``, not as
a duplicate of a keeper it can no longer be).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from open_source_search_engine_spark.operators import dedup as _dedup
from open_source_search_engine_spark.operators import textstats as _ts


def curate_corpus(
    docs: DataFrame,
    *,
    min_tokens: int = 5,
    max_stopword_ratio: float | None = None,
    min_distinct_ratio: float | None = None,
    dedup: str = "exact",
    jaccard_threshold: float = 0.5,
    max_shingle_df: int | None = None,
    decontam_threshold: float | None = None,
    bench_docs: DataFrame | None = None,
    cc_max_iter: int = 30,
    cc_checkpoint_dir: str | None = None,
) -> DataFrame:
    """(doc_id, keep, drop_reason) for every input doc.

    * ``min_tokens`` / ``max_stopword_ratio`` / ``min_distinct_ratio``
      — Gopher-style scalar quality gates over text_quality features.
    * ``dedup`` — ``"exact"`` keeps the min-doc_id copy per identical
      text; ``"cluster"`` additionally collapses near-dup CHAINS via
      dedup_clusters (transitive closure, min-doc_id keeper);
      ``"none"`` skips. Keepers are picked among QUALITY-PASSING docs
      so a gate-failing keeper never drops its whole cluster.
    * ``decontam_threshold`` — when set, drops docs whose shingle
      overlap with ``bench_docs`` (or the synthetic eval slice)
      reaches the threshold; the bench slice itself is dropped too
      (reason ``benchmark``) so eval rows never reach training.
      Bench docs are ALSO excluded from dedup keeper eligibility: a
      bench doc always drops, so letting it win a near-dup cluster's
      min-doc_id keeper slot would drop every training copy of that
      content — the same keeper-loss failure the quality-gate
      restriction prevents.
    * ``cc_max_iter`` / ``cc_checkpoint_dir`` — forwarded to
      dedup_clusters' connected-components rounds (high-diameter
      chains need more rounds; a checkpoint dir makes rounds durable
      at 100 TB).
    """
    if dedup not in ("exact", "cluster", "none"):
        raise ValueError(f"dedup must be exact|cluster|none, got {dedup!r}")

    q = _ts.text_quality(docs).select(
        "doc_id", "n_tokens", "distinct_ratio", "stopword_ratio"
    )
    out = docs.select("doc_id").join(q, "doc_id", "left")

    # quality gates (docs with NO tokens have no quality row → too_short)
    too_short = F.col("n_tokens").isNull() | (F.col("n_tokens") < min_tokens)
    low_quality = F.lit(False)
    if max_stopword_ratio is not None:
        low_quality = low_quality | (F.col("stopword_ratio") > max_stopword_ratio)
    if min_distinct_ratio is not None:
        low_quality = low_quality | (F.col("distinct_ratio") < min_distinct_ratio)

    bench_ids = None
    if decontam_threshold is not None:
        bench_ids = (
            bench_docs.select("doc_id")
            if bench_docs is not None
            else docs.filter(F.col("doc_id") % _ts.DEFAULT_BENCH_MOD == 0).select("doc_id")
        )

    dup = F.lit(False)
    if dedup != "none":
        # dedup runs over docs that can actually be KEPT: otherwise a
        # cluster whose min-doc_id keeper itself always drops (fails a
        # quality gate, or IS a benchmark row) would lose every copy
        # of the content (keeper dropped as too_short/low_quality/
        # benchmark, the rest as duplicates). Restricting the graph to
        # survivors re-picks the keeper among keepable docs. Exact
        # dups share identical text (and thus identical quality), so
        # the quality part only changes near-dup clusters; the bench
        # part matters for exact dups too (an exact training copy of
        # a bench doc is contaminated anyway — overlap 1.0 — so no
        # leak escapes through this path).
        pass_ids = (
            docs.select("doc_id")
            .join(q, "doc_id", "left")
            .where(~(too_short | low_quality))
            .select("doc_id")
        )
        if bench_ids is not None:
            pass_ids = pass_ids.join(bench_ids, "doc_id", "left_anti")
        clean = docs.join(pass_ids, "doc_id", "left_semi")
        keepers = _dedup.dedup_exact(clean).select(
            F.col("keeper_doc_id").alias("doc_id"), F.lit(1).alias("exact_keeper")
        )
        out = out.join(keepers, "doc_id", "left")
        dup = ~(too_short | low_quality) & F.col("exact_keeper").isNull()
        if dedup == "cluster":
            cc = _dedup.dedup_clusters(
                clean,
                threshold=jaccard_threshold,
                max_shingle_df=max_shingle_df,
                max_iter=cc_max_iter,
                checkpoint_dir=cc_checkpoint_dir,
            ).select("doc_id", "is_keeper")
            out = out.join(cc, "doc_id", "left")
            # a near-dup component keeps exactly its min doc_id; docs
            # outside any component keep their exact-dedup verdict
            dup = dup | (F.col("is_keeper") == F.lit(False))

    contaminated = F.lit(False)
    bench_member = F.lit(False)
    if decontam_threshold is not None:
        flagged = _ts.decontaminate(
            docs, bench_docs=bench_docs, threshold=decontam_threshold
        ).select("doc_id", F.lit(1).alias("contam"))
        # plain doc_id-keyed joins (co-partitioned with the rest of the
        # assembly): the flagged set and the bench-id set are unbounded
        # fractions of the corpus, so broadcasting them would funnel
        # corpus-scale data through the driver — the broadcast belongs
        # only to the tiny eval-SHINGLE set inside decontaminate.
        out = out.join(flagged, "doc_id", "left")
        contaminated = F.col("contam").isNotNull()
        out = out.join(bench_ids.withColumn("is_bench", F.lit(1)), "doc_id", "left")
        bench_member = F.col("is_bench").isNotNull()

    reason = (
        F.when(too_short, F.lit("too_short"))
        .when(low_quality, F.lit("low_quality"))
        .when(bench_member, F.lit("benchmark"))
        .when(dup, F.lit("duplicate"))
        .when(contaminated, F.lit("contaminated"))
        .otherwise(F.lit(None).cast("string"))
    )
    return out.select(
        "doc_id",
        reason.isNull().alias("keep"),
        reason.alias("drop_reason"),
    ).orderBy("doc_id")


def curate_corpus_sql(
    *,
    min_tokens: int = 5,
    max_stopword_ratio: float | None = None,
    min_distinct_ratio: float | None = None,
    dedup: str = "cluster",
    jaccard_threshold: float = 0.5,
    max_shingle_df: int | None = None,
    decontam_threshold: float | None = None,
    bench_mod: int = _ts.DEFAULT_BENCH_MOD,
) -> str:
    """Full-pipeline DuckDB mirror of ``curate_corpus`` with the
    SYNTHETIC bench slice (``bench_docs=None``): the same quality
    gates over the same rounded features, the same keeper-eligibility
    restriction (quality-passing, non-bench docs), the recursive-CTE
    connected components from dedup_clusters_sql over that restricted
    graph, the decontaminate_sql overlap probe, and the same verdict
    priority — so the driver value-checks the COMPOSED decision table,
    not just its parts."""
    if dedup not in ("exact", "cluster"):
        raise ValueError("SQL mirror covers dedup=exact|cluster")
    stop = ", ".join(f"'{s}'" for s in _ts.STOPWORDS)
    lowq = ["FALSE"]
    if max_stopword_ratio is not None:
        lowq.append(f"q.stopword_ratio > {max_stopword_ratio}")
    if min_distinct_ratio is not None:
        lowq.append(f"q.distinct_ratio < {min_distinct_ratio}")
    lowq_expr = " OR ".join(lowq)

    bench_pred = f"doc_id % {bench_mod} = 0"
    clean_extra = f" AND NOT ({bench_pred})" if decontam_threshold is not None else ""

    hot = ""
    shf = "csh"
    if max_shingle_df:
        hot = f""", hot AS (
  SELECT shingle FROM csh GROUP BY shingle HAVING COUNT(*) > {max_shingle_df}
), cshf AS (
  SELECT c.doc_id, c.shingle FROM csh c ANTI JOIN hot USING (shingle)
)"""
        shf = "cshf"

    cluster_ctes = ""
    dup_cluster = ""
    cc_join = ""
    if dedup == "cluster":
        # shingle + pair CTEs come from dedup's shared builders so the
        # intersection math and the threshold compare (UNROUNDED, like
        # ngram_jaccard_pairs' filter — rounding is display-only)
        # cannot drift from the Spark path's own oracle
        cluster_ctes = f""",
{_dedup.shingles_ctes("clean", "c")}{hot}, {_dedup.jaccard_pair_ctes(shf)}, pairs AS (
  SELECT doc_id_a, doc_id_b FROM inter
  JOIN sz sa ON doc_id_a = sa.doc_id
  JOIN sz sb ON doc_id_b = sb.doc_id
  WHERE inter::DOUBLE / (sa.n_sh + sb.n_sh - inter) >= {jaccard_threshold}
), edges AS (
  SELECT doc_id_a AS src, doc_id_b AS dst FROM pairs
  UNION ALL
  SELECT doc_id_b, doc_id_a FROM pairs
), nodes AS (SELECT DISTINCT src AS doc_id FROM edges),
walk(node, label) AS (
  SELECT doc_id, doc_id FROM nodes
  UNION
  SELECT e.dst, w.label FROM walk w JOIN edges e ON e.src = w.node
), cc AS (SELECT node AS doc_id, MIN(label) AS cluster_id FROM walk GROUP BY node)"""
        dup_cluster = " OR (cc.doc_id IS NOT NULL AND cc.cluster_id <> f.doc_id)"
        cc_join = "\nLEFT JOIN cc ON f.doc_id = cc.doc_id"

    decontam_ctes = ""
    bench_when = ""
    contam_when = ""
    contam_join = ""
    if decontam_threshold is not None:
        decontam_ctes = f""",
{_dedup.shingles_ctes("documents", "d")}, bsh AS (SELECT DISTINCT shingle FROM dsh WHERE {bench_pred}),
tr AS (SELECT doc_id, shingle FROM dsh WHERE NOT ({bench_pred})),
ov AS (
  SELECT t.doc_id, COUNT(*)::BIGINT AS n_sh, COUNT(b.shingle)::BIGINT AS n_hit
  FROM tr t LEFT JOIN bsh b USING (shingle) GROUP BY t.doc_id
), contam AS (
  SELECT doc_id FROM ov WHERE ROUND(n_hit::DOUBLE / n_sh, 5) >= {decontam_threshold}
)"""
        bench_when = f"\n    WHEN f.doc_id % {bench_mod} = 0 THEN 'benchmark'"
        contam_when = "\n    WHEN co.doc_id IS NOT NULL THEN 'contaminated'"
        contam_join = "\nLEFT JOIN contam co ON f.doc_id = co.doc_id"

    return f"""WITH RECURSIVE tk AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term FROM documents
), tkf AS (SELECT doc_id, term FROM tk WHERE term <> ''),
q AS (
  SELECT doc_id, COUNT(*)::BIGINT AS n_tokens,
         ROUND(COUNT(DISTINCT term)::DOUBLE / COUNT(*), 5) AS distinct_ratio,
         ROUND(SUM(CASE WHEN term IN ({stop}) THEN 1 ELSE 0 END)::DOUBLE / COUNT(*), 5) AS stopword_ratio
  FROM tkf GROUP BY doc_id
), flags AS (
  SELECT d.doc_id, d.text,
         (q.n_tokens IS NULL OR q.n_tokens < {min_tokens}) AS too_short,
         COALESCE({lowq_expr}, FALSE) AS low_quality
  FROM documents d LEFT JOIN q USING (doc_id)
), clean AS (
  SELECT doc_id, text FROM flags
  WHERE NOT too_short AND NOT low_quality{clean_extra}
), ke AS (SELECT MIN(doc_id) AS doc_id FROM clean GROUP BY md5(text)){cluster_ctes}{decontam_ctes}
SELECT f.doc_id,
  (CASE
    WHEN f.too_short THEN 'too_short'
    WHEN f.low_quality THEN 'low_quality'{bench_when}
    WHEN (NOT f.too_short AND NOT f.low_quality AND ke.doc_id IS NULL){dup_cluster}
      THEN 'duplicate'{contam_when}
    ELSE NULL END) IS NULL AS keep,
  CASE
    WHEN f.too_short THEN 'too_short'
    WHEN f.low_quality THEN 'low_quality'{bench_when}
    WHEN (NOT f.too_short AND NOT f.low_quality AND ke.doc_id IS NULL){dup_cluster}
      THEN 'duplicate'{contam_when}
    ELSE NULL END AS drop_reason
FROM flags f
LEFT JOIN ke ON f.doc_id = ke.doc_id{cc_join}{contam_join}
ORDER BY f.doc_id"""


#: the driver-entry configuration: every gate fires on the fixture
#: corpus (~5% too_short, a few % low_quality, 5% benchmark, near-dup
#: clusters from the template families, a handful contaminated)
_DRIVER_CFG = dict(
    min_tokens=16,
    max_stopword_ratio=0.125,
    min_distinct_ratio=0.31,
    dedup="cluster",
    jaccard_threshold=0.5,
    max_shingle_df=50,
    decontam_threshold=0.2,
)


def driver_queries():
    return {
        "curate_corpus": lambda s, d: curate_corpus(
            s.read.parquet(f"{d}/documents.parquet"), **_DRIVER_CFG
        ),
    }


def driver_oracles():
    return {
        "curate_corpus": curate_corpus_sql(**_DRIVER_CFG),
    }
