"""J3 — link-graph / anchor-text indexing (VERDICT r01 "What's
missing" #4; reference: Msg25.cpp getLinkInfo + Linkdb.cpp — inbound
link text is hashed into the TARGET doc's posdb termlists with
HASHGROUP_INLINKTEXT weights, so a page ranks for words used in links
pointing at it; SURVEY.md §2.3 J3, §2.4 A6).

Spark expression: edges ``(src_doc_id, dst_doc_id, anchor_text)`` →
tokenize anchor text (same tokenizer, one pass) → token rows assigned
to the TARGET doc → unioned with the target's own content tokens →
ordinary BM25 over the combined stream. df / doc_len / avgdl are all
computed over the combined stream (pinned semantics, mirrored exactly
by the DuckDB oracle).

The driver fixture needs a deterministic graph derivable from the
documents table alone (no external data): doc i links to doc
(7·i + 1) mod N with the first 3 tokens of i's text as anchor text —
both engines synthesize the identical edge set.

Site-level ranking (A6/J4) composes: the same edge set lifted to
(src_site, dst_site) feeds operators.site_rank, whose quantized rank
multiplies the BM25 score (the posdb siteRank multiplier).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from open_source_search_engine_spark.config import EngineConfig
from open_source_search_engine_spark.operators import bm25
from open_source_search_engine_spark.operators.postings import doc_tokens
from open_source_search_engine_spark.operators.site_rank import site_rank
from open_source_search_engine_spark.plans.oracle_sql import BM25_PARAMS, _terms_list

ANCHOR_WORDS = 3
EDGE_MULT = 7


def synthetic_edges(docs: DataFrame) -> DataFrame:
    """Deterministic link graph from the documents table: doc i →
    doc (7·i + 1) mod N, anchor = first 3 tokens of i's text. Used by
    tests/driver so Spark and DuckDB build byte-identical edges; real
    deployments pass their own (src, dst, anchor_text) table."""
    n = docs.agg((F.max("doc_id") + 1).alias("n"))
    toks = F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda t: t != F.lit(""))
    return (
        docs.crossJoin(F.broadcast(n))
        .select(
            F.col("doc_id").alias("src_doc_id"),
            F.pmod(F.col("doc_id") * EDGE_MULT + 1, F.col("n")).alias("dst_doc_id"),
            F.concat_ws(" ", F.slice(toks, 1, ANCHOR_WORDS)).alias("anchor_text"),
        )
    )


def anchor_tokens(edges: DataFrame, tokenizer_mode: str = "simple") -> DataFrame:
    """(doc_id, term) — anchor-text tokens credited to the TARGET."""
    return doc_tokens(
        edges.select(F.col("dst_doc_id").alias("doc_id"), F.col("anchor_text").alias("text")),
        "text",
        "doc_id",
        mode=tokenizer_mode,
    ).select("doc_id", "term")


def bm25_topk_anchored(
    docs: DataFrame,
    edges: DataFrame,
    terms: list[str],
    k: int = 10,
    mode: str = "and",
    cfg: EngineConfig = EngineConfig(),
    tokenizer_mode: str = "simple",
) -> DataFrame:
    """BM25 top-k over content ⊕ inbound-anchor token streams — the
    J3 join: a doc matches and scores on words that only ever appear
    in links pointing at it."""
    return bm25.bm25_topk_oracle(
        docs,
        terms,
        k=k,
        mode=mode,
        cfg=cfg,
        tokenizer_mode=tokenizer_mode,
        extra_tokens=anchor_tokens(edges, tokenizer_mode),
    )


def site_edges(docs: DataFrame, edges: DataFrame, site_col: str = "source") -> DataFrame:
    """Lift doc-level edges to (src_site, dst_site) via the docs'
    site column — Linkdb's site-level aggregation."""
    sites = docs.select("doc_id", F.col(site_col).alias("site"))
    return (
        edges.join(
            sites.withColumnsRenamed({"doc_id": "src_doc_id", "site": "src_site"}),
            "src_doc_id",
        )
        .join(
            sites.withColumnsRenamed({"doc_id": "dst_doc_id", "site": "dst_site"}),
            "dst_doc_id",
        )
        .select("src_site", "dst_site")
    )


def site_rank_table(docs: DataFrame, site_col: str = "source") -> DataFrame:
    """(site, n_inlinkers, site_rank) from the synthetic graph — the
    A6 aggregation end to end."""
    ranks = site_rank(site_edges(docs, synthetic_edges(docs), site_col))
    return ranks.select("site", "n_inlinkers", "site_rank").orderBy("site")


def bm25_topk_site_boosted(
    docs: DataFrame,
    terms: list[str],
    k: int = 10,
    site_col: str = "source",
    cfg: EngineConfig = EngineConfig(),
) -> DataFrame:
    """Top-k where each doc's BM25 score is multiplied by its site's
    rank weight (1 + site_rank/16) — the posdb siteRank multiplier
    applied query-side (J4 metadata join + A6 aggregation). Ranking
    happens on the BOOSTED score; window/limit after the multiply."""
    ranks = site_rank(site_edges(docs, synthetic_edges(docs), site_col))
    scored = bm25.bm25_scores(docs, terms, mode="and", cfg=cfg)
    sited = scored.join(docs.select("doc_id", F.col(site_col).alias("site")), "doc_id")
    boosted = sited.join(F.broadcast(ranks.select("site", "site_rank")), "site", "left")
    w = F.lit(1.0) + F.coalesce(F.col("site_rank"), F.lit(0)).cast("double") / F.lit(16.0)
    return (
        boosted.withColumn("_b", F.col("_score") * w)
        .orderBy(F.desc("_b"), F.asc("doc_id"))
        .limit(k)
        .select("doc_id", F.round("_b", 5).alias("score"), "site")
    )


# ---------------------------------------------------------------- oracles

_EDGES_SQL = f"""
WITH n AS (SELECT MAX(doc_id) + 1 AS n FROM documents),
edges AS (
  SELECT doc_id AS src_doc_id,
         (doc_id * {EDGE_MULT} + 1) % n.n AS dst_doc_id,
         array_to_string((string_split(lower(text), ' '))[1:{ANCHOR_WORDS}], ' ') AS anchor_text
  FROM documents, n
)"""


def anchored_topk_sql(terms: list[str], k: int = 10, mode: str = "and") -> str:
    tl = _terms_list(terms)
    n_terms = len(set(terms))
    p = BM25_PARAMS
    having = f"HAVING COUNT(*) = {n_terms}" if mode == "and" else ""
    return f"""{_EDGES_SQL}, ctoks AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term FROM documents
), atoks AS (
  SELECT dst_doc_id AS doc_id, unnest(string_split(anchor_text, ' ')) AS term FROM edges
), toks_f AS (
  SELECT doc_id, term FROM ctoks WHERE term <> ''
  UNION ALL
  SELECT doc_id, term FROM atoks WHERE term <> ''
), dl AS (
  SELECT doc_id, COUNT(*)::BIGINT AS doc_len FROM toks_f GROUP BY doc_id
), stats AS (
  SELECT COUNT(*)::DOUBLE AS n_docs, AVG(doc_len)::DOUBLE AS avgdl FROM dl
), q_df AS (
  SELECT term, COUNT(*)::DOUBLE AS df
  FROM (SELECT DISTINCT doc_id, term FROM toks_f WHERE term IN ({tl}))
  GROUP BY term
), tf AS (
  SELECT doc_id, term, COUNT(*)::DOUBLE AS tf
  FROM toks_f WHERE term IN ({tl}) GROUP BY doc_id, term
), agg AS (
  SELECT tf.doc_id,
         SUM( ln((stats.n_docs - q_df.df + 0.5)/(q_df.df + 0.5) + 1.0)
              * tf.tf * ({p['k1']} + 1.0)
              / (tf.tf + {p['k1']} * (1.0 - {p['b']}
                    + {p['b']} * dl.doc_len / stats.avgdl)) ) AS s
  FROM tf JOIN q_df USING (term) JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats GROUP BY tf.doc_id {having}
)
SELECT doc_id, ROUND(s, 5) AS score
FROM agg ORDER BY s DESC, doc_id ASC LIMIT {k}"""


_SITE_RANK_SQL = f"""{_EDGES_SQL}, s AS (
  SELECT doc_id, source FROM documents
), se AS (
  SELECT ss.source AS src_site, sd.source AS dst_site
  FROM edges JOIN s ss ON edges.src_doc_id = ss.doc_id
             JOIN s sd ON edges.dst_doc_id = sd.doc_id
), ranks AS (
  SELECT dst_site AS site,
         COUNT(DISTINCT src_site)::BIGINT AS n_inlinkers,
         LEAST(15, FLOOR(LOG2(1 + COUNT(DISTINCT src_site))))::INT AS site_rank
  FROM se WHERE src_site <> dst_site GROUP BY dst_site
)"""


def site_rank_table_sql() -> str:
    return f"""{_SITE_RANK_SQL}
SELECT site, n_inlinkers, site_rank FROM ranks ORDER BY site"""


def site_boosted_topk_sql(terms: list[str], k: int = 10) -> str:
    tl = _terms_list(terms)
    n_terms = len(set(terms))
    p = BM25_PARAMS
    return f"""{_SITE_RANK_SQL}, toks AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term FROM documents
), toks_f AS (
  SELECT doc_id, term FROM toks WHERE term <> ''
), dl AS (
  SELECT doc_id, COUNT(*)::BIGINT AS doc_len FROM toks_f GROUP BY doc_id
), stats AS (
  SELECT COUNT(*)::DOUBLE AS n_docs, AVG(doc_len)::DOUBLE AS avgdl FROM dl
), q_df AS (
  SELECT term, COUNT(*)::DOUBLE AS df
  FROM (SELECT DISTINCT doc_id, term FROM toks_f WHERE term IN ({tl}))
  GROUP BY term
), tf AS (
  SELECT doc_id, term, COUNT(*)::DOUBLE AS tf
  FROM toks_f WHERE term IN ({tl}) GROUP BY doc_id, term
), agg AS (
  SELECT tf.doc_id,
         SUM( ln((stats.n_docs - q_df.df + 0.5)/(q_df.df + 0.5) + 1.0)
              * tf.tf * ({p['k1']} + 1.0)
              / (tf.tf + {p['k1']} * (1.0 - {p['b']}
                    + {p['b']} * dl.doc_len / stats.avgdl)) ) AS s
  FROM tf JOIN q_df USING (term) JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats GROUP BY tf.doc_id HAVING COUNT(*) = {n_terms}
), boosted AS (
  SELECT agg.doc_id,
         agg.s * (1.0 + COALESCE(ranks.site_rank, 0) / 16.0) AS b,
         d.source AS site
  FROM agg JOIN documents d ON agg.doc_id = d.doc_id
  LEFT JOIN ranks ON d.source = ranks.site
)
SELECT doc_id, ROUND(b, 5) AS score, site
FROM boosted ORDER BY b DESC, doc_id ASC LIMIT {k}"""


def driver_queries():
    return {
        "anchor_text_topk": lambda s, d: bm25_topk_anchored(
            _docs(s, d), synthetic_edges(_docs(s, d)), ["join", "hash"], k=10
        ),
        "site_rank_table": lambda s, d: site_rank_table(_docs(s, d)),
        "site_rank_boosted_topk": lambda s, d: bm25_topk_site_boosted(
            _docs(s, d), ["join", "hash"], k=10
        ),
        # index-backed twins (VERDICT r02 item 2): anchors live in the
        # termlists of a build with anchor_edges; site_rank is a
        # doc_meta column of the main store — neither touches the
        # corpus or the link graph at query time
        "anchor_text_topk_indexed": lambda s, d: _anchored_indexed(s, d),
        "site_rank_boosted_topk_indexed": lambda s, d: _site_boosted_indexed(s, d),
    }


def _anchored_indexed(spark, sf_dir):
    import __spark_entry__ as entry
    from open_source_search_engine_spark.operators import indexed

    return indexed.bm25_topk(
        spark, entry._segment_index_anchored(spark, sf_dir), ["join", "hash"], k=10
    )


def _site_boosted_indexed(spark, sf_dir):
    import __spark_entry__ as entry
    from open_source_search_engine_spark.operators import indexed

    return indexed.bm25_topk_site_boosted(
        spark, entry._segment_index(spark, sf_dir), ["join", "hash"], k=10
    )


def driver_oracles():
    return {
        "anchor_text_topk": anchored_topk_sql(["join", "hash"], k=10),
        "site_rank_table": site_rank_table_sql(),
        "site_rank_boosted_topk": site_boosted_topk_sql(["join", "hash"], k=10),
        # identical oracles as the corpus-algebra twins — the driver
        # proves the anchored/site-ranked stores serve the same answers
        "anchor_text_topk_indexed": anchored_topk_sql(["join", "hash"], k=10),
        "site_rank_boosted_topk_indexed": site_boosted_topk_sql(["join", "hash"], k=10),
    }


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")
