"""ANSI-SQL (DuckDB-dialect) oracles for every driver-checked operator.

Each function returns the SQL string the driver runs in DuckDB against
the same parquet tables; the Spark implementation it mirrors is named
in the docstring. Column aliases MUST match the Spark output exactly
(driver hashes values with columns sorted by name). Floats are rounded
to 5 dp on BOTH sides; ordering always uses the unrounded value.
"""

from __future__ import annotations

BM25_PARAMS = {"k1": 1.2, "b": 0.75}


def _terms_list(terms: list[str]) -> str:
    return ", ".join("'" + t.replace("'", "''") + "'" for t in sorted(set(terms)))


# shared CTE prelude: tokenization + doc lengths + corpus stats
def _prelude(stopwords: tuple = ()) -> str:
    """With ``stopwords``, the kept-token stream (and therefore
    doc_len, df, avgdl) excludes them — the oracle twin of a build
    with EngineConfig(stopwords=...) (X6; the fixture corpus has no
    all-stopword doc, so n_docs is unchanged by the filter)."""
    stop = (
        " AND term NOT IN (" + _terms_list(list(stopwords)) + ")" if stopwords else ""
    )
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
  FROM documents
), toks_f AS (
  SELECT doc_id, term FROM toks WHERE term <> ''{stop}
), dl AS (
  SELECT doc_id, COUNT(*)::BIGINT AS doc_len FROM toks_f GROUP BY doc_id
), stats AS (
  SELECT COUNT(*)::DOUBLE AS n_docs, AVG(doc_len)::DOUBLE AS avgdl FROM dl
)"""


_PRELUDE = _prelude()


def bm25_topk_sql(
    terms: list[str],
    k: int = 10,
    mode: str = "and",
    lang: str | None = None,
    stopwords: tuple = (),
) -> str:
    """Mirror of operators.bm25.bm25_topk_oracle."""
    tl = _terms_list(terms)
    n_terms = len(set(terms))
    cand_filter = (
        f"AND doc_id IN (SELECT doc_id FROM documents WHERE lang = '{lang}')"
        if lang
        else ""
    )
    having = f"HAVING COUNT(*) = {n_terms}" if mode == "and" else ""
    return f"""{_prelude(stopwords)}, q_df AS (
  SELECT term, COUNT(*)::DOUBLE AS df
  FROM (SELECT DISTINCT doc_id, term FROM toks_f WHERE term IN ({tl}))
  GROUP BY term
), tf AS (
  SELECT doc_id, term, COUNT(*)::DOUBLE AS tf
  FROM toks_f WHERE term IN ({tl}) {cand_filter}
  GROUP BY doc_id, term
), agg AS (
  SELECT tf.doc_id,
         SUM( ln((stats.n_docs - q_df.df + 0.5)/(q_df.df + 0.5) + 1.0)
              * tf.tf * ({BM25_PARAMS['k1']} + 1.0)
              / (tf.tf + {BM25_PARAMS['k1']}
                 * (1.0 - {BM25_PARAMS['b']}
                    + {BM25_PARAMS['b']} * dl.doc_len / stats.avgdl)) ) AS s
  FROM tf
  JOIN q_df USING (term)
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats
  GROUP BY tf.doc_id
  {having}
)
SELECT doc_id, ROUND(s, 5) AS score
FROM agg ORDER BY s DESC, doc_id ASC LIMIT {k}"""


def term_lookup_sql(term: str) -> str:
    """Mirror of a single-term posting-list read (SURVEY §2.1 S3):
    (doc_id, tf) for one term, full list."""
    t = term.replace("'", "''")
    return f"""{_PRELUDE}
SELECT doc_id, COUNT(*)::BIGINT AS tf
FROM toks_f WHERE term = '{t}'
GROUP BY doc_id ORDER BY doc_id"""


def and_intersect_sql(terms: list[str]) -> str:
    """Mirror of the k-way posting intersection (SURVEY §2.3 J1),
    doc-id set only."""
    tl = _terms_list(terms)
    n = len(set(terms))
    return f"""{_PRELUDE}
SELECT doc_id FROM (
  SELECT doc_id, COUNT(DISTINCT term) AS nt
  FROM toks_f WHERE term IN ({tl}) GROUP BY doc_id
) WHERE nt = {n} ORDER BY doc_id"""


def or_union_sql(terms: list[str]) -> str:
    """Mirror of termlist OR (SURVEY §2.7 U1)."""
    tl = _terms_list(terms)
    return f"""{_PRELUDE}
SELECT DISTINCT doc_id FROM toks_f WHERE term IN ({tl}) ORDER BY doc_id"""


def not_exclude_sql(term: str, minus: str) -> str:
    """Mirror of the negative-term anti-join (SURVEY §2.2 F1)."""
    t, m = term.replace("'", "''"), minus.replace("'", "''")
    return f"""{_PRELUDE}
SELECT DISTINCT doc_id FROM toks_f WHERE term = '{t}'
AND doc_id NOT IN (SELECT doc_id FROM toks_f WHERE term = '{m}')
ORDER BY doc_id"""


def facets_sql(terms: list[str], facet_col: str = "lang") -> str:
    """Mirror of gbfacetstr (SURVEY §2.4 A5): value counts of a
    metadata field over the (OR) match set."""
    tl = _terms_list(terms)
    return f"""{_PRELUDE}
SELECT d.{facet_col} AS facet_value, COUNT(*)::BIGINT AS facet_count
FROM documents d
WHERE d.doc_id IN (SELECT DISTINCT doc_id FROM toks_f WHERE term IN ({tl}))
GROUP BY d.{facet_col} ORDER BY facet_value"""


def facets_range_sql(
    terms: list[str], facet_col: str = "n_chars", bucket_width: int = 100
) -> str:
    """Mirror of gbfacetint with fixed-width buckets (SURVEY §2.4 A5):
    histogram of a numeric metadata field over the (OR) match set."""
    tl = _terms_list(terms)
    return f"""{_PRELUDE}
SELECT (FLOOR(d.{facet_col} / {bucket_width}) * {bucket_width})::BIGINT AS bucket_lo,
       COUNT(*)::BIGINT AS facet_count
FROM documents d
WHERE d.doc_id IN (SELECT DISTINCT doc_id FROM toks_f WHERE term IN ({tl}))
GROUP BY 1 ORDER BY bucket_lo"""


def term_stats_sql(min_df: int = 1) -> str:
    """Mirror of operators.stats.term_stats (df per term, SURVEY §2.4 A1)."""
    return f"""{_PRELUDE}
SELECT term, COUNT(DISTINCT doc_id)::BIGINT AS df
FROM toks_f GROUP BY term HAVING COUNT(DISTINCT doc_id) >= {min_df}
ORDER BY term"""


def doc_meta_sql() -> str:
    """Mirror of operators.stats.doc_meta: doc_len + sha256 invariant
    (BASELINE.json input_hint; SURVEY §2.8 X12)."""
    return f"""{_PRELUDE}
SELECT d.doc_id, dl.doc_len, sha256(d.text) AS content_sha256
FROM documents d JOIN dl ON d.doc_id = dl.doc_id
ORDER BY d.doc_id"""


def topk_sitecap_sql(terms: list[str], k: int = 10, cap: int = 2) -> str:
    """Mirror of TopTree per-site clustering cap (SURVEY §2.5 W1):
    at most `cap` results per `source`, then global top-k by score."""
    tl = _terms_list(terms)
    n_terms = len(set(terms))
    inner = bm25_like_agg = f"""{_PRELUDE}, q_df AS (
  SELECT term, COUNT(*)::DOUBLE AS df
  FROM (SELECT DISTINCT doc_id, term FROM toks_f WHERE term IN ({tl}))
  GROUP BY term
), tf AS (
  SELECT doc_id, term, COUNT(*)::DOUBLE AS tf
  FROM toks_f WHERE term IN ({tl}) GROUP BY doc_id, term
), agg AS (
  SELECT tf.doc_id,
         SUM( ln((stats.n_docs - q_df.df + 0.5)/(q_df.df + 0.5) + 1.0)
              * tf.tf * (1.2 + 1.0)
              / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.doc_len / stats.avgdl)) ) AS s
  FROM tf JOIN q_df USING (term) JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats GROUP BY tf.doc_id HAVING COUNT(*) = {n_terms}
), ranked AS (
  SELECT agg.doc_id, agg.s, d.source,
         ROW_NUMBER() OVER (PARTITION BY d.source ORDER BY agg.s DESC, agg.doc_id ASC) AS rn
  FROM agg JOIN documents d ON agg.doc_id = d.doc_id
)
SELECT doc_id, ROUND(s, 5) AS score, source
FROM ranked WHERE rn <= {cap}
ORDER BY s DESC, doc_id ASC LIMIT {k}"""
    return inner


def pagination_sql(terms: list[str], offset: int, limit: int) -> str:
    """Mirror of result pagination (SURVEY §2.5 W2)."""
    base = bm25_topk_sql(terms, k=10_000_000, mode="and")
    # strip the trailing LIMIT and re-apply offset/limit
    base = base.rsplit("LIMIT", 1)[0]
    return f"{base} LIMIT {limit} OFFSET {offset}"


def sortby_sql(terms: list[str], sort_col: str = "n_chars", k: int = 10) -> str:
    """Mirror of gbsortby: (SURVEY §2.5 W4) — matched docs ordered by an
    indexed numeric field instead of score."""
    tl = _terms_list(terms)
    n = len(set(terms))
    return f"""{_PRELUDE}
SELECT d.doc_id, d.{sort_col} AS sort_key
FROM documents d
WHERE d.doc_id IN (
  SELECT doc_id FROM (
    SELECT doc_id, COUNT(DISTINCT term) nt FROM toks_f
    WHERE term IN ({tl}) GROUP BY doc_id) WHERE nt = {n})
ORDER BY d.{sort_col} DESC, d.doc_id ASC LIMIT {k}"""


def numeric_range_sql(term: str, lo: int, hi: int) -> str:
    """Mirror of gbminint/gbmaxint numeric range restriction
    (SURVEY §2.2 F4) on n_chars."""
    t = term.replace("'", "''")
    return f"""{_PRELUDE}
SELECT DISTINCT t.doc_id FROM toks_f t
JOIN documents d ON t.doc_id = d.doc_id
WHERE t.term = '{t}' AND d.n_chars BETWEEN {lo} AND {hi}
ORDER BY t.doc_id"""


def phrase_bigram_sql(w1: str, w2: str) -> str:
    """Mirror of bigram/phrase matching (SURVEY §2.8 X4): docs where w2
    occurs immediately after w1. SQL form uses positional self-join on
    tokenized positions (identical semantics to the positions-array
    check in Spark)."""
    a, b = w1.replace("'", "''"), w2.replace("'", "''")
    return f"""WITH toks AS (
  SELECT doc_id,
         unnest(string_split(lower(text), ' ')) AS term,
         generate_subscripts(string_split(lower(text), ' '), 1) AS pos
  FROM documents
), t1 AS (SELECT doc_id, pos FROM toks WHERE term = '{a}'),
   t2 AS (SELECT doc_id, pos FROM toks WHERE term = '{b}')
SELECT DISTINCT t1.doc_id FROM t1
JOIN t2 ON t1.doc_id = t2.doc_id AND t2.pos = t1.pos + 1
ORDER BY t1.doc_id"""


def snippets_sql(terms: list[str], k: int = 10, mode: str = "and") -> str:
    """Mirror of operators.snippets.search_with_snippets (SURVEY §2.9
    P1-P3): BM25 top-k joined back to docs, 7-token window anchored at
    the first query-term hit, term tokens wrapped in <b>…</b>."""
    tl = _terms_list(terms)
    ts = sorted(set(terms))
    n_terms = len(ts)
    having = f"HAVING COUNT(*) = {n_terms}" if mode == "and" else ""
    anchor = ", ".join(
        f"NULLIF(list_position(string_split(lower(d.text), ' '), '{t}'), 0)"
        for t in ts
    )
    anchor_expr = f"least({anchor})" if n_terms > 1 else anchor
    in_list = ", ".join("'" + t.replace("'", "''") + "'" for t in ts)
    return f"""{_PRELUDE}, q_df AS (
  SELECT term, COUNT(*)::DOUBLE AS df
  FROM (SELECT DISTINCT doc_id, term FROM toks_f WHERE term IN ({tl}))
  GROUP BY term
), tf AS (
  SELECT doc_id, term, COUNT(*)::DOUBLE AS tf
  FROM toks_f WHERE term IN ({tl})
  GROUP BY doc_id, term
), agg AS (
  SELECT tf.doc_id,
         SUM( ln((stats.n_docs - q_df.df + 0.5)/(q_df.df + 0.5) + 1.0)
              * tf.tf * ({BM25_PARAMS['k1']} + 1.0)
              / (tf.tf + {BM25_PARAMS['k1']}
                 * (1.0 - {BM25_PARAMS['b']}
                    + {BM25_PARAMS['b']} * dl.doc_len / stats.avgdl)) ) AS s
  FROM tf JOIN q_df USING (term) JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats GROUP BY tf.doc_id {having}
), topk AS (
  SELECT doc_id, s FROM agg ORDER BY s DESC, doc_id ASC LIMIT {k}
), wnd AS (
  SELECT topk.doc_id, topk.s,
         string_split(lower(d.text), ' ') AS toks,
         {anchor_expr} AS anchor
  FROM topk JOIN documents d ON topk.doc_id = d.doc_id
), cut AS (
  SELECT doc_id, s,
         CASE WHEN anchor IS NOT NULL
              THEN list_slice(toks, greatest(1, anchor - 3), greatest(1, anchor - 3) + 6)
              ELSE [] END AS wtoks
  FROM wnd
)
SELECT doc_id, ROUND(s, 5) AS score,
       array_to_string(wtoks, ' ') AS snippet,
       array_to_string(
         list_transform(wtoks,
           t -> CASE WHEN t IN ({in_list}) THEN '<b>' || t || '</b>' ELSE t END),
         ' ') AS highlight
FROM cut ORDER BY s DESC, doc_id ASC"""


def doc_lookup_sql(doc_id: int) -> str:
    """Mirror of operators.snippets.doc_lookup (gbdocid:, SURVEY §3.3)."""
    return f"SELECT * FROM documents WHERE doc_id = {int(doc_id)}"


def bm25_grouped_sql(groups: list[list[str]], k: int = 10) -> str:
    """Mirror of operators.bm25.bm25_grouped (synonym OR-groups, X5)."""
    flat = sorted({t for g in groups for t in g})
    tl = ", ".join("'" + t.replace("'", "''") + "'" for t in flat)
    gid_cases = " ".join(
        "WHEN term IN ({}) THEN {}".format(
            ", ".join("'" + t.replace("'", "''") + "'" for t in sorted(set(g))), i
        )
        for i, g in enumerate(groups)
    )
    return f"""{_PRELUDE}, q_df AS (
  SELECT term, COUNT(*)::DOUBLE AS df
  FROM (SELECT DISTINCT doc_id, term FROM toks_f WHERE term IN ({tl}))
  GROUP BY term
), tf AS (
  SELECT doc_id, term, COUNT(*)::DOUBLE AS tf,
         CASE {gid_cases} END AS gid
  FROM toks_f WHERE term IN ({tl})
  GROUP BY doc_id, term
), agg AS (
  SELECT tf.doc_id,
         SUM( ln((stats.n_docs - q_df.df + 0.5)/(q_df.df + 0.5) + 1.0)
              * tf.tf * ({BM25_PARAMS['k1']} + 1.0)
              / (tf.tf + {BM25_PARAMS['k1']} * (1.0 - {BM25_PARAMS['b']}
                    + {BM25_PARAMS['b']} * dl.doc_len / stats.avgdl)) ) AS s,
         COUNT(DISTINCT tf.gid) AS ngroups
  FROM tf JOIN q_df USING (term) JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats GROUP BY tf.doc_id
  HAVING COUNT(DISTINCT tf.gid) = {len(groups)}
)
SELECT doc_id, ROUND(s, 5) AS score
FROM agg ORDER BY s DESC, doc_id ASC LIMIT {k}"""


def bm25_topk_batch_sql(queries: dict, k: int = 10) -> str:
    """Mirror of wand.wand_topk_batch: per-query bm25_topk_sql results
    tagged with their query_id and unioned — the batch API must be
    rank-identical to N independent queries, so its oracle IS N
    independent oracles."""
    parts = [
        f"SELECT '{qid}' AS query_id, * FROM (\n"
        + bm25_topk_sql(terms, k=k, mode=mode)
        + "\n)"
        for qid, (terms, mode) in sorted(queries.items())
    ]
    return "\nUNION ALL\n".join(parts)
