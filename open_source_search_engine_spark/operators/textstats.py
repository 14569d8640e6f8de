"""Text-analysis operators for training-data pipelines: token counts,
quality scoring, document fingerprinting, language-ID.

These extend the reference's surface (Gigablast computes per-doc word
counts, density and spam ranks at index time — XmlDoc::getWordSpamVec,
SURVEY.md §1.3/§2.4) with the ops a 100 TB LLM-data pipeline needs.
All are single-pass groupBy aggregations over the exploded token
stream — one shuffle keyed by doc_id, map-side partial aggs, no UDFs
except the (clearly marked) language-ID heuristic.

Every SQL builder here is the DuckDB mirror of the Spark op above it;
column aliases are shared via module constants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from open_source_search_engine_spark.operators.postings import doc_tokens

STOPWORDS = ("the", "a")  # pinned tiny set present in the fixture vocab
DEFAULT_BENCH_MOD = 20  # synthetic eval slice: doc_id % mod == 0 (sandbox stand-in)

_TOKS_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
  FROM documents
), toks_f AS (SELECT doc_id, term FROM toks WHERE term <> '')"""


def token_counts(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens) — whitespace token count per doc."""
    toks = doc_tokens(docs)
    return (
        toks.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_tokens"))
        .orderBy("doc_id")
    )


def token_counts_sql() -> str:
    return f"""{_TOKS_SQL}
SELECT doc_id, COUNT(*)::BIGINT AS n_tokens FROM toks_f GROUP BY doc_id ORDER BY doc_id"""


def text_quality(docs: DataFrame) -> DataFrame:
    """Per-doc quality features: length, lexical diversity, stopword
    ratio, mean token length. The scalar features a quality-filtering
    stage thresholds on (C4/Gopher-style rules)."""
    toks = doc_tokens(docs)
    stop = list(STOPWORDS)
    return (
        toks.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.countDistinct("term").alias("n_distinct"),
            F.round(
                F.countDistinct("term") / F.count(F.lit(1)), 5
            ).alias("distinct_ratio"),
            F.round(
                F.sum(F.when(F.col("term").isin(stop), 1).otherwise(0))
                / F.count(F.lit(1)),
                5,
            ).alias("stopword_ratio"),
            F.round(F.avg(F.length("term")), 5).alias("avg_token_len"),
        )
        .orderBy("doc_id")
    )


def text_quality_sql() -> str:
    stop = ", ".join(f"'{s}'" for s in STOPWORDS)
    return f"""{_TOKS_SQL}
SELECT doc_id,
       COUNT(*)::BIGINT AS n_tokens,
       COUNT(DISTINCT term)::BIGINT AS n_distinct,
       ROUND(COUNT(DISTINCT term)::DOUBLE / COUNT(*), 5) AS distinct_ratio,
       ROUND(SUM(CASE WHEN term IN ({stop}) THEN 1 ELSE 0 END)::DOUBLE / COUNT(*), 5) AS stopword_ratio,
       ROUND(AVG(LENGTH(term))::DOUBLE, 5) AS avg_token_len
FROM toks_f GROUP BY doc_id ORDER BY doc_id"""


BPE_RE = "[a-z]{1,3}|[0-9]|[^a-z0-9 ]"


def token_counts_bpe(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, n_bpe_tokens) — whitespace token count plus
    a BPE-ish subword count (greedy ≤3-char alpha chunks, digits,
    punctuation — the cheap proxy a data pipeline budgets LLM token
    costs with). regexp_extract_all is JVM-side codegen; the identical
    regex runs in DuckDB for the oracle."""
    toks = doc_tokens(docs)
    ws = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_tokens"))
    bpe = docs.select(
        "doc_id",
        F.size(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit(BPE_RE), 0)
        ).cast("bigint").alias("n_bpe_tokens"),
    )
    return (
        bpe.join(ws, "doc_id", "left")
        .fillna({"n_tokens": 0})
        .select("doc_id", "n_tokens", "n_bpe_tokens")
        .orderBy("doc_id")
    )


def token_counts_bpe_sql() -> str:
    return f"""{_TOKS_SQL}, ws AS (
  SELECT doc_id, COUNT(*)::BIGINT AS n_tokens FROM toks_f GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(ws.n_tokens, 0)::BIGINT AS n_tokens,
       len(regexp_extract_all(lower(d.text), '{BPE_RE}'))::BIGINT AS n_bpe_tokens
FROM documents d LEFT JOIN ws ON d.doc_id = ws.doc_id
ORDER BY d.doc_id"""


def doc_fingerprint(docs: DataFrame) -> DataFrame:
    """(doc_id, fp_md5, fp_shingle_min) — whole-doc content fingerprint
    plus a shingle-min fingerprint (the rolling-hash/winnowing analog:
    lexicographic min of 3-gram shingle hashes, stable under doc_id
    renumbering)."""
    toks = docs.select(
        "doc_id",
        F.lower(F.col("text")).alias("lt"),
        F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda t: t != F.lit("")).alias("toks"),
    )
    shingled = toks.select(
        "doc_id",
        F.md5(F.col("lt").cast("binary")).alias("fp_md5"),
        F.when(
            F.size("toks") >= 3,
            F.transform(
                F.sequence(F.lit(0), F.size("toks") - 3),
                lambda i: F.md5(
                    F.concat_ws(" ", F.slice(F.col("toks"), i + 1, 3)).cast("binary")
                ),
            ),
        )
        .otherwise(F.array().cast("array<string>"))
        .alias("shingle_hashes"),
    )
    return shingled.select(
        "doc_id",
        "fp_md5",
        F.coalesce(F.array_min("shingle_hashes"), F.lit("")).alias("fp_shingle_min"),
    ).orderBy("doc_id")


def doc_fingerprint_sql() -> str:
    return """WITH t AS (
  SELECT doc_id, lower(text) AS lt, string_split(lower(text), ' ') AS toks
  FROM documents
), sh AS (
  SELECT doc_id, MIN(md5(toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS fp_shingle_min
  FROM t, unnest(range(1, len(toks) - 1)) AS r(i)
  WHERE len(toks) >= 3
  GROUP BY doc_id
)
SELECT t.doc_id, md5(t.lt) AS fp_md5, COALESCE(sh.fp_shingle_min, '') AS fp_shingle_min
FROM t LEFT JOIN sh ON t.doc_id = sh.doc_id
ORDER BY t.doc_id"""


# --- language ID (heuristic; Spark-only, rows-checked by the driver) ---

# character-frequency profiles are meaningless on the synthetic token
# fixture, so the heuristic is honest but the driver check is rows-only.
_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "ist", "nicht"],
    "es": ["el", "la", "de", "que", "es"],
    "fr": ["le", "la", "et", "les", "des"],
    "zh": [],
}


def lang_id(docs: DataFrame) -> DataFrame:
    """(doc_id, lang_pred) — stopword-marker vote with an ASCII-ratio
    fallback (non-ASCII-heavy → zh). Pure column expressions."""
    toks = doc_tokens(docs)
    votes = toks.groupBy("doc_id").agg(
        *[
            F.sum(F.when(F.col("term").isin(ms), 1).otherwise(0)).alias(f"v_{lang}")
            for lang, ms in _LANG_MARKERS.items()
            if ms
        ]
    )
    vote_cols = [f"v_{lang}" for lang, ms in _LANG_MARKERS.items() if ms]
    best = F.greatest(*[F.col(c) for c in vote_cols])
    pred = F.lit("unknown")
    for lang, ms in reversed([(l, m) for l, m in _LANG_MARKERS.items() if m]):
        pred = F.when((best > 0) & (F.col(f"v_{lang}") == best), F.lit(lang)).otherwise(pred)
    ascii_ratio = docs.select(
        "doc_id",
        (
            F.length(F.regexp_replace(F.col("text"), r"[^\x00-\x7F]", ""))
            / F.greatest(F.length("text"), F.lit(1))
        ).alias("ascii_ratio"),
    )
    return (
        votes.join(ascii_ratio, "doc_id")
        .select(
            "doc_id",
            F.when(F.col("ascii_ratio") < 0.6, F.lit("zh")).otherwise(pred).alias("lang_pred"),
        )
        .orderBy("doc_id")
    )


def lang_id_sql() -> str:
    """DuckDB mirror of ``lang_id`` — the marker vote IS pure SQL, so
    the heuristic gets a full value oracle (tie-break priority matches
    the Spark when-chain: en > de > es > fr)."""
    langs = [(l, ms) for l, ms in _LANG_MARKERS.items() if ms]
    vote_exprs = ",\n       ".join(
        "SUM(CASE WHEN term IN ({}) THEN 1 ELSE 0 END) AS v_{}".format(
            ", ".join(f"'{m}'" for m in ms), lang
        )
        for lang, ms in langs
    )
    best = "GREATEST({})".format(", ".join(f"v_{lang}" for lang, _ in langs))
    tie = "\n            ".join(
        f"WHEN v_{lang} = {best} THEN '{lang}'" for lang, _ in langs
    )
    return f"""{_TOKS_SQL}, votes AS (
  SELECT doc_id,
       {vote_exprs}
  FROM toks_f GROUP BY doc_id
), ar AS (
  SELECT doc_id,
         strlen(regexp_replace(text, '[^\\x00-\\x7F]', '', 'g'))::DOUBLE
           / GREATEST(strlen(text), 1) AS ascii_ratio
  FROM documents
)
SELECT v.doc_id,
       CASE WHEN ar.ascii_ratio < 0.6 THEN 'zh'
            WHEN {best} = 0 THEN 'unknown'
            {tie}
            ELSE 'unknown' END AS lang_pred
FROM votes v JOIN ar ON v.doc_id = ar.doc_id
ORDER BY v.doc_id"""


def decontaminate(
    docs: DataFrame,
    bench_docs: DataFrame | None = None,
    n: int = 3,
    threshold: float = 0.2,
    bench_mod: int = DEFAULT_BENCH_MOD,
    broadcast_bench: bool | None = None,
) -> DataFrame:
    """Benchmark decontamination: flag training docs whose n-gram
    shingle overlap with an eval/benchmark set reaches ``threshold``.

    (doc_id, n_sh, n_hit, overlap) for flagged docs — an LLM pipeline
    drops (or audits) these before training so eval answers don't leak
    into the train split. ``bench_docs`` defaults to a deterministic
    synthetic eval slice (doc_id % bench_mod == 0), which the sandbox
    uses in place of external benchmark data; production passes the
    real eval set.

    Plan (100 TB shape): with an EXPLICIT ``bench_docs`` (a real eval
    set — tiny by construction) the bench shingle set is BROADCAST, so
    the corpus-side shingle stream gets a map-side hash probe (no
    shuffle of corpus shingles against the bench side) and per-doc
    n_sh/n_hit fold into ONE groupBy(doc_id) shuffle. The DEFAULT
    synthetic modulo slice is 1/bench_mod of the corpus — corpus-scale
    at 100 TB — so it must NOT funnel through the driver: the train
    side becomes a plain complement filter (no join at all) and the
    shingle probe a shuffle join. ``broadcast_bench`` overrides the
    auto policy (None = broadcast iff bench_docs was passed).
    """
    from open_source_search_engine_spark.operators.dedup import _shingles

    if broadcast_bench is None:
        broadcast_bench = bench_docs is not None
    if bench_docs is None:
        bench_docs = docs.filter(F.col("doc_id") % bench_mod == 0)
        # complement of the modulo slice — a filter, not an anti-join
        train = docs.filter(F.col("doc_id") % bench_mod != 0)
    else:
        bench_ids = bench_docs.select("doc_id")
        train = docs.join(
            F.broadcast(bench_ids) if broadcast_bench else bench_ids,
            "doc_id",
            "left_anti",
        )
    bsh = _shingles(bench_docs, n).select("shingle").distinct().withColumn("hit", F.lit(1))
    agg = (
        _shingles(train, n)
        .join(F.broadcast(bsh) if broadcast_bench else bsh, "shingle", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_sh"),
            F.count("hit").alias("n_hit"),
        )
        .withColumn(
            "overlap", F.round(F.col("n_hit").cast("double") / F.col("n_sh"), 5)
        )
    )
    return agg.filter(F.col("overlap") >= threshold).orderBy("doc_id")


def decontaminate_sql(n: int = 3, threshold: float = 0.2, bench_mod: int = DEFAULT_BENCH_MOD) -> str:
    from open_source_search_engine_spark.operators.dedup import _SHINGLES_SQL

    assert n == 3, "SQL oracle is pinned to 3-gram shingles"
    return f"""{_SHINGLES_SQL}, bench AS (
  SELECT DISTINCT shingle FROM sh WHERE doc_id % {bench_mod} = 0
), train AS (
  SELECT doc_id, shingle FROM sh WHERE doc_id % {bench_mod} <> 0
), agg AS (
  SELECT t.doc_id, COUNT(*)::BIGINT AS n_sh, COUNT(b.shingle)::BIGINT AS n_hit
  FROM train t LEFT JOIN bench b USING (shingle)
  GROUP BY t.doc_id
)
SELECT doc_id, n_sh, n_hit, ROUND(n_hit::DOUBLE / n_sh, 5) AS overlap
FROM agg WHERE ROUND(n_hit::DOUBLE / n_sh, 5) >= {threshold}
ORDER BY doc_id"""


def driver_queries():
    return {
        "token_counts": lambda s, d: token_counts(_docs(s, d)),
        "token_counts_bpe": lambda s, d: token_counts_bpe(_docs(s, d)),
        "text_quality": lambda s, d: text_quality(_docs(s, d)),
        "doc_fingerprint": lambda s, d: doc_fingerprint(_docs(s, d)),
        "lang_id_heuristic": lambda s, d: lang_id(_docs(s, d)),
        "decontaminate": lambda s, d: decontaminate(_docs(s, d)),
    }


def driver_oracles():
    return {
        "token_counts": token_counts_sql(),
        "token_counts_bpe": token_counts_bpe_sql(),
        "text_quality": text_quality_sql(),
        "doc_fingerprint": doc_fingerprint_sql(),
        "lang_id_heuristic": lang_id_sql(),
        "decontaminate": decontaminate_sql(),
    }


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")
