"""Posting construction — reference: XmlDoc.cpp hashAll/getMetaList
building posdb keys (one key per word occurrence, Posdb.cpp makeKey;
SURVEY.md §3.2).

Pure DataFrame algebra: tokenize → posexplode → groupBy(doc, term).
tf is the occurrence count (the reference encodes it as the run-length
of half-keys per (term,doc)); positions are kept for phrase/proximity
ops (§2.8 X4, §2.5 W3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from open_source_search_engine_spark.functions.hashing import term_id_col
from open_source_search_engine_spark.functions.tokenizer import tokens_col


def doc_tokens(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    mode: str = "simple",
    stopwords: frozenset | tuple = (),
) -> DataFrame:
    """(doc_id, pos, term) — one row per token occurrence. ``pos`` is
    the position AFTER stopword removal (the reference also assigns
    posdb positions over the kept word stream)."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(
            tokens_col(F.col(text_col), mode=mode, stopwords=stopwords)
        ).alias("pos", "term"),
    )


def postings(tokens: DataFrame, with_positions: bool = True) -> DataFrame:
    """(term, term_id, doc_id, tf[, positions sorted asc])."""
    aggs = [F.count(F.lit(1)).cast("int").alias("tf")]
    if with_positions:
        aggs.append(F.sort_array(F.collect_list("pos")).alias("positions"))
    out = tokens.groupBy("term", "doc_id").agg(*aggs)
    return out.withColumn("term_id", term_id_col(F.col("term")))


def build_postings(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    mode: str = "simple",
    with_positions: bool = True,
) -> DataFrame:
    return postings(doc_tokens(docs, text_col, id_col, mode), with_positions)


def staged_postings(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    mode: str = "simple",
    stopwords: frozenset | tuple = (),
) -> DataFrame:
    """Union-layout build intermediate: ONE tokenizer pass emits both
    posting rows and per-doc meta rows in a single schema

        posting row:  (term, doc_id, tf>0, doc_len, sha=NULL, pos_blob)
        meta row:     (term=NULL, doc_id, tf=0, doc_len, sha, pos_blob=NULL)

    so the whole build needs exactly one pass over the raw text and
    doc_meta becomes a FILTER of the staged output — no groupBy, no
    join back to the source table (the reference indexes a doc once in
    XmlDoc::indexDoc and emits posdb keys + the TitleRec from the same
    parse — SURVEY.md §3.2; this is that shape). sha256 is computed
    JVM-side (F.sha2) and passed through the tokenizer batch untouched;
    it rides on the ~n_docs meta rows only, not on postings.

    ``pos_blob`` is the posting's token positions, delta+varint encoded
    SELF-CONTAINED per posting (codec.positions_encode) — the
    reference's posdb key is positional, one key per occurrence
    (Posdb.h key layout, SURVEY.md §1.3); we carry the occurrence
    positions as a compact per-posting blob instead, which the segment
    encoder concatenates per block without re-encoding.

    In-batch grouping is pure numpy (factorize + lexsort + boundary
    scan) — no pandas groupby, no per-row Python."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from open_source_search_engine_spark.functions.codec import positions_encode
    from open_source_search_engine_spark.functions.tokenizer import (
        _code_tokenize_series,
        _drop_stopwords,
    )

    stop = tuple(sorted(stopwords))

    def it(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            text = pdf["__text"].fillna("")
            if mode == "code":
                toks = _code_tokenize_series(text, lowercase=True, stopwords=stop)
            elif mode == "simple":
                toks = text.str.lower().str.split()
                if stop:
                    toks = _drop_stopwords(toks, stop)
            else:  # pragma: no cover
                raise ValueError(f"unknown tokenizer mode: {mode}")
            lens = toks.str.len().to_numpy(np.int64)
            ids = pdf["doc_id"].to_numpy(np.int64)
            meta = pd.DataFrame(
                {
                    "term": pd.Series([None] * len(pdf), dtype=object),
                    "doc_id": ids,
                    "tf": np.zeros(len(pdf), dtype="int32"),
                    "doc_len": lens.astype("int32"),
                    "sha": pdf["__sha"].to_numpy(),
                    "pos_blob": pd.Series([None] * len(pdf), dtype=object),
                }
            )
            total = int(lens.sum())
            if total == 0:
                yield meta
                continue
            flat_doc = ids.repeat(lens)
            flat_term = np.concatenate([np.asarray(t, dtype=object) for t in toks])
            # token position within its doc (post-stopword stream)
            doc_starts = np.cumsum(lens) - lens
            flat_pos = np.arange(total, dtype=np.int64) - doc_starts.repeat(lens)
            # group to (doc, term) postings: factorize terms, lexsort,
            # boundary scan — positions stay ascending within a group
            # because the sort is stable on flat_pos last key
            codes, uniq = pd.factorize(flat_term, sort=False)
            order = np.lexsort((flat_pos, codes, flat_doc))
            fd, fc, fp = flat_doc[order], codes[order], flat_pos[order]
            new_g = np.empty(total, dtype=bool)
            new_g[0] = True
            new_g[1:] = (fd[1:] != fd[:-1]) | (fc[1:] != fc[:-1])
            g_starts = np.flatnonzero(new_g)
            g_ends = np.concatenate((g_starts[1:], [total]))
            tf = (g_ends - g_starts).astype(np.int64)
            pbuf, poffs = positions_encode(fp, tf)
            out = pd.DataFrame(
                {
                    "term": np.asarray(uniq, dtype=object)[fc[g_starts]],
                    "doc_id": fd[g_starts],
                    "tf": tf.astype("int32"),
                    "doc_len": pd.Series(lens, index=ids)
                    .reindex(fd[g_starts])
                    .to_numpy()
                    .astype("int32"),
                    "sha": pd.Series([None] * g_starts.size, dtype=object),
                    "pos_blob": [
                        pbuf[poffs[i] : poffs[i + 1]] for i in range(g_starts.size)
                    ],
                }
            )
            yield pd.concat([out, meta], ignore_index=True)

    sel = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("__text"),
        F.sha2(F.col(text_col).cast("binary"), 256).alias("__sha"),
    )
    staged = sel.mapInPandas(
        it, "term string, doc_id long, tf int, doc_len int, sha string, pos_blob binary"
    )
    return staged.withColumn("term_id", term_id_col(F.col("term")))


def fast_postings(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    mode: str = "simple",
    stopwords: frozenset | tuple = (),
) -> DataFrame:
    """(term, doc_id, tf, doc_len, term_id) — posting rows only.

    Where the algebra path ships every token occurrence through Arrow
    and shuffles it into groupBy(term, doc_id) (XmlDoc::hashAll one key
    per occurrence), staged_postings aggregates tf inside the tokenizer
    batch (pandas C groupby) and emits pre-aggregated rows from
    mapInPandas: ~3.5× less Arrow traffic at our token/doc ratio and
    ZERO shuffle — tf per (doc, term) is complete within the doc's
    batch, the map-side combine taken to its limit. ``doc_len``
    (BM25's dl) rides along on every posting row, so scoring needs NO
    doc_id join back to doc_meta (the reference analog is posdb keys
    carrying precomputed per-doc ranks, Posdb.h key layout,
    SURVEY.md §1.3). Must stay row-identical to
    ``build_postings(..., with_positions=False)`` on
    (term, doc_id, tf) (tested).
    """
    return (
        staged_postings(docs, text_col, id_col, mode, stopwords)
        .filter(F.col("tf") > 0)
        .drop("sha")
    )
