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
) -> DataFrame:
    """(doc_id, pos, term) — one row per token occurrence."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokens_col(F.col(text_col), mode=mode)).alias("pos", "term"),
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


def fast_postings(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    mode: str = "simple",
) -> DataFrame:
    """(term, doc_id, tf, term_id) — the BUILD-path postings producer.

    Where the algebra path ships every token occurrence through Arrow
    and shuffles it into groupBy(term, doc_id) (XmlDoc::hashAll one key
    per occurrence), this one aggregates tf inside the tokenizer batch
    (pandas C groupby) and emits pre-aggregated rows from mapInPandas:
    ~3.5× less Arrow traffic at our token/doc ratio and ZERO shuffle —
    tf per (doc, term) is complete within the doc's batch, the map-side
    combine taken to its limit. Must stay row-identical to
    ``build_postings(..., with_positions=False)`` (tested).
    """
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from open_source_search_engine_spark.functions.tokenizer import (
        _code_tokenize_series,
    )

    def it(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            text = pdf[text_col].fillna("")
            if mode == "code":
                toks = _code_tokenize_series(text, lowercase=True)
            elif mode == "simple":
                toks = text.str.lower().str.split()
            else:  # pragma: no cover
                raise ValueError(f"unknown tokenizer mode: {mode}")
            lens = toks.str.len().to_numpy()
            if lens.sum() == 0:
                continue
            flat = pd.DataFrame(
                {
                    "doc_id": pdf[id_col].to_numpy().repeat(lens),
                    "term": np.concatenate([np.asarray(t, dtype=object) for t in toks]),
                }
            )
            out = (
                flat.groupby(["doc_id", "term"], sort=False)
                .size()
                .reset_index(name="tf")
            )
            out["tf"] = out["tf"].astype("int32")
            yield out[["term", "doc_id", "tf"]]

    posts = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col)).mapInPandas(
        it, "term string, doc_id long, tf int"
    )
    return posts.withColumn("term_id", term_id_col(F.col("term")))
