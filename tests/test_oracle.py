"""Pinned BM25 oracle cross-checked against an independent pandas
implementation and DuckDB SQL on the driver's documents fixture
(SURVEY.md §5.2). The driver runs the full 25-query contract; here we
keep a fast representative slice so `pytest -x -q` stays green-or-dead.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import pytest

from open_source_search_engine_spark.operators import bm25
from open_source_search_engine_spark.plans import oracle_sql as osql

K1, B = 1.2, 0.75


def _pandas_bm25(docs_pdf: pd.DataFrame, terms: list[str], k: int, mode: str) -> pd.DataFrame:
    toks = docs_pdf.assign(toks=docs_pdf["text"].str.lower().str.split())
    n = len(toks)
    avgdl = toks["toks"].str.len().mean()
    rows = []
    dfs = {
        t: sum(t in set(ts) for ts in toks["toks"]) for t in terms
    }
    for _, r in toks.iterrows():
        tl = r["toks"]
        dl = len(tl)
        score, hit = 0.0, 0
        for t in sorted(set(terms)):
            tf = tl.count(t)
            if tf == 0:
                continue
            hit += 1
            idf = math.log((n - dfs[t] + 0.5) / (dfs[t] + 0.5) + 1)
            score += idf * tf * (K1 + 1) / (tf + K1 * (1 - B + B * dl / avgdl))
        if hit == 0:
            continue
        if mode == "and" and hit < len(set(terms)):
            continue
        rows.append((r["doc_id"], score))
    out = pd.DataFrame(rows, columns=["doc_id", "score"])
    out = out.sort_values(["score", "doc_id"], ascending=[False, True]).head(k)
    return out.reset_index(drop=True)


@pytest.mark.parametrize(
    "terms,mode",
    [(["join", "hash"], "and"), (["dup", "merge"], "or"), (["key"], "and")],
)
def test_bm25_oracle_vs_pandas(spark, docs_001, terms, mode):
    got = bm25.bm25_topk_oracle(docs_001, terms, k=10, mode=mode).toPandas()
    want = _pandas_bm25(docs_001.toPandas(), terms, k=10, mode=mode)
    assert list(got["doc_id"]) == list(want["doc_id"])
    assert got["score"].round(5).tolist() == want["score"].round(5).tolist()


def test_bm25_oracle_vs_duckdb(spark, docs_001):
    sql = osql.bm25_topk_sql(["join", "hash"], k=10, mode="and")
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    )
    want = con.execute(sql).df()
    got = bm25.bm25_topk_oracle(docs_001, ["join", "hash"], k=10).toPandas()
    got.columns = [c.lower() for c in got.columns]
    want.columns = [c.lower() for c in want.columns]
    assert list(got["doc_id"]) == list(want["doc_id"])
    assert got["score"].round(5).tolist() == want["score"].round(5).tolist()
