"""QueryEngine warm-handle path must equal wand_topk exactly."""

from __future__ import annotations

import pandas as pd
import pytest

from open_source_search_engine_spark.index import builder, wand
from open_source_search_engine_spark.index.engine import QueryEngine
from tests.conftest import TEST_CFG


@pytest.fixture(scope="module")
def eng_index(spark, tiny_corpus, tmp_path_factory):
    d = tmp_path_factory.mktemp("engidx") / "main"
    builder.build_index(
        spark, tiny_corpus, d, cfg=TEST_CFG, text_col="content", tokenizer_mode="code"
    )
    return d


def test_engine_matches_wand(spark, eng_index):
    eng = QueryEngine(spark, eng_index)
    try:
        for terms, mode in [
            (["def", "return"], "and"),
            (["dup", "if"], "or"),
            (["scan"], "and"),
            (["zzz_missing", "def"], "and"),
        ]:
            a = eng.topk(terms, k=10, mode=mode).toPandas()
            b = wand.wand_topk(spark, eng_index, terms, k=10, mode=mode).toPandas()
            pd.testing.assert_frame_equal(a, b), (terms, mode)
    finally:
        eng.close()
