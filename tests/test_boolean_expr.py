"""Nested boolean expression parser + evaluators (SURVEY.md §2.2 F5;
Query.cpp Expression::isTruth)."""

from __future__ import annotations

import pytest

from open_source_search_engine_spark.plans import boolean_expr as B


def test_parse_shapes():
    ast = B.parse("(a OR b) AND NOT (c OR d)")
    assert ast.op == "and"
    assert ast.children[0].op == "or"
    assert ast.children[1].op == "not"
    assert ast.children[1].children[0].op == "or"
    assert B.terms_of(ast) == ["a", "b", "c", "d"]

    # precedence: AND binds tighter than OR
    ast2 = B.parse("a OR b AND c")
    assert ast2.op == "or"
    assert ast2.children[1].op == "and"

    # keywords case-insensitive; terms lowercased
    ast3 = B.parse("Foo and not Bar")
    assert ast3.op == "and"
    assert ast3.children[0].term == "foo"
    assert ast3.children[1].children[0].term == "bar"


@pytest.mark.parametrize("bad", ["(a OR b", "a AND", "AND a", "a )", "", "( )"])
def test_parse_errors(bad):
    with pytest.raises(ValueError):
        B.parse(bad)


def test_evaluate_tiny(spark):
    docs = spark.createDataFrame(
        [
            (0, "a b"),
            (1, "a c"),
            (2, "b c"),
            (3, "c d"),
            (4, "a b c d"),
        ],
        "doc_id long, text string",
    )

    def ids(q):
        return [r["doc_id"] for r in B.evaluate(docs, q).collect()]

    assert ids("a AND b") == [0, 4]
    assert ids("a OR d") == [0, 1, 3, 4]
    assert ids("NOT a") == [2, 3]
    assert ids("(a OR b) AND NOT (c OR d)") == [0]
    assert ids("(a AND c) OR (b AND NOT d)") == [0, 1, 2, 4]
    assert ids("NOT (a OR b OR c OR d)") == []
    # unknown term: empty set; NOT unknown = universe
    assert ids("zzz") == []
    assert ids("NOT zzz") == [0, 1, 2, 3, 4]
    assert ids("a AND NOT zzz") == [0, 1, 4]


def test_evaluate_indexed_matches_corpus(spark, tiny_corpus, tmp_path_factory):
    from open_source_search_engine_spark.index import builder
    from tests.conftest import TEST_CFG

    d = tmp_path_factory.mktemp("idx_bool") / "idx"
    builder.build_index(
        spark, tiny_corpus, d, cfg=TEST_CFG, text_col="content", tokenizer_mode="code"
    )
    for q in [
        "(index OR merge) AND NOT (hash OR join)",
        "scan AND (key OR merge) AND NOT def",
        "NOT (index AND merge)",
    ]:
        want = [
            r["doc_id"]
            for r in B.evaluate(
                tiny_corpus, q, text_col="content", tokenizer_mode="code"
            ).collect()
        ]
        got = [r["doc_id"] for r in B.evaluate_indexed(spark, d, q).collect()]
        assert got == want, q
