"""Query-string parser goldens (Query.cpp set2 surface, SURVEY §2.2)."""

from __future__ import annotations

from open_source_search_engine_spark.plans.query_language import parse


def test_parse_signs_fields_phrases():
    pq = parse('join +hash -dup lang:en "merge scan" source:s3')
    assert pq.required == ["join", "hash"]
    assert pq.excluded == ["dup"]
    assert pq.filters == {"lang": "en", "source": "s3"}
    assert pq.phrases == [("merge", "scan")]
    # phrase words are scored too, deduped, insertion order
    assert pq.scored_terms == ["join", "hash", "merge", "scan"]


def test_parse_unknown_field_is_term():
    pq = parse("foo:bar")
    assert pq.required == ["foo:bar"]
    assert pq.filters == {}


def test_parse_case_folding_and_empty():
    pq = parse("JOIN +Hash")
    assert pq.required == ["join", "hash"]
    assert parse("").required == []


def test_parse_negative_phrase_kept_as_phrase():
    # sign on a phrase: we treat it as a plain phrase (required);
    # matches Gigablast which applies signs per-term
    pq = parse('-"a b" c')
    assert ("a", "b") in pq.phrases
    assert pq.required == ["c"]
