"""simple_query_string parser + engine-equivalence tests: every parsed
query must score identically to its hand-written bool/phrase/prefix
equivalent (those kinds are oracle-pinned elsewhere)."""

from __future__ import annotations

import pytest

from neural_search_spark.query.dsl import QueryEngine, QueryValidationError
from neural_search_spark.query.querystring import parse_simple_query_string


def test_parse_shapes():
    assert parse_simple_query_string("") == {"match_none": {}}
    assert parse_simple_query_string("   ") == {"match_none": {}}
    q = parse_simple_query_string('+spark "merge sort" -dup pre*')
    assert q == {"bool": {
        "must": [{"match": {"text": {"query": "spark"}}}],
        "should": [{"match_phrase": {"text": {"query": "merge sort"}}},
                   {"prefix": {"text": {"value": "pre"}}}],
        "must_not": [{"match": {"text": {"query": "dup"}}}],
    }}
    # default_operator=and promotes plain terms to must
    q2 = parse_simple_query_string("a b", "and")
    assert q2 == {"bool": {"must": [
        {"match": {"text": {"query": "a"}}},
        {"match": {"text": {"query": "b"}}},
    ]}}
    # bare * → match_all clause; empty quotes dropped
    q3 = parse_simple_query_string('* ""')
    assert q3 == {"bool": {"should": [{"match_all": {}}]}}
    with pytest.raises(ValueError):
        parse_simple_query_string("a", "xor")


def _scores(engine, q):
    return {r["docID"]: r["score"] for r in engine._score(q, None).collect()}


def test_simple_query_string_equals_explicit_bool(engine):
    got = _scores(engine, {"simple_query_string": {"query": "merge sort -vector"}})
    want = _scores(engine, {"bool": {
        "should": [{"match": {"text": {"query": "merge"}}},
                   {"match": {"text": {"query": "sort"}}}],
        "must_not": [{"match": {"text": {"query": "vector"}}}],
    }})
    assert got == want and got


def test_simple_query_string_and_operator(engine):
    got = _scores(engine, {"simple_query_string": {"query": "merge sort",
                                                   "default_operator": "and"}})
    want = _scores(engine, {"bool": {"must": [
        {"match": {"text": {"query": "merge"}}},
        {"match": {"text": {"query": "sort"}}},
    ]}})
    assert got == want and got
    # AND is a strict subset of OR's match set
    or_set = set(_scores(engine, {"simple_query_string": {"query": "merge sort"}}))
    assert set(got) < or_set


def test_simple_query_string_prefix_and_phrase(engine, transcripts, index_tables):
    from neural_search_spark.query.phrase import build_positional_postings

    pos = build_positional_postings(transcripts)
    eng = QueryEngine(tables=index_tables, docs=transcripts, positional=pos)
    got = _scores(eng, {"simple_query_string": {"query": '"merge sort" sp*'}})
    want = _scores(eng, {"bool": {"should": [
        {"match_phrase": {"text": {"query": "merge sort"}}},
        {"prefix": {"text": {"value": "sp"}}},
    ]}})
    assert got == want and got
    # phrase clause without a positional index is a validation error
    with pytest.raises(QueryValidationError):
        engine._score({"simple_query_string": {"query": '"merge sort"'}}, None)
    with pytest.raises(QueryValidationError):
        engine._score({"simple_query_string": {"default_operator": "or"}}, None)
