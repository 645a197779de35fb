"""ids / exists query kinds (constant-score membership filters)."""

from __future__ import annotations

import pytest

from neural_search_spark.query.dsl import QueryValidationError


def test_ids_query(engine, transcripts):
    want = [r["docID"] for r in transcripts.select("docID").limit(5).collect()]
    hits = engine.search({"ids": {"values": want}}, k=100).collect()
    assert sorted(r["docID"] for r in hits) == sorted(want)
    assert all(r["score"] == 1.0 for r in hits)


def test_ids_in_bool_must_not(engine, transcripts):
    n = transcripts.count()
    some = [r["docID"] for r in transcripts.select("docID").limit(3).collect()]
    q = {"bool": {"must": [{"match_all": {}}], "must_not": [{"ids": {"values": some}}]}}
    hits = engine.search(q, k=n + 10).collect()
    assert len(hits) == n - 3
    assert not set(some) & {r["docID"] for r in hits}


def test_exists_query(engine, transcripts):
    # transcripts 'tool' column is null for some roles
    n_tool = transcripts.where("tool is not null").count()
    n_all = transcripts.count()
    assert 0 < n_tool < n_all
    hits = engine.search({"exists": {"field": "tool"}}, k=n_all + 1).collect()
    assert len(hits) == n_tool


def test_exists_unknown_field(engine):
    with pytest.raises(QueryValidationError):
        engine.search({"exists": {"field": "nope_col"}}, k=5).collect()


def test_range_query_kind(engine, transcripts):
    """Top-level range query (RangeQueryBuilder): filter context,
    constant score × boost."""
    exp = {r["docID"] for r in transcripts.where("turn_idx >= 3 and turn_idx < 5").collect()}
    hits = engine.search(
        {"range": {"turn_idx": {"gte": 3, "lt": 5, "boost": 2.0}}}, k=len(exp) + 10
    ).collect()
    assert {r["docID"] for r in hits} == exp
    assert all(r["score"] == 2.0 for r in hits)
    with pytest.raises(QueryValidationError, match="unknown range"):
        engine.search({"range": {"turn_idx": {"between": [1, 2]}}}, k=5).collect()
    with pytest.raises(QueryValidationError, match="unknown range field"):
        engine.search({"range": {"nope": {"gte": 1}}}, k=5).collect()


def test_terms_query_kind(engine, transcripts):
    """Top-level terms query (TermsQueryBuilder): field → value list."""
    exp = {r["docID"] for r in transcripts.where("role in ('user','tool')").collect()}
    hits = engine.search({"terms": {"role": ["user", "tool"]}}, k=len(exp) + 10).collect()
    assert {r["docID"] for r in hits} == exp
    assert all(r["score"] == 1.0 for r in hits)
    with pytest.raises(QueryValidationError, match="non-empty"):
        engine.search({"terms": {"role": []}}, k=5).collect()
    # composes in bool.must_not
    q = {"bool": {"must": [{"match_all": {}}], "must_not": [{"terms": {"role": ["user"]}}]}}
    n_user = transcripts.where("role = 'user'").count()
    assert len(engine.search(q, k=10_000).collect()) == transcripts.count() - n_user
