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
