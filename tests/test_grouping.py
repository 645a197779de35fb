"""Group-level retrieval (conversation ranking) vs a pure-Python oracle:
combine per-turn BM25 scores per conv_id under each ScoreMode."""

from __future__ import annotations

import pytest

from neural_search_spark.query.dsl import QueryValidationError
from neural_search_spark.query.grouping import group_topk

from tests import oracle

QTERMS = {"merge": 1.0, "sort": 1.0}
Q = {"match": {"text": {"query": "merge sort"}}}


def _expected_groups(transcripts, mode):
    rows = transcripts.select("docID", "conv_id", "text").collect()
    docs = {r["docID"]: r["text"] for r in rows}
    conv_of = {r["docID"]: r["conv_id"] for r in rows}
    scores = oracle.bm25_scores(docs, QTERMS)
    by_conv: dict[str, list[float]] = {}
    for d, s in scores.items():
        by_conv.setdefault(conv_of[d], []).append(s)
    comb = {"max": max, "sum": sum, "min": min,
            "avg": lambda v: sum(v) / len(v), "none": lambda v: 1.0}[mode]
    return {c: (comb(v), len(v)) for c, v in by_conv.items()}


@pytest.mark.parametrize("mode", ["max", "sum", "avg", "min", "none"])
def test_group_topk_score_modes(engine, transcripts, mode):
    exp = _expected_groups(transcripts, mode)
    got = engine.search_groups(Q, by="conv_id", k=len(exp), score_mode=mode)
    rows = got.collect()
    assert {r["conv_id"]: (r["score"], r["n_hits"]) for r in rows} == {
        c: (pytest.approx(s, rel=1e-9), n) for c, (s, n) in exp.items()
    }
    # deterministic order: score desc, conv_id asc
    ordered = sorted(exp.items(), key=lambda t: (-round(t[1][0], 12), t[0]))
    assert [r["conv_id"] for r in sorted(rows, key=lambda r: r["rank"])] == [
        c for c, _ in ordered
    ]


def test_group_topk_inner_hits(engine, transcripts):
    rows = transcripts.select("docID", "conv_id", "text").collect()
    docs = {r["docID"]: r["text"] for r in rows}
    conv_of = {r["docID"]: r["conv_id"] for r in rows}
    scores = oracle.bm25_scores(docs, QTERMS)
    got = engine.search_groups(Q, by="conv_id", k=3, score_mode="sum", inner_hits=2)
    by_group: dict[str, list] = {}
    for r in sorted(got.collect(), key=lambda r: (r["rank"], r["hit_rank"])):
        by_group.setdefault(r["conv_id"], []).append(r)
    for conv, hits in by_group.items():
        members = sorted(
            ((d, s) for d, s in scores.items() if conv_of[d] == conv),
            key=lambda t: (-round(t[1], 12), t[0]),
        )[:2]
        assert [(h["docID"], pytest.approx(h["hit_score"], rel=1e-9)) for h in hits] == [
            (d, pytest.approx(s, rel=1e-9)) for d, s in members
        ]
    assert len(by_group) == 3


def test_group_topk_validation(engine):
    with pytest.raises(QueryValidationError):
        engine.search_groups(Q, by="nope")
    with pytest.raises(QueryValidationError):
        engine.search_groups(Q, by="conv_id", score_mode="geometric")
    with pytest.raises(QueryValidationError):
        engine.search_groups({"hybrid": {"queries": [Q]}}, by="conv_id")
    with pytest.raises(ValueError):
        group_topk(None, None, "x", inner_hits=-1)
