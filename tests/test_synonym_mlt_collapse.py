"""SynonymQuery blending (query/synonym.py), more_like_this (query/mlt.py),
and field collapsing (query/collapse.py)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from neural_search_spark.index.build import build_index_tables
from neural_search_spark.query.collapse import collapse_topk
from neural_search_spark.query.dsl import QueryEngine, QueryValidationError
from neural_search_spark.query.mlt import mlt_score_all, mlt_select_terms, mlt_topk
from neural_search_spark.query.synonym import synonym_score_all, synonym_topk

DOCS = [
    (0, "fast quick slow", "s0"),
    (1, "fast fast lazy", "s0"),
    (2, "quick quick quick lazy", "s1"),
    (3, "slow slow", "s1"),
    (4, "lazy", "s2"),
]
N, DLS = 5, {0: 3, 1: 3, 2: 4, 3: 2, 4: 1}
AVGDL = sum(DLS.values()) / N
DF = {"fast": 2, "quick": 2, "slow": 2, "lazy": 3}


def _idf(df):
    return math.log(1 + (N - df + 0.5) / (df + 0.5))


def _tfn(tf, dl):
    return tf / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / AVGDL))


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "docID long, text string, source string").persist()


@pytest.fixture(scope="module")
def tabs(docs):
    return build_index_tables(docs)


def test_synonym_blended_stats(tabs):
    # group {fast, quick}: df = max(2, 2) = 2; tf sums within a doc
    got = {
        r.docID: r.score
        for r in synonym_score_all(
            tabs.postings, tabs.doclens, tabs.term_stats, tabs.meta, [["fast", "quick"]]
        ).collect()
    }
    exp = {
        0: _idf(2) * _tfn(2, 3),  # fast + quick
        1: _idf(2) * _tfn(2, 3),  # fast×2
        2: _idf(2) * _tfn(3, 4),  # quick×3
    }
    assert set(got) == set(exp)
    for d in exp:
        assert got[d] == pytest.approx(exp[d], abs=1e-12)


def test_synonym_multi_group_and_boosts(tabs):
    got = {
        r.docID: r.score
        for r in synonym_score_all(
            tabs.postings, tabs.doclens, tabs.term_stats, tabs.meta,
            [["fast", "quick"], ["lazy"]], boosts=[1.0, 2.0],
        ).collect()
    }
    exp = {
        0: _idf(2) * _tfn(2, 3),
        1: _idf(2) * _tfn(2, 3) + 2.0 * _idf(3) * _tfn(1, 3),
        2: _idf(2) * _tfn(3, 4) + 2.0 * _idf(3) * _tfn(1, 4),
        4: 2.0 * _idf(3) * _tfn(1, 1),
    }
    assert set(got) == set(exp)
    for d in exp:
        assert got[d] == pytest.approx(exp[d], abs=1e-12)
    # blended df differs from scoring the synonyms independently: a group
    # with one rare + one common member uses the COMMON member's df
    blended = {
        r.docID: r.score
        for r in synonym_score_all(
            tabs.postings, tabs.doclens, tabs.term_stats, tabs.meta, [["fast", "lazy"]]
        ).collect()
    }
    assert blended[1] == pytest.approx(_idf(3) * _tfn(3, 3), abs=1e-12)  # df=max(2,3)=3


def test_synonym_validation_and_unindexed(tabs, docs):
    with pytest.raises(ValueError):
        synonym_score_all(tabs.postings, tabs.doclens, tabs.term_stats, tabs.meta, [[]])
    with pytest.raises(ValueError):
        synonym_score_all(
            tabs.postings, tabs.doclens, tabs.term_stats, tabs.meta,
            [["fast"], ["fast", "quick"]],
        )
    # all-unindexed group contributes nothing; fully-unindexed query → empty
    assert (
        synonym_score_all(
            tabs.postings, tabs.doclens, tabs.term_stats, tabs.meta, [["zzz"]]
        ).count()
        == 0
    )
    got = synonym_topk(
        tabs.postings, tabs.doclens, tabs.term_stats, tabs.meta,
        [["fast", "quick"], ["zzz"]], k=2,
    ).collect()
    assert [r.docID for r in got] == [2, 0]  # tfn(3,4) > tfn(2,3); doc0 < doc1 tie


def test_synonym_dsl_kind(tabs, docs):
    eng = QueryEngine(tables=tabs, docs=docs)
    r = eng.search(
        {"synonym": {"field": "text", "groups": [["fast", "quick"]], "boost": 2.0}}, k=3
    ).collect()
    assert r[0].score == pytest.approx(2 * _idf(2) * _tfn(3, 4), abs=1e-12)


def test_mlt_term_selection_gates(tabs):
    # like doc2 ("quick quick quick lazy"): tf(quick)=3 tf(lazy)=1
    # min_term_freq=2 drops lazy; min_doc_freq=3 would drop quick (df=2)
    sel = mlt_select_terms(
        tabs.postings, tabs.term_stats, tabs.meta, [2], min_term_freq=2, min_doc_freq=1
    )
    assert sel == ["quick"]
    assert (
        mlt_select_terms(
            tabs.postings, tabs.term_stats, tabs.meta, [2],
            min_term_freq=2, min_doc_freq=3,
        )
        == []
    )
    # multi-like sums tfs: docs 0+1 give fast tf=3, quick/slow/lazy tf=1
    sel2 = mlt_select_terms(
        tabs.postings, tabs.term_stats, tabs.meta, [0, 1],
        min_term_freq=2, min_doc_freq=1,
    )
    assert sel2 == ["fast"]
    # interestingness ordering: mtf=1, all terms of doc0 qualify; idf(lazy)
    # is lowest so with max_query_terms=2 the rarer pair (tie → term asc)
    sel3 = mlt_select_terms(
        tabs.postings, tabs.term_stats, tabs.meta, [0],
        min_term_freq=1, min_doc_freq=1, max_query_terms=2,
    )
    assert sel3 == ["fast", "quick"]
    with pytest.raises(ValueError):
        mlt_select_terms(tabs.postings, tabs.term_stats, tabs.meta, [])


def test_mlt_scores_and_exclusion(tabs, docs):
    # like doc2 → query {quick}; doc2 itself excluded by default
    got = {
        r.docID: r.score
        for r in mlt_score_all(
            tabs.postings, tabs.doclens, tabs.term_stats, tabs.meta, [2],
            min_term_freq=2, min_doc_freq=1,
        ).collect()
    }
    assert set(got) == {0}
    assert got[0] == pytest.approx(_idf(2) * _tfn(1, 3), abs=1e-12)
    inc = mlt_score_all(
        tabs.postings, tabs.doclens, tabs.term_stats, tabs.meta, [2],
        min_term_freq=2, min_doc_freq=1, include=True,
    )
    assert {r.docID for r in inc.collect()} == {0, 2}
    top = mlt_topk(
        tabs.postings, tabs.doclens, tabs.term_stats, tabs.meta, [2],
        k=5, min_term_freq=2, min_doc_freq=1,
    ).collect()
    assert [r.docID for r in top] == [0]
    # DSL kind
    eng = QueryEngine(tables=tabs, docs=docs)
    r = eng.search(
        {"more_like_this": {"field": "text", "like": [2],
                            "min_term_freq": 2, "min_doc_freq": 1}}, k=5
    ).collect()
    assert [x.docID for x in r] == [0]


def test_collapse_winners_and_inner_hits(spark, tabs, docs):
    scored = spark.createDataFrame(
        [(0, 3.0), (1, 2.0), (2, 5.0), (3, 1.0), (4, 4.0)], "docID long, score double"
    )
    got = collapse_topk(scored, docs, "source", k=2).collect()
    # winners: s1→doc2 (5.0), s2→doc4 (4.0), s0→doc0 (3.0); k=2 groups
    assert [(r.rank, r.docID, r.source) for r in got] == [(1, 2, "s1"), (2, 4, "s2")]
    # inner_hits=2 keeps runner-up within each kept group
    got2 = collapse_topk(scored, docs, "source", k=2, inner_hits=2).collect()
    assert [(r.rank, r.docID, r.group_rank) for r in got2] == [
        (1, 2, 1), (2, 3, 2), (3, 4, 1)
    ]
    with pytest.raises(ValueError):
        collapse_topk(scored, docs, "source", inner_hits=0)


def test_collapse_via_search(tabs, docs):
    eng = QueryEngine(tables=tabs, docs=docs)
    r = eng.search({"match": {"text": "fast quick slow lazy"}}, k=3, collapse="source").collect()
    assert len(r) == 3
    assert len({x.source for x in r}) == 3  # one winner per source
    with pytest.raises(QueryValidationError):
        eng.search({"match": {"text": "fast"}}, collapse="nope")
    with pytest.raises(QueryValidationError):
        eng.search({"match": {"text": "fast"}}, collapse="source", sort=[("source", "asc")])


def test_msearch_batched_and_fallback(tabs, docs):
    eng = QueryEngine(tables=tabs, docs=docs)
    qs = [
        {"match": {"text": "fast quick"}},
        {"term": {"text": {"value": "lazy", "boost": 2.0}}},
        {"match": {"text": {"query": "slow slow", "boost": 0.5}}},
    ]
    got = [
        (r.query_id, r.rank, r.docID, r.score)
        for r in eng.msearch(qs, k=3).orderBy("query_id", "rank").collect()
    ]
    exp = []
    for qid, q in enumerate(qs):
        for r in eng.search(q, k=3).collect():
            exp.append((qid, r.rank, r.docID, r.score))
    assert [(a, b, c) for a, b, c, _ in got] == [(a, b, c) for a, b, c, _ in exp]
    for (_, _, _, s1), (_, _, _, s2) in zip(got, exp):
        assert s1 == pytest.approx(s2, abs=1e-12)
    # mixed batch (synonym is not batchable) falls back, same contract
    qs2 = [{"match": {"text": "fast"}},
           {"synonym": {"field": "text", "groups": [["fast", "quick"]]}}]
    got2 = eng.msearch(qs2, k=2).orderBy("query_id", "rank").collect()
    assert {r.query_id for r in got2} == {0, 1}
    with pytest.raises(QueryValidationError):
        eng.msearch([])


def test_rescore_window(tabs, docs):
    eng = QueryEngine(tables=tabs, docs=docs)
    primary = {r.docID: r.score for r in
               eng.search({"match": {"text": "fast quick slow lazy"}}, k=5).collect()}
    sec = {r.docID: r.score for r in eng.search({"term": {"text": "lazy"}}, k=5).collect()}
    got = eng.search(
        {"match": {"text": "fast quick slow lazy"}}, k=3,
        rescore={"window_size": 3, "query": {"term": {"text": "lazy"}},
                 "query_weight": 0.5, "rescore_query_weight": 2.0,
                 "score_mode": "total"},
    ).collect()
    window = sorted(primary.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    exp = sorted(
        ((d, 0.5 * p + 2.0 * sec[d] if d in sec else 0.5 * p) for d, p in window),
        key=lambda kv: (-kv[1], kv[0]),
    )
    assert [(r.docID, r.score) for r in got] == [
        (d, pytest.approx(s, abs=1e-12)) for d, s in exp
    ]
    # multiply mode: matching window docs multiply, non-matching keep primary
    p_slow = {r.docID: r.score for r in eng.search({"match": {"text": "slow"}}, k=5).collect()}
    got_m = {r.docID: r.score for r in eng.search(
        {"match": {"text": "slow"}}, k=2,
        rescore={"window_size": 2, "query": {"term": {"text": "lazy"}},
                 "score_mode": "multiply"},
    ).collect()}
    win_m = sorted(p_slow.items(), key=lambda kv: (-kv[1], kv[0]))[:2]
    for d, p in win_m:
        exp_m = p * sec[d] if d in sec else p
        assert got_m[d] == pytest.approx(exp_m, abs=1e-12)
    # validation
    with pytest.raises(QueryValidationError):
        eng.search({"match": {"text": "fast"}}, k=5,
                   rescore={"window_size": 3, "query": {"term": {"text": "lazy"}}})
    with pytest.raises(QueryValidationError):
        eng.search({"match": {"text": "fast"}}, k=1, sort=[("source", "asc")],
                   rescore={"window_size": 3, "query": {"term": {"text": "lazy"}}})
    with pytest.raises(QueryValidationError):
        eng.search({"match": {"text": "fast"}}, k=1,
                   rescore={"window_size": 3, "query": {"term": {"text": "lazy"}},
                            "score_mode": "nope"})
