"""rank_eval metrics vs hand-computed values on a fixed run/qrels pair,
plus an e2e batch-retrieval → eval pipeline."""

from __future__ import annotations

import math

import pytest

from neural_search_spark.ops.rank_eval import rank_eval, rank_eval_summary


def _dcg(grades):
    return sum((2**g - 1) / math.log2(i + 2) for i, g in enumerate(grades))


def test_rank_eval_hand_computed(spark):
    # q1: ranks 1..4 with grades [2, 0, 1, 0]; judged relevant = {a(2), c(1), x(3)}
    run = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3), (1, 13, 4),
         (2, 20, 1), (2, 21, 2)],
        "query_id int, docID long, rank int",
    )
    qrels = spark.createDataFrame(
        [(1, 10, 2), (1, 12, 1), (1, 99, 3),
         (2, 77, 1)],  # q2 retrieved nothing relevant
        "query_id int, docID long, grade int",
    )
    out = {r["query_id"]: r for r in rank_eval(run, qrels, k=4).collect()}

    # q1: precision = 2/4; recall = 2/3; mrr = 1/1
    assert out[1]["precision"] == pytest.approx(0.5)
    assert out[1]["recall"] == pytest.approx(2 / 3)
    assert out[1]["mrr"] == pytest.approx(1.0)
    dcg = (2**2 - 1) / math.log2(2) + (2**1 - 1) / math.log2(4)
    idcg = _dcg([3, 2, 1])
    assert out[1]["ndcg"] == pytest.approx(dcg / idcg, rel=1e-12)

    # q2: nothing relevant retrieved
    assert out[2]["precision"] == 0.0
    assert out[2]["recall"] == 0.0
    assert out[2]["mrr"] == 0.0
    assert out[2]["ndcg"] == 0.0

    summ = rank_eval_summary(rank_eval(run, qrels, k=4)).first()
    assert summ["n_queries"] == 2
    assert summ["precision"] == pytest.approx(0.25)


def test_rank_eval_k_cutoff(spark):
    run = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3)], "query_id int, docID long, rank int"
    )
    qrels = spark.createDataFrame([(1, 12, 1)], "query_id int, docID long, grade int")
    at3 = rank_eval(run, qrels, k=3).first()
    at2 = rank_eval(run, qrels, k=2).first()
    assert at3["mrr"] == pytest.approx(1 / 3)
    assert at2["mrr"] == 0.0  # the only relevant hit is below the cutoff


def test_rank_eval_e2e_with_batch_retrieval(spark, transcripts, index_tables):
    from neural_search_spark.query.batch import bm25_topk_batch

    queries = spark.createDataFrame(
        [(1, "merge", 1.0), (1, "sort", 1.0), (2, "heap", 1.0)],
        "query_id int, term string, weight double",
    )
    t = index_tables
    run = bm25_topk_batch(t.postings, t.doclens, t.term_stats, t.meta, queries, k=5)
    # self-judgments: every retrieved doc is relevant → perfect scores
    qrels = run.selectExpr("query_id", "docID", "1 as grade")
    out = rank_eval(run.select("query_id", "docID", "rank"), qrels, k=5).collect()
    for r in out:
        assert r["recall"] == pytest.approx(1.0)
        assert r["mrr"] == pytest.approx(1.0)
        assert r["ndcg"] == pytest.approx(1.0)
