"""Percolate reverse search (query/percolate.py)."""

from __future__ import annotations

import random

import pytest

from neural_search_spark.analysis.tokenizer import tokenize_py
from neural_search_spark.query.percolate import percolate, register_queries

DOCS = [
    (0, "alert disk full on host"),
    (1, "disk ok"),
    (2, "memory alert raised"),
    (3, "the quick fox"),
]
QDEFS = {
    10: {"terms": ["alert", "disk"]},                 # conjunction
    11: {"terms": ["alert", "memory"], "min_match": 1},  # disjunction
    12: {"terms": ["fox", "fox", "quick"]},           # dup terms collapse
}


def test_percolate_matches(spark):
    docs = spark.createDataFrame(DOCS, "docID long, text string")
    q = register_queries(spark, QDEFS)
    got = {(r.id, r.query_id) for r in percolate(docs, q).collect()}
    assert got == {(0, 10), (0, 11), (2, 11), (3, 12)}


def test_percolate_shuffle_path_parity(spark):
    """broadcast_rules=False (the >10⁸-rule-term escape hatch) must produce
    identical matches through a genuine shuffle hash join, never a
    broadcast."""
    docs = spark.createDataFrame(DOCS, "docID long, text string")
    q = register_queries(spark, QDEFS)
    shuffled = percolate(docs, q, broadcast_rules=False)
    got = {(r.id, r.query_id) for r in shuffled.collect()}
    assert got == {(0, 10), (0, 11), (2, 11), (3, 12)}
    plan = shuffled._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in plan, plan[:1500]


def test_percolate_validation(spark):
    with pytest.raises(ValueError):
        register_queries(spark, {1: {"terms": []}})
    with pytest.raises(ValueError):
        register_queries(spark, {1: {"terms": ["a"], "min_match": 2}})


def test_percolate_randomized_vs_python(spark):
    rng = random.Random(31)
    vocab = list("abcdefgh")
    rows = [(i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 10))))
            for i in range(60)]
    qdefs = {}
    for qid in range(12):
        terms = rng.sample(vocab, rng.randint(1, 3))
        qdefs[qid] = {"terms": terms, "min_match": rng.randint(1, len(set(terms)))}
    docs = spark.createDataFrame(rows, "docID long, text string")
    got = {(r.id, r.query_id)
           for r in percolate(docs, register_queries(spark, qdefs)).collect()}
    exp = set()
    for i, text in rows:
        toks = set(tokenize_py(text))
        for qid, spec in qdefs.items():
            if len(set(spec["terms"]) & toks) >= spec["min_match"]:
                exp.add((i, qid))
    assert got == exp
