"""function_score query: field_value_factor + decay functions."""

from __future__ import annotations

import math

import pytest

from neural_search_spark.index.build import build_index_tables
from neural_search_spark.query.dsl import QueryEngine, QueryValidationError

DOCS = [
    (0, "alpha beta", 10.0, "2024-01-01 00:00:00"),
    (1, "alpha", 100.0, "2024-01-01 06:00:00"),
    (2, "alpha alpha", None, "2024-01-02 00:00:00"),
]


@pytest.fixture(scope="module")
def fdocs(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(DOCS, "docID long, text string, pop double, ts_s string")
    return df.withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s").persist()


@pytest.fixture(scope="module")
def feng(fdocs):
    return QueryEngine(tables=build_index_tables(fdocs), docs=fdocs)


def _base(feng):
    return {r.docID: r.score for r in feng.search({"term": {"text": "alpha"}}, k=5).collect()}


def test_field_value_factor_modifiers_and_missing(feng):
    base = _base(feng)
    got = {r.docID: r.score for r in feng.search(
        {"function_score": {"query": {"term": {"text": "alpha"}},
                            "field_value_factor": {"field": "pop", "factor": 2.0,
                                                   "modifier": "ln1p", "missing": 1.0},
                            "boost_mode": "multiply"}}, k=5).collect()}
    exp = {0: base[0] * math.log(21.0), 1: base[1] * math.log(201.0),
           2: base[2] * math.log(3.0)}  # missing pop → 1.0
    for d in exp:
        assert got[d] == pytest.approx(exp[d], rel=1e-12)
    # replace mode ignores the base score
    got_r = {r.docID: r.score for r in feng.search(
        {"function_score": {"query": {"term": {"text": "alpha"}},
                            "field_value_factor": {"field": "pop", "missing": 1.0},
                            "boost_mode": "replace"}}, k=5).collect()}
    assert got_r == {0: 10.0, 1: 100.0, 2: 1.0}


def test_gauss_decay_on_timestamp(feng):
    base = _base(feng)
    origin = "2024-01-01 00:00:00"
    scale = 86400.0  # 1 day in seconds
    got = {r.docID: r.score for r in feng.search(
        {"function_score": {"query": {"term": {"text": "alpha"}},
                            "gauss": {"ts": {"origin": origin, "scale": scale,
                                             "decay": 0.5}},
                            "boost_mode": "multiply"}}, k=5).collect()}
    sigma2 = -(scale * scale) / (2 * math.log(0.5))
    for d, secs in ((0, 0.0), (1, 6 * 3600.0), (2, 86400.0)):
        exp = base[d] * math.exp(-(secs ** 2) / (2 * sigma2))
        assert got[d] == pytest.approx(exp, rel=1e-12), d
    # at distance == scale the gauss multiplier equals decay
    assert got[2] == pytest.approx(base[2] * 0.5, rel=1e-12)


def test_linear_and_exp_decay_numeric(feng):
    base = _base(feng)
    q = {"term": {"text": "alpha"}}
    got_l = {r.docID: r.score for r in feng.search(
        {"function_score": {"query": q, "boost_mode": "sum",
                            "linear": {"pop": {"origin": 10.0, "scale": 90.0,
                                               "decay": 0.5}}}}, k=5).collect()}
    s = 90.0 / 0.5
    assert got_l[0] == pytest.approx(base[0] + 1.0, rel=1e-12)  # dist 0
    assert got_l[1] == pytest.approx(base[1] + (s - 90.0) / s, rel=1e-12)
    got_e = {r.docID: r.score for r in feng.search(
        {"function_score": {"query": q, "boost_mode": "max",
                            "exp": {"pop": {"origin": 10.0, "scale": 90.0,
                                            "decay": 0.5}}}}, k=5).collect()}
    lam = math.log(0.5) / 90.0
    assert got_e[1] == pytest.approx(max(base[1], math.exp(lam * 90.0)), rel=1e-12)


def test_function_score_validation(feng):
    q = {"term": {"text": "alpha"}}
    with pytest.raises(QueryValidationError):
        feng.search({"function_score": {"query": q}}, k=2)
    with pytest.raises(QueryValidationError):
        feng.search({"function_score": {"query": q,
                                        "field_value_factor": {"field": "pop"},
                                        "gauss": {"pop": {"origin": 0, "scale": 1}}}}, k=2)
    with pytest.raises(QueryValidationError):
        feng.search({"function_score": {"query": q,
                                        "field_value_factor": {"field": "pop",
                                                               "modifier": "nope"}}}, k=2)
    with pytest.raises(QueryValidationError):
        feng.search({"function_score": {"query": q, "boost_mode": "nope",
                                        "field_value_factor": {"field": "pop"}}}, k=2)
    with pytest.raises(QueryValidationError):
        feng.search({"function_score": {"query": q,
                                        "gauss": {"pop": {"origin": 0, "scale": -1}}}}, k=2)
