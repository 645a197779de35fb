"""terms_set query (Lucene CoveringQuery: per-doc minimum_should_match from
a field) vs a pure-Python oracle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from neural_search_spark.analysis.tokenizer import tokenize_py
from neural_search_spark.query.dsl import QueryEngine, QueryValidationError

from tests import oracle

TS_TERMS = ["merge", "sort", "spark", "vector"]


def _corpus(transcripts) -> dict[int, str]:
    return {r["docID"]: r["text"] for r in transcripts.select("docID", "text").collect()}


@pytest.fixture(scope="module")
def ts_engine(transcripts, index_tables):
    # per-doc required-match column: 1, 2 or 3 depending on docID
    docs = transcripts.withColumn("req_m", (F.col("docID") % 3 + 1).cast("int"))
    return QueryEngine(tables=index_tables, docs=docs)


def _expected(docs: dict[int, str], terms: list[str], msm_of) -> dict[int, float]:
    scores = oracle.bm25_scores(docs, {t: 1.0 for t in terms})
    out = {}
    for d, text in docs.items():
        matched = set(terms) & set(tokenize_py(text))
        if matched and len(matched) >= max(msm_of(d), 1):
            out[d] = scores[d]
    return out


def test_terms_set_per_doc_field(ts_engine, transcripts):
    docs = _corpus(transcripts)
    expected = _expected(docs, TS_TERMS, lambda d: d % 3 + 1)
    got = {
        r["docID"]: r["score"]
        for r in ts_engine._score(
            {"terms_set": {"text": {"terms": TS_TERMS,
                                    "minimum_should_match_field": "req_m"}}},
            None,
        ).collect()
    }
    assert set(got) == set(expected)
    for d in expected:
        assert got[d] == pytest.approx(expected[d], rel=1e-9)
    # the per-doc threshold must actually bite: some doc matching ≥1 term
    # has to be excluded relative to the msm=1 run
    loose = _expected(docs, TS_TERMS, lambda d: 1)
    assert len(expected) < len(loose)


def test_terms_set_constant_msm(ts_engine, transcripts):
    docs = _corpus(transcripts)
    expected = _expected(docs, TS_TERMS, lambda d: 2)
    got = {
        r["docID"]: r["score"]
        for r in ts_engine._score(
            {"terms_set": {"text": {"terms": TS_TERMS,
                                    "minimum_should_match": 2}}},
            None,
        ).collect()
    }
    assert set(got) == set(expected)
    for d in expected:
        assert got[d] == pytest.approx(expected[d], rel=1e-9)


def test_terms_set_msm_above_terms_matches_nothing(ts_engine):
    got = ts_engine._score(
        {"terms_set": {"text": {"terms": TS_TERMS,
                                "minimum_should_match": len(TS_TERMS) + 1}}},
        None,
    )
    assert got.count() == 0


def test_terms_set_validation(ts_engine):
    with pytest.raises(QueryValidationError):
        ts_engine._score({"terms_set": {"text": {"terms": []}}}, None)
    with pytest.raises(QueryValidationError):
        ts_engine._score(
            {"terms_set": {"text": {"terms": TS_TERMS}}}, None
        )  # neither msm form
    with pytest.raises(QueryValidationError):
        ts_engine._score(
            {"terms_set": {"text": {"terms": TS_TERMS,
                                    "minimum_should_match": 1,
                                    "minimum_should_match_field": "req_m"}}},
            None,
        )  # both forms
    with pytest.raises(QueryValidationError):
        ts_engine._score(
            {"terms_set": {"text": {"terms": TS_TERMS,
                                    "minimum_should_match_field": "nope"}}},
            None,
        )
