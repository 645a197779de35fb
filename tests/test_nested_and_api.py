"""Nested-document processing, JSON query surface, total-hits relation, and
query+aggregations composition."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from neural_search_spark.ops import nested
from neural_search_spark.query.dsl import QueryValidationError


# -- nested dot-path ops (ProcessorUtils / ProcessorDocumentUtils analog) ----


@pytest.fixture(scope="module")
def deep_df(spark):
    return spark.createDataFrame(
        [(1, {"b": {"c": "x", "d": 7}, "e": "keep"})],
        "id long, a struct<b: struct<c: string, d: long>, e: string>",
    )


def test_get_path_deep(spark, deep_df):
    row = deep_df.select(nested.get_path(deep_df, "a.b.c").alias("v")).first()
    assert row["v"] == "x"


def test_drop_path_keeps_siblings(spark, deep_df):
    out = nested.drop_path(deep_df, "a.b.c").first()
    assert out["a"]["b"].asDict() == {"d": 7}
    assert out["a"]["e"] == "keep"
    # top-level drop
    assert "a" not in nested.drop_path(deep_df, "a").columns


def test_with_path_sets_nested_field(spark, deep_df):
    out = nested.with_path(deep_df, "a.b.d", F.lit(99)).first()
    assert out["a"]["b"]["d"] == 99
    assert out["a"]["b"]["c"] == "x"


def test_conversation_roundtrip(spark, transcripts):
    """group → nested ArrayType(StructType) → explode reproduces every turn
    with stable per-conversation ordering."""
    flat = transcripts.select("conv_id", "turn_idx", "role", "text")
    convs = nested.group_conversations(flat)
    assert dict(convs.dtypes)["turns"].startswith("array<struct<turn_idx:")
    back = nested.explode_conversations(convs)
    assert back.count() == flat.count()
    orig = {(r["conv_id"], r["turn_idx"]): (r["role"], r["text"]) for r in flat.collect()}
    got = {(r["conv_id"], r["turn_idx"]): (r["role"], r["text"]) for r in back.collect()}
    assert got == orig
    # children are sorted by turn_idx inside each conversation
    for r in convs.collect():
        idxs = [t["turn_idx"] for t in r["turns"]]
        assert idxs == sorted(idxs)


# -- JSON query surface ------------------------------------------------------


def test_search_json_equals_dict(spark, engine):
    import json

    q = {"match": {"text": {"query": "the data"}}}
    a = [(r["docID"], r["score"]) for r in engine.search(q, k=5).collect()]
    b = [(r["docID"], r["score"]) for r in engine.search_json(json.dumps(q), k=5).collect()]
    assert a == b


def test_search_json_validation(engine):
    with pytest.raises(QueryValidationError, match="malformed"):
        engine.search_json("{not json")
    with pytest.raises(QueryValidationError, match="object"):
        engine.search_json("[1, 2]")


# -- total hits with relation ------------------------------------------------


def test_count_hits_relation(spark, transcripts, engine):
    q = {"match": {"text": {"query": "the"}}}
    exact = engine._score(q, None).count()
    assert exact > 5
    v, rel = engine.count_hits(q, track_total_hits=100_000)
    assert (v, rel) == (exact, "eq")
    v, rel = engine.count_hits(q, track_total_hits=5)
    assert (v, rel) == (5, "gte")
    v, rel = engine.count_hits(q, track_total_hits=exact)
    assert (v, rel) == (exact, "eq")
    with pytest.raises(QueryValidationError):
        engine.count_hits(q, track_total_hits=-1)


# -- aggregations alongside a query ------------------------------------------


def test_search_with_aggs_full_match_set(spark, transcripts, engine):
    q = {"match": {"text": {"query": "the data"}}}
    match_ids = {r["docID"] for r in engine._score(q, None).collect()}
    assert len(match_ids) > 10  # aggs must cover more than the top-k
    hits, aggs = engine.search_with_aggs(
        q, {"by_role": {"terms": {"field": "role"}}, "max_turn": {"max": {"field": "turn_idx"}}},
        k=10,
    )
    assert hits.count() == 10
    roles = {r["docID"]: r["role"] for r in transcripts.select("docID", "role").collect()}
    exp = {}
    for d in match_ids:
        exp[roles[d]] = exp.get(roles[d], 0) + 1
    got = {r["key"]: r["doc_count"] for r in aggs["by_role"].collect()}
    assert got == exp  # counts over the FULL match set, not the hit list
    turns = {r["docID"]: r["turn_idx"] for r in transcripts.select("docID", "turn_idx").collect()}
    assert aggs["max_turn"].first()["value"] == max(turns[d] for d in match_ids)


def test_search_with_aggs_post_filter_only_filters_hits(spark, engine):
    q = {"match": {"text": {"query": "the data"}}}
    _, aggs_plain = engine.search_with_aggs(q, {"by_role": {"terms": {"field": "role"}}})
    hits_f, aggs_f = engine.search_with_aggs(
        q, {"by_role": {"terms": {"field": "role"}}}, post_filter={"eq": ["role", "tool"]}
    )
    a = {r["key"]: r["doc_count"] for r in aggs_plain["by_role"].collect()}
    b = {r["key"]: r["doc_count"] for r in aggs_f["by_role"].collect()}
    assert a == b  # post_filter must not change aggregations
    assert all(r["docID"] is not None for r in hits_f.collect())
    with pytest.raises(QueryValidationError, match="aggregation"):
        engine.search_with_aggs(q, {"x": {"geo_bounds": {"field": "turn_idx"}}})
