"""neural_query_enricher + model registry + search pipeline composition.

Reference parity: NeuralQueryEnricherProcessor.java (default model_id
injection via NeuralSearchQueryVisitor.java) and the search-pipeline
request/response processor chain.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from neural_search_spark.query.dsl import QueryEngine, QueryValidationError
from neural_search_spark.query.enricher import NeuralQueryEnricher
from neural_search_spark.query.models import (
    ModelNotFoundError,
    ModelRegistry,
    default_registry,
    hash_dense_encoder,
    tf_sparse_encoder,
)
from neural_search_spark.query.pipeline import ByFieldRerank, SearchPipeline


# ---------------------------------------------------------------- enricher


def test_enricher_injects_defaults_through_compound_queries():
    enr = NeuralQueryEnricher(
        default_model_id="global-m",
        neural_field_default_id={"embedding": "field-m"},
    )
    q = {
        "hybrid": {
            "queries": [
                {"neural": {"embedding": {"query_text": "spark", "k": 5}}},
                {
                    "bool": {
                        "must": [
                            {"neural_sparse": {"text": {"query_text": "query engine"}}}
                        ],
                        "should": [{"term": {"text": {"value": "spark"}}}],
                    }
                },
                # literal clause: self-contained, must stay untouched
                {"neural": {"embedding": {"query_vector": [1.0, 0.0], "k": 3}}},
            ]
        }
    }
    out = enr.process_request(q)
    subs = out["hybrid"]["queries"]
    # per-field default wins over the global default
    assert subs[0]["neural"]["embedding"]["model_id"] == "field-m"
    # global default applies where no field default exists
    assert subs[1]["bool"]["must"][0]["neural_sparse"]["text"]["model_id"] == "global-m"
    # literal clause untouched
    assert "model_id" not in subs[2]["neural"]["embedding"]
    # input not mutated (request processors rewrite a copy)
    assert "model_id" not in q["hybrid"]["queries"][0]["neural"]["embedding"]


def test_enricher_function_score_and_explicit_model_kept():
    enr = NeuralQueryEnricher(default_model_id="global-m")
    q = {
        "function_score": {
            "query": {"neural": {"embedding": {"query_text": "x", "model_id": "mine"}}},
            "field_value_factor": {"field": "turn_idx"},
        }
    }
    out = enr.process_request(q)
    # explicit model_id is never overwritten
    assert out["function_score"]["query"]["neural"]["embedding"]["model_id"] == "mine"


def test_enricher_missing_model_raises():
    enr = NeuralQueryEnricher()  # no defaults at all
    with pytest.raises(QueryValidationError, match="model id must be provided"):
        enr.process_request({"neural": {"embedding": {"query_text": "spark"}}})


# ---------------------------------------------------------------- registry


def test_model_registry_encoders_deterministic():
    reg = default_registry(dim=8)
    v1 = reg.encode_dense("standin-dense", "Spark query engine")
    v2 = reg.encode_dense("standin-dense", "Spark query engine")
    assert v1 == v2 and len(v1) == 8
    assert np.linalg.norm(v1) == pytest.approx(1.0)
    # shared tokens → correlated vectors, disjoint → less similar (at a
    # dim where token signal dominates hash noise; 8-d is too coarse for
    # this property to hold for arbitrary token pairs)
    enc64 = hash_dense_encoder(64)
    base = enc64("Spark query engine")
    near = enc64("spark engine")
    far = enc64("zebra umbrella")
    assert float(np.dot(base, near)) > float(np.dot(base, far))

    toks = reg.encode_sparse("standin-sparse", "the query the engine")
    assert toks == {"the": 2.0, "query": 1.0, "engine": 1.0}

    with pytest.raises(ModelNotFoundError):
        reg.encode_dense("nope", "x")
    with pytest.raises(ModelNotFoundError):
        reg.encode_dense("standin-sparse", "x")  # kind mismatch
    with pytest.raises(ValueError):
        ModelRegistry().register("m", "weird", lambda t: t)


def test_hash_dense_zero_text():
    assert hash_dense_encoder(4)("") == [0.0, 0.0, 0.0, 0.0]
    assert tf_sparse_encoder()("") == {}


# ------------------------------------------------- engine query_text paths


@pytest.fixture(scope="module")
def model_engine(spark, transcripts, index_tables):
    """Engine whose embeddings come from the SAME dense stand-in the
    registry serves, so query_text retrieval is semantically meaningful."""
    enc = hash_dense_encoder(8)
    rows = transcripts.select("docID", "text").collect()  # 200 docs, test-only
    emb = spark.createDataFrame(
        [(int(r["docID"]), enc(r["text"])) for r in rows],
        "docID long, embedding array<float>",
    ).persist()
    return QueryEngine(
        tables=index_tables,
        docs=transcripts,
        embeddings=emb,
        models=default_registry(dim=8),
    )


def test_neural_query_text_matches_literal_vector(model_engine):
    qtext = "spark shuffle partition"
    by_text = model_engine.search(
        {"neural": {"embedding": {"query_text": qtext, "model_id": "standin-dense", "k": 10}}}
    ).collect()
    qv = default_registry(dim=8).encode_dense("standin-dense", qtext)
    by_vec = model_engine.search(
        {"neural": {"embedding": {"query_vector": qv, "k": 10}}}
    ).collect()
    assert [(r["docID"], r["score"]) for r in by_text] == [
        (r["docID"], r["score"]) for r in by_vec
    ]
    assert len(by_text) == 10


def test_neural_sparse_query_text_matches_literal_tokens(model_engine):
    qtext = "the spark query"
    by_text = model_engine.search(
        {"neural_sparse": {"text": {"query_text": qtext, "model_id": "standin-sparse"}}}
    ).collect()
    toks = tf_sparse_encoder()(qtext)
    by_tokens = model_engine.search(
        {"neural_sparse": {"text": {"query_tokens": toks}}}
    ).collect()
    assert [(r["docID"], r["score"]) for r in by_text] == [
        (r["docID"], r["score"]) for r in by_tokens
    ]


def test_query_text_without_registry_raises(engine):
    with pytest.raises(QueryValidationError, match="model registry"):
        engine.search({"neural_sparse": {"text": {"query_text": "x", "model_id": "m"}}})


def test_unknown_model_id_is_validation_error(model_engine):
    with pytest.raises(QueryValidationError):
        model_engine.search(
            {"neural_sparse": {"text": {"query_text": "x", "model_id": "missing"}}}
        )


# ------------------------------------------------ ingest-time inference


def test_embed_text_matches_query_time_encoding(spark, transcripts):
    """Ingest (TextEmbeddingProcessor analog) and query-time encodings of
    the same text must be identical — one encoder, two call sites."""
    from neural_search_spark.ops.embed import embed_sparse, embed_text

    reg = default_registry(dim=8)
    rows = embed_text(transcripts.limit(20), reg, "standin-dense").select(
        "text", "embedding"
    ).collect()
    enc = hash_dense_encoder(8)
    assert len(rows) == 20
    for r in rows:
        assert r["embedding"] == pytest.approx(enc(r["text"]), abs=1e-12)

    srows = embed_sparse(transcripts.limit(20), reg, "standin-sparse").select(
        "text", "sparse_embedding"
    ).collect()
    senc = tf_sparse_encoder()
    for r in srows:
        assert dict(r["sparse_embedding"]) == senc(r["text"])


def test_embed_text_image_single_vector(spark, transcripts):
    """TextImageEmbeddingProcessor analog: one embedding from the
    (text, image) pair; either input optional; text-only degenerates to
    the dense encoder's vector."""
    from neural_search_spark.ops.embed import embed_text_image
    from neural_search_spark.query.models import hash_multimodal_encoder

    reg = default_registry(dim=8)
    docs = transcripts.limit(10).withColumn(
        "image", F.encode(F.concat_ws(":", "conv_id", "turn_idx"), "utf-8")
    )
    rows = embed_text_image(docs, reg, "standin-multimodal").select(
        "text", "image", "embedding"
    ).collect()
    enc = hash_multimodal_encoder(8)
    for r in rows:
        assert r["embedding"] == pytest.approx(enc(r["text"], bytes(r["image"])), abs=1e-12)
        assert np.linalg.norm(r["embedding"]) == pytest.approx(1.0)

    # image=NULL column → behaves as absent inputImage == text-only vector
    nulled = docs.withColumn("image", F.lit(None).cast("binary"))
    rows2 = embed_text_image(nulled, reg, "standin-multimodal").select(
        "text", "embedding"
    ).collect()
    denc = hash_dense_encoder(8)
    for r in rows2:
        assert r["embedding"] == pytest.approx(denc(r["text"]), abs=1e-12)


# ---------------------------------------------------------------- pipeline


def test_cross_encoder_rerank_jaccard(spark, transcripts, engine):
    """CrossEncoderRerank: k hits re-score by query×doc token Jaccard and
    re-sort; python oracle over the collected texts."""
    from neural_search_spark.query.pipeline import CrossEncoderRerank
    from neural_search_spark.analysis.tokenizer import tokenize_py

    hits = engine.search({"match": {"text": {"query": "spark query"}}}, k=8)
    out = CrossEncoderRerank(transcripts, "spark query")(hits).collect()
    assert [r["rank"] for r in out] == list(range(1, len(out) + 1))

    texts = {r["docID"]: r["text"] for r in transcripts.collect()}
    q = set(tokenize_py("spark query"))

    def jac(d):
        t = set(tokenize_py(texts[d]))
        return len(q & t) / len(q | t) if q | t else 0.0

    ids = [r["docID"] for r in hits.collect()]
    exp = sorted(ids, key=lambda d: (-jac(d), d))
    assert [r["docID"] for r in out] == exp
    for r in out:
        assert r["score"] == pytest.approx(jac(r["docID"]), abs=1e-12)


def test_search_pipeline_enrich_then_rerank(model_engine, transcripts):
    pipe = SearchPipeline(
        model_engine,
        request_processors=[NeuralQueryEnricher(default_model_id="standin-dense")],
        response_processors=[ByFieldRerank(transcripts, "turn_idx")],
    )
    # query carries NO model_id: the enricher injects it, then hits re-rank
    # by turn_idx desc with previous_score kept
    hits = pipe.search(
        {"neural": {"embedding": {"query_text": "spark shuffle", "k": 10}}}
    ).collect()
    assert len(hits) == 10
    assert [r["rank"] for r in hits] == list(range(1, 11))
    scores = [r["score"] for r in hits]
    assert scores == sorted(scores, reverse=True)  # new score = turn_idx desc
    assert all("previous_score" in r.asDict() for r in hits)

    # same docs as the unpiped search with an explicit model_id
    direct = model_engine.search(
        {"neural": {"embedding": {"query_text": "spark shuffle", "model_id": "standin-dense", "k": 10}}}
    ).collect()
    assert {r["docID"] for r in hits} == {r["docID"] for r in direct}
