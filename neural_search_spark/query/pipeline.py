"""Search-pipeline composition: request processors → search → response
processors.

Reference analog: an OpenSearch search pipeline is an ordered list of
SearchRequestProcessors (run before the query phase — e.g.
``neural_query_enricher``, ``NeuralQueryEnricherProcessor.java``) and
SearchResponseProcessors (run on the hit list — e.g. the rerank processors,
``processor/rerank/RerankProcessor.java``). The normalization processor
(hybrid score normalize+combine) is phase-internal in the reference and is
likewise built into this engine's hybrid search path, so it does not appear
here.

Request processors are callables ``dict -> dict`` over the query body;
response processors are callables ``DataFrame -> DataFrame`` over the
ranked hits. Both stay driver-side / lazy — nothing here adds a Spark
action, so the composed pipeline still compiles to one plan per request.
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import DataFrame


class ByFieldRerank:
    """Response processor wrapping ops.rerank.rerank_by_field (the
    ``rerank`` → ``by_field`` search pipeline processor)."""

    def __init__(
        self,
        docs: DataFrame,
        target_field: str,
        id_col: str = "docID",
        keep_previous_score: bool = True,
        ascending: bool = False,
    ) -> None:
        self.docs = docs
        self.target_field = target_field
        self.id_col = id_col
        self.keep_previous_score = keep_previous_score
        self.ascending = ascending

    def __call__(self, hits: DataFrame) -> DataFrame:
        from neural_search_spark.ops.rerank import rerank_by_field

        return rerank_by_field(
            hits,
            self.docs,
            self.target_field,
            id_col=self.id_col,
            keep_previous_score=self.keep_previous_score,
            ascending=self.ascending,
        )


class CrossEncoderRerank:
    """Response processor: re-score the k hits with a query×document
    relevance function — the MLOpenSearchRerankProcessor /
    RescoringRerankProcessor dataflow (``processor/rerank/
    MLOpenSearchRerankProcessor.java``, ``RescoringRerankProcessor.java``:
    collect the hit texts, one model call scores (query, doc) pairs,
    results re-sort by the new score). The model stand-in here is token
    Jaccard overlap — computed JVM-side with array functions on the k
    joined rows (the hits side is broadcast; no Python, no extra scan of
    the corpus), exactly where a cross-encoder RPC would drop in.
    Hits missing a doc row are dropped, like the processor's
    only-rescored-hits behavior."""

    def __init__(
        self,
        docs: DataFrame,
        query_text: str,
        text_col: str = "text",
        id_col: str = "docID",
    ) -> None:
        self.docs = docs
        self.query_text = query_text
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, hits: DataFrame) -> DataFrame:
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        from neural_search_spark.analysis.tokenizer import tokenize_col

        qtoks = F.array_distinct(tokenize_col(F.lit(self.query_text)))
        dtoks = F.array_distinct(tokenize_col(self.text_col))
        jac = F.when(
            F.size(F.array_union(qtoks, dtoks)) > 0,
            F.size(F.array_intersect(qtoks, dtoks))
            / F.size(F.array_union(qtoks, dtoks)),
        ).otherwise(F.lit(0.0))
        scored = (
            self.docs.select(
                F.col(self.id_col).alias("docID"), jac.alias("_ce")
            )
            .join(F.broadcast(hits.select("docID")), "docID")
        )
        w = Window.orderBy(F.col("_ce").desc(), F.col("docID").asc())
        return scored.withColumn("rank", F.row_number().over(w)).select(
            "rank", "docID", F.col("_ce").alias("score")
        )


class SearchPipeline:
    """Ordered processor chain around a QueryEngine.

    >>> pipe = SearchPipeline(
    ...     engine,
    ...     request_processors=[NeuralQueryEnricher(default_model_id="m")],
    ...     response_processors=[ByFieldRerank(docs, "n_chars")],
    ... )
    >>> pipe.search({"neural": {"embedding": {"query_text": "spark", "k": 10}}})
    """

    def __init__(
        self,
        engine,
        request_processors: Sequence[Callable[[dict], dict]] = (),
        response_processors: Sequence[Callable[[DataFrame], DataFrame]] = (),
    ) -> None:
        self.engine = engine
        self.request_processors = list(request_processors)
        self.response_processors = list(response_processors)

    def process_request(self, query: dict) -> dict:
        for proc in self.request_processors:
            query = proc(query)
        return query

    def search(self, query: dict, **kwargs) -> DataFrame:
        hits = self.engine.search(self.process_request(query), **kwargs)
        for proc in self.response_processors:
            hits = proc(hits)
        return hits
