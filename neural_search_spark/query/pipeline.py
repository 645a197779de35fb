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
