"""neural_query_enricher: search-request processor that injects default
model ids into model-inference query clauses.

Reference semantics (``processor/NeuralQueryEnricherProcessor.java:29-75``
+ ``query/visitor/NeuralSearchQueryVisitor.java:38-54``): the processor
walks every query builder in the request; for each model-inference clause
whose ``model_id`` is unset it applies, in order,
(1) the per-field default from ``neural_field_default_id``,
(2) the pipeline-wide ``default_model_id``,
(3) otherwise raises ("model id must be provided in neural query or a
default model id must be set in search request processor").

Documented divergence: the reference's visitor requires a model id on
EVERY model-inference clause (its builders cannot run without a model).
This engine also accepts literal ``query_vector`` / ``query_tokens``
clauses that need no inference, so the requirement is scoped to clauses
that actually trigger inference — i.e. ones carrying ``query_text``
without a literal input. Literal clauses pass through untouched.

The walk is pure Python over the query dict (driver-side, O(tree size));
the input is never mutated — a deep-copied, enriched dict is returned,
matching a request processor's rewrite-the-request contract.
"""

from __future__ import annotations

import copy

from neural_search_spark.query.dsl import QueryValidationError

# query kinds whose body is {field: spec} and whose spec may reference a
# model (the ModelInferenceQueryBuilder implementors)
MODEL_QUERY_KINDS = ("neural", "neural_sparse")
# literal inputs that make a clause self-contained (no inference needed)
_LITERAL_KEYS = {"neural": "query_vector", "neural_sparse": "query_tokens"}


class NeuralQueryEnricher:
    """Request processor (``TYPE = "neural_query_enricher"``)."""

    def __init__(
        self,
        default_model_id: str | None = None,
        neural_field_default_id: dict[str, str] | None = None,
    ) -> None:
        self.default_model_id = default_model_id
        self.neural_field_default_id = dict(neural_field_default_id or {})

    # -- the visitor (NeuralSearchQueryVisitor.accept analog) --------------
    def _visit_leaf(self, kind: str, body: dict) -> None:
        for field, spec in body.items():
            if not isinstance(spec, dict):
                continue  # malformed bodies are the DSL parser's problem
            if spec.get("model_id") is not None:
                continue
            if _LITERAL_KEYS[kind] in spec:
                continue  # literal clause: no inference, no model required
            if field in self.neural_field_default_id:
                spec["model_id"] = self.neural_field_default_id[field]
            elif self.default_model_id is not None:
                spec["model_id"] = self.default_model_id
            else:
                raise QueryValidationError(
                    "model id must be provided in neural query or a default "
                    "model id must be set in search request processor "
                    "(NeuralSearchQueryVisitor.java:48-52)"
                )

    def _walk(self, q) -> None:
        if isinstance(q, list):
            for item in q:
                self._walk(item)
            return
        if not isinstance(q, dict):
            return
        for kind, body in q.items():
            if kind in MODEL_QUERY_KINDS and isinstance(body, dict):
                self._visit_leaf(kind, body)
            elif kind == "bool" and isinstance(body, dict):
                # filter clauses are doc-column predicates, not sub-queries
                for slot in ("must", "should", "must_not"):
                    self._walk(body.get(slot))
            elif kind == "hybrid" and isinstance(body, dict):
                self._walk(body.get("queries"))
            elif kind == "function_score" and isinstance(body, dict):
                self._walk(body.get("query"))

    def process_request(self, query: dict) -> dict:
        """Return an enriched deep copy of the query dict."""
        out = copy.deepcopy(query)
        self._walk(out)
        return out

    # uniform callable shape for SearchPipeline
    __call__ = process_request
