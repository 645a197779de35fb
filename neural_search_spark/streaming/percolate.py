"""Streaming percolation: registered queries matched against a document
STREAM — the percolator-as-alerting shape (every micro-batch of incoming
docs emits (id, query_id) alert rows for the rules it satisfies).

The relational percolator (``query/percolate.py``) aggregates
(docID, query_id) match counts — a shuffle, and a non-append streaming
plan. This module instead evaluates the whole rule set per row with
JVM-codegen'd array expressions (tokenize → array_distinct →
array_intersect per rule → filter+explode the matched ids): stateless,
shuffle-free, append-mode — the same transform runs unchanged on a batch
OR streaming DataFrame, so batch backfill and the live stream share one
code path (pytest pins their equivalence).

Scale split, explicit: the rule set rides the PLAN as a literal array —
right for alerting-scale rule sets (10²–10⁴ rules; each rule is a handful
of terms). For million-rule percolation use the relational
``query/percolate.percolate`` (rules as a broadcast-joined DataFrame) on
micro-batches via foreachBatch instead. Both share ``register_queries``'s
validation semantics.

Reference analog: the OpenSearch percolator's per-document candidate
evaluation (each doc visits only its own terms); alerting/monitoring is
its canonical use.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from neural_search_spark.analysis.tokenizer import tokenize_col


def _rules_literal(qdefs: dict[int, dict]) -> Column:
    """{query_id: {"terms": [...], "min_match": m?}} → literal
    array<struct<query_id,terms,min_match>>. Same validation as
    query/percolate.register_queries: term sets, min_match defaults to ALL
    terms (conjunction), out-of-range min_match raises."""
    structs = []
    for qid, spec in sorted(qdefs.items()):
        terms = sorted(set(spec["terms"]))
        if not terms:
            raise ValueError(f"percolate query {qid} needs at least one term")
        m = int(spec.get("min_match", len(terms)))
        if not 1 <= m <= len(terms):
            raise ValueError(
                f"percolate query {qid}: min_match {m} outside 1..{len(terms)}"
            )
        structs.append(
            F.struct(
                F.lit(int(qid)).alias("query_id"),
                F.array(*[F.lit(t) for t in terms]).alias("terms"),
                F.lit(m).alias("min_match"),
            )
        )
    return F.array(*structs)


def percolate_stream(
    docs: DataFrame,
    qdefs: dict[int, dict],
    text_col: str = "text",
    id_col: str = "docID",
    tokenizer: str = "standard",
) -> DataFrame:
    """(id, query_id) match pairs; append-safe on streaming input.

    One codegen'd projection per row: no shuffle, no state store, no
    watermark needed — a matched doc alerts in the micro-batch it arrives.
    """
    toks = F.array_distinct(tokenize_col(text_col, tokenizer))
    matched = F.filter(
        F.transform(
            _rules_literal(qdefs),
            lambda q: F.when(
                F.size(F.array_intersect(toks, q["terms"])) >= q["min_match"],
                q["query_id"],
            ),
        ),
        lambda x: x.isNotNull(),
    )
    return docs.select(
        F.col(id_col).alias("id"), F.explode(matched).alias("query_id")
    )
