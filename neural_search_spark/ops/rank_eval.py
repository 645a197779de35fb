"""Offline ranking evaluation over batch retrieval results: precision@k,
recall@k, MRR@k, NDCG@k per query + macro averages.

The natural companion to query/batch.py: an offline pipeline retrieves
top-k for a whole eval set in one corpus pass (`bm25_topk_batch` /
`hybrid_topk_batch`), then joins the run against relevance judgments to
score it — the OpenSearch _rank_eval API shape, re-expressed as two
DataFrames in / one DataFrame out.

Inputs:
- `run`: (query_id, docID, rank) — rank 1-based, ≤ k rows per query (the
  shape every *_topk_batch emits);
- `qrels`: (query_id, docID, grade) — graded relevance; grade > 0 means
  relevant for the binary metrics (precision/recall/MRR), the raw grade
  feeds NDCG's gain.

Metric definitions (standard IR, documented so the oracle is unambiguous):
- precision@k = |retrieved@k ∩ relevant| / k   (fixed k denominator, the
  trec_eval convention — queries with fewer than k hits are penalized);
- recall@k    = |retrieved@k ∩ relevant| / |relevant|;
- MRR@k       = 1 / rank of the first relevant hit (0 if none in top k);
- NDCG@k      = DCG@k / IDCG@k, DCG = Σ (2^grade − 1) / log2(rank + 1),
  ideal ranking = judged docs by grade desc (top k).

Scale shape: run ⋈ qrels is an equi-join on (query_id, docID) — qrels for
an eval set are small (broadcast); per-query metrics are one groupBy on
query_id; IDCG needs a per-query top-k over qrels only (window over the
tiny judgments frame). Nothing touches the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _gain(grade) -> F.Column:
    return (F.pow(F.lit(2.0), grade) - F.lit(1.0))


def rank_eval(
    run: DataFrame,
    qrels: DataFrame,
    k: int = 10,
) -> DataFrame:
    """Per-query metrics: (query_id, precision, recall, mrr, ndcg).

    Queries present in `run` but with zero judged-relevant docs score 0 on
    every metric (they cannot be evaluated upward); queries present only
    in `qrels` are omitted — score the run you actually made."""
    if k < 1:
        raise ValueError("k must be >= 1")
    run_k = run.where(F.col("rank") <= k)
    judged = qrels.select(
        "query_id", "docID",
        F.col("grade").cast("double").alias("grade"),
    )
    joined = run_k.join(F.broadcast(judged), ["query_id", "docID"], "left").select(
        "query_id", "rank", F.coalesce("grade", F.lit(0.0)).alias("grade")
    )
    rel = F.when(F.col("grade") > 0, 1.0).otherwise(0.0)
    per_hit = joined.select(
        "query_id",
        rel.alias("rel"),
        (rel / F.col("rank")).alias("rr"),
        (_gain(F.col("grade")) / F.log2(F.col("rank") + F.lit(1.0))).alias("dcg_part"),
    )
    agg = per_hit.groupBy("query_id").agg(
        F.sum("rel").alias("n_rel_ret"),
        F.max("rr").alias("mrr"),
        F.sum("dcg_part").alias("dcg"),
    )

    # per-query totals + ideal DCG from the judgments alone
    n_rel = (
        judged.where(F.col("grade") > 0)
        .groupBy("query_id")
        .agg(F.count("*").cast("double").alias("n_rel"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("grade").desc(), F.col("docID").asc())
    ideal = (
        judged.where(F.col("grade") > 0)
        .withColumn("irank", F.row_number().over(w))
        .where(F.col("irank") <= k)
        .groupBy("query_id")
        .agg(
            F.sum(_gain(F.col("grade")) / F.log2(F.col("irank") + F.lit(1.0))).alias("idcg")
        )
    )
    qids = run_k.select("query_id").distinct()
    out = (
        qids.join(agg, "query_id", "left")
        .join(F.broadcast(n_rel), "query_id", "left")
        .join(F.broadcast(ideal), "query_id", "left")
        .select(
            "query_id",
            (F.coalesce("n_rel_ret", F.lit(0.0)) / F.lit(float(k))).alias("precision"),
            F.when(
                F.col("n_rel").isNull() | (F.col("n_rel") == 0), F.lit(0.0)
            ).otherwise(F.coalesce("n_rel_ret", F.lit(0.0)) / F.col("n_rel")).alias("recall"),
            F.coalesce("mrr", F.lit(0.0)).alias("mrr"),
            F.when(
                F.col("idcg").isNull() | (F.col("idcg") == 0), F.lit(0.0)
            ).otherwise(F.coalesce("dcg", F.lit(0.0)) / F.col("idcg")).alias("ndcg"),
        )
    )
    return out


def rank_eval_summary(per_query: DataFrame) -> DataFrame:
    """Macro averages over rank_eval's per-query frame: one row
    (n_queries, precision, recall, mrr, ndcg)."""
    return per_query.agg(
        F.count("*").cast("long").alias("n_queries"),
        F.avg("precision").alias("precision"),
        F.avg("recall").alias("recall"),
        F.avg("mrr").alias("mrr"),
        F.avg("ndcg").alias("ndcg"),
    )
