"""Batch multi-query BM25: score MANY queries in one postings pass.

The reference executes one query per request (per-shard collectors —
search/query/HybridCollectorManager.java); a Spark engine can amortize the
corpus scan across an arbitrarily large query set instead. This is the
offline shape a 100 TB training-data pipeline actually needs: relevance
eval sets, hard-negative mining for retrieval training, and bulk
re-scoring all present as "10³–10⁶ queries × 10¹²-doc index", where
per-query execution would re-scan the postings once per query.

Plan shape (one scan, two shuffles, both keyed on data that fans OUT
rather than replicates the corpus):
  queries(query_id, term, weight) ⋈ term_stats        -> w_idf per (q, t)
  postings ⋈ matched-terms (broadcast when small,
             shuffle-hash on `term` when the query set is huge)
  groupBy (query_id, docID) sum                       -> exact scores
  two-level per-query top-k (bounded heaps per partition, then
             coordinator-scale final rank — never a global sort)

Scoring is identical to query/bm25.py (Lucene BM25Similarity defaults,
k1 = 1.2, b = 0.75, tie-break score desc / docID asc —
processor/combination/ScoreCombiner.java:37-50).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from neural_search_spark import B, K1
from neural_search_spark.query.bm25 import bm25_score_col, idf_col

# below this many distinct query terms, the term list is collected to the
# driver and pushed into the parquet scan as an IN-list (row-group skipping);
# above it the scan is a full pass — correct for huge query batches, where
# the batch's vocabulary approaches the corpus vocabulary anyway
MAX_INLIST_TERMS = 10_000


def per_query_topk(scores: DataFrame, k: int, key: str = "query_id") -> DataFrame:
    """Bound each query's result list to its own top-k (score desc, docID
    asc within `key`) with the two-level window: level 1 ranks within each
    (key, spark partition) and keeps ≤ k rows per partition, level 2 ranks
    the ≤ n_partitions·k survivors per query. No per-query global sort; a
    head query over 10¹² docs never funnels its full match set through one
    reducer."""
    order = [F.col("score").desc(), F.col("docID").asc()]
    w_local = Window.partitionBy(key, "_pid").orderBy(*order)
    local = (
        scores.withColumn("_pid", F.spark_partition_id())
        .withColumn("_r", F.row_number().over(w_local))
        .where(F.col("_r") <= k)
        .drop("_pid")
    )
    w_global = Window.partitionBy(key).orderBy(*order)
    return (
        local.withColumn("_r", F.row_number().over(w_global))
        .where(F.col("_r") <= k)
        .withColumnRenamed("_r", "rank")
    )


def bm25_score_batch(
    postings: DataFrame,
    doclens: DataFrame,
    term_stats: DataFrame,
    meta: DataFrame,
    queries: DataFrame,
    k1: float = K1,
    b: float = B,
    broadcast_queries: bool | None = None,
) -> DataFrame:
    """(query_id, docID, score) for EVERY matching (query, doc) pair.

    `queries` is (query_id, term, weight) — one row per query term; any
    number of queries. `broadcast_queries` forces/forbids broadcasting the
    matched-terms frame into the postings join; default (None) lets
    Catalyst/AQE decide from its size estimate, which picks broadcast for
    eval-set-sized batches and a shuffle-hash join on `term` for huge ones.
    """
    m = meta.first()
    n_docs, avgdl = m["N"], float(m["avgdl"])
    q = queries.select(
        "query_id", F.col("term").alias("q_term"), F.col("weight").cast("double").alias("q_weight")
    )
    scored_terms = q.join(term_stats, q.q_term == term_stats.term).select(
        "query_id",
        "term",
        (F.col("q_weight") * idf_col(F.col("df"), F.lit(n_docs))).alias("w_idf"),
    )
    cand = postings
    distinct_terms = [r["q_term"] for r in q.select("q_term").distinct().limit(MAX_INLIST_TERMS + 1).collect()]
    if len(distinct_terms) <= MAX_INLIST_TERMS:
        # literal IN-list -> parquet row-group skipping (a broadcast join
        # does not push build-side keys into the probe scan)
        cand = cand.where(F.col("term").isin(sorted(distinct_terms)))
    if broadcast_queries is True:
        scored_terms = F.broadcast(scored_terms)
    cand = cand.join(scored_terms, "term")
    if "dl" not in cand.columns:
        cand = cand.join(doclens, "docID")
    part = F.col("w_idf") * bm25_score_col(F.col("tf"), F.col("dl"), F.lit(avgdl), k1, b)
    return (
        cand.select("query_id", "docID", part.alias("part"))
        .groupBy("query_id", "docID")
        .agg(F.sum("part").alias("score"))
    )


def bm25_topk_batch(
    postings: DataFrame,
    doclens: DataFrame,
    term_stats: DataFrame,
    meta: DataFrame,
    queries: DataFrame,
    k: int = 10,
    k1: float = K1,
    b: float = B,
    broadcast_queries: bool | None = None,
) -> DataFrame:
    """(query_id, rank, docID, score) — per-query top-k over the whole
    query batch in one postings pass."""
    scores = bm25_score_batch(
        postings, doclens, term_stats, meta, queries, k1, b, broadcast_queries
    )
    return per_query_topk(scores, k).select("query_id", "rank", "docID", "score")
