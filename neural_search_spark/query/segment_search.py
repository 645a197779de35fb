"""Top-k BM25 over compressed posting segments with block-max WAND pruning.

The set-at-a-time analog of the reference's WAND/MAXSCORE machinery
(query/HybridQueryScorer.java:161-171 setMinCompetitiveScore;
query/HybridScoreBlockBoundaryPropagator.java:39-98 block boundaries):
instead of advancing doc-at-a-time iterators past non-competitive blocks, we
*filter the block table* before decoding anything.

Algorithm (provably exact top-k):
 1. For each query term t: w_idf(t) = w_q(t)·idf(t); per-block upper bound
    ub(t, blk) = w_idf(t) · max_score_component(blk) (stored at build time).
 2. Seed θ: decode only the single highest-ub block per term, score those
    docs on their seed contributions; θ = k-th best partial score — a lower
    bound of the true k-th best score.
 3. Prune: keep block (t, blk) iff ub(t, blk) ≥ θ − Σ_{t'≠t} maxub(t').
    For any doc d with true score ≥ θ at least one of its blocks survives
    (if all its blocks failed the test, every per-term bound chain gives
    score(d) ≤ θ) → every true top-k doc appears in a surviving block.
 4. Rescue: docs seen in surviving blocks may still miss contributions from
    pruned blocks of OTHER terms. The rescue set is BOUNDED first: a doc
    occupies exactly one block per term, so its surviving partial score plus
    Σ maxub over terms NOT seen among its surviving blocks upper-bounds its
    true score; docs below θ on that bound are dropped before the broadcast
    (they provably cannot enter the top-k). Only then are pruned blocks
    whose [first_docID, last_docID] zone intersects a remaining candidate
    decoded (broadcast range-join against the now-k-scale candidate set).
 5. Exact score = Σ decoded contributions per candidate; top-k, ties by
    docID asc (ScoreCombiner.java:37-50 semantics).

Everything is DataFrame dataflow; decoding is a vectorized Arrow pass
(codec.decode_blocks_batch — one varint sweep per partition, no per-row
Python). The segment scan prunes by `shard` directory (partition column
= hash(term) % N_SHARDS) and pushes the term IN-list into parquet row
groups, so a q-term query touches ≤ q shard directories.
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from neural_search_spark import B, K1
from neural_search_spark.index.codec import decode_blocks_batch

_DECODED_SCHEMA = T.StructType(
    [
        T.StructField("docID", T.LongType(), False),
        T.StructField("part", T.DoubleType(), False),
    ]
)

_DECODED_TERM_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("docID", T.LongType(), False),
        T.StructField("part", T.DoubleType(), False),
    ]
)


def _decode_and_score(
    blocks: DataFrame, avgdl: float, k1: float, b: float, keep_term: bool = False
) -> DataFrame:
    """blocks: (term, w_idf, n, docids, tfs, dls) → (docID, part) partial
    scores, decoded+scored in one vectorized pass per Arrow batch.
    `keep_term=True` also emits the contributing term (needed to bound the
    rescue set per doc)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            if batch.empty:
                continue
            ns = batch["n"].to_numpy(np.int64)
            block_idx, docids, tfs, dls = decode_blocks_batch(
                list(batch["docids"]), list(batch["tfs"]), list(batch["dls"]), ns
            )
            w_idf = batch["w_idf"].to_numpy(np.float64)[block_idx]
            tf = tfs.astype(np.float64)
            dl = dls.astype(np.float64)
            part = w_idf * (tf / (tf + k1 * (1.0 - b + b * dl / avgdl)))
            out = {"docID": docids.astype(np.int64), "part": part}
            if keep_term:
                out = {"term": batch["term"].to_numpy()[block_idx], **out}
            yield pd.DataFrame(out)

    return blocks.mapInPandas(run, schema=_DECODED_TERM_SCHEMA if keep_term else _DECODED_SCHEMA)


def wand_topk(
    segments: DataFrame,
    term_stats: DataFrame,
    n_docs: int,
    avgdl: float,
    terms: dict[str, float] | list[str],
    k: int = 10,
    k1: float = K1,
    b: float = B,
    prune: bool = True,
    stats_out: dict | None = None,
) -> DataFrame:
    """(rank, docID, score) exact BM25 top-k over the segment table.

    `prune=False` decodes every block of every query term (the correctness
    baseline the pruned path is asserted against). `stats_out`, if given, is
    filled with pruning telemetry: total/surviving/rescued block counts and
    the seeded θ."""
    spark = segments.sparkSession
    if not isinstance(terms, dict):
        terms = {t: 1.0 for t in sorted(set(terms))}

    # w_idf per query term: tiny collect of q rows (df lookup), like the
    # reference's per-term TermStatistics fetch at query start
    q_terms = sorted(terms)
    stats = {
        r["term"]: r["df"]
        for r in term_stats.where(F.col("term").isin(q_terms)).collect()
    }
    w_idf = {
        t: terms[t] * math.log(1.0 + (n_docs - stats[t] + 0.5) / (stats[t] + 0.5))
        for t in q_terms
        if t in stats
    }
    if not w_idf:
        return spark.createDataFrame([], "rank long, docID long, score double")

    widf_df = F.broadcast(
        spark.createDataFrame([(t, w) for t, w in sorted(w_idf.items())], "term string, w_idf double")
    )
    qblocks = segments.join(widf_df, "term").withColumn(
        "ub", F.col("w_idf") * F.col("max_score_component")
    )

    if not prune:
        scored = _decode_and_score(
            qblocks.select("term", "w_idf", "n", "docids", "tfs", "dls"), avgdl, k1, b
        )
        return _ranked(scored.groupBy("docID").agg(F.sum("part").alias("score")), k)

    qblocks = qblocks.persist()
    try:
        # per-term max block upper bound (tiny aggregate, collected)
        maxub = {
            r["term"]: r["mx"]
            for r in qblocks.groupBy("term").agg(F.max("ub").alias("mx")).collect()
        }
        m_total = sum(maxub.values())

        # seed θ from the best block of each term
        w_seed = Window.partitionBy("term").orderBy(F.col("ub").desc(), F.col("blockID").asc())
        seed_blocks = qblocks.withColumn("_r", F.row_number().over(w_seed)).where(F.col("_r") == 1)
        seed_scores = (
            _decode_and_score(seed_blocks.select("term", "w_idf", "n", "docids", "tfs", "dls"), avgdl, k1, b)
            .groupBy("docID")
            .agg(F.sum("part").alias("score"))
            .orderBy(F.col("score").desc(), F.col("docID").asc())
            .limit(k)
            .collect()
        )
        theta = seed_scores[-1]["score"] if len(seed_scores) >= k else 0.0

        # block filter: survive iff ub ≥ θ − Σ_{t'≠t} maxub(t')
        thresh_rows = [(t, theta - (m_total - maxub[t])) for t in maxub]
        thresh_df = F.broadcast(spark.createDataFrame(thresh_rows, "term string, thr double"))
        surviving = qblocks.join(thresh_df, "term").where(F.col("ub") >= F.col("thr"))
        pruned = qblocks.join(thresh_df, "term").where(F.col("ub") < F.col("thr"))

        surv_scored = _decode_and_score(
            surviving.select("term", "w_idf", "n", "docids", "tfs", "dls"),
            avgdl, k1, b, keep_term=True,
        ).persist()
        try:
            # Bound the rescue set to the provably-still-competitive docs:
            # a doc appears in exactly one block per term, so terms seen in
            # its surviving blocks can contribute nothing more; the missed
            # contribution is ≤ Σ maxub over UNSEEN terms. Docs with
            # partial + missed_ub < θ cannot reach the top-k (θ lower-bounds
            # the true k-th score) and are dropped BEFORE the broadcast —
            # the candidate set is now O(k·surviving-block-density), not
            # "every docID in any surviving block".
            maxub_df = F.broadcast(
                spark.createDataFrame(sorted(maxub.items()), "term string, mx double")
            )
            per_doc = (
                surv_scored.join(maxub_df, "term")
                .groupBy("docID")
                .agg(F.sum("part").alias("_partial"), F.sum("mx").alias("_seen_ub"))
            )
            candidates = per_doc.where(
                F.col("_partial") + (F.lit(m_total) - F.col("_seen_ub")) >= F.lit(theta)
            ).select("docID")
            # rescue: pruned blocks overlapping any candidate (zone-map
            # range join against the small broadcast candidate set)
            rescue_blocks = (
                pruned.join(
                    F.broadcast(candidates),
                    (F.col("docID") >= F.col("first_docID")) & (F.col("docID") <= F.col("last_docID")),
                    "left_semi",
                )
            )
            rescue_scored = _decode_and_score(
                rescue_blocks.select("term", "w_idf", "n", "docids", "tfs", "dls"), avgdl, k1, b
            ).join(F.broadcast(candidates), "docID", "left_semi")

            total = (
                surv_scored.select("docID", "part")
                .unionByName(rescue_scored)
                .groupBy("docID")
                .agg(F.sum("part").alias("score"))
            )
            # materialize before unpersisting the cached intermediates
            rows = _ranked(total, k).collect()
            if stats_out is not None:
                stats_out.update(
                    {
                        "theta": theta,
                        "blocks_total": qblocks.count(),
                        "blocks_surviving": surviving.count(),
                        "blocks_rescued": rescue_blocks.count(),
                        "rescue_candidates": candidates.count(),
                    }
                )
            return spark.createDataFrame(rows, "rank int, docID long, score double")
        finally:
            surv_scored.unpersist()
    finally:
        qblocks.unpersist()


def _ranked(scores: DataFrame, k: int) -> DataFrame:
    top = scores.orderBy(F.col("score").desc(), F.col("docID").asc()).limit(k)
    w = Window.orderBy(F.col("score").desc(), F.col("docID").asc())
    return top.withColumn("rank", F.row_number().over(w)).select("rank", "docID", "score")
