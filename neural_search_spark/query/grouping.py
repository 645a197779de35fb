"""Group-level retrieval — rank GROUPS of documents by their members'
combined query scores.

This is the conversation-level search shape for multi-turn transcripts
(parent = `conv_id`, children = turns): "find the conversations most about
X", not "the single best turn". The semantics mirror Lucene's
ToParentBlockJoinQuery ScoreMode (OpenSearch `has_child` / `nested`
queries): the parent's score combines its matching children under
``max`` / ``sum`` (Lucene Total) / ``avg`` / ``min``; ``none`` ranks
matched groups constant-score. Collapse (`query/collapse.py`) is the
special case "max + rank by winner"; this module makes the combiner a
parameter and returns GROUP rows, with optional inner hits.

Plan shape (100 TB): the member scores are whatever the query kind already
produces (fused single scan for lexical); combining is ONE map-side-
combinable groupBy on the group key over the SCORED match set (query-
bounded, not corpus-sized) + the usual bounded top-k. Inner hits add one
window over the same frame, restricted to the k winning groups by a
broadcast semi-join — never a corpus-wide window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SCORE_MODES = ("max", "sum", "avg", "min", "none")


def group_topk(
    scored: DataFrame,
    docs: DataFrame,
    group_field: str,
    k: int = 10,
    score_mode: str = "max",
    inner_hits: int = 0,
    id_col: str = "docID",
) -> DataFrame:
    """(rank, <group_field>, score, n_hits[, hit_rank, docID, hit_score]).

    `scored` is any (docID, score) frame; `docs` supplies the group key.
    Groups rank by combined score desc, group key asc (deterministic).
    ``inner_hits`` > 0 additionally returns that many best members per
    winning group (hit order: score desc, docID asc).
    """
    if score_mode not in SCORE_MODES:
        raise ValueError(f"score_mode must be one of {SCORE_MODES}, got {score_mode!r}")
    if inner_hits < 0:
        raise ValueError("inner_hits must be >= 0")
    joined = scored.join(
        docs.select(F.col(id_col).alias("docID"), F.col(group_field)), "docID"
    )
    combiner = {
        "max": F.max("score"),
        "sum": F.sum("score"),
        "avg": F.avg("score"),
        "min": F.min("score"),
        "none": F.lit(1.0),
    }[score_mode]
    agg = joined.groupBy(group_field).agg(
        combiner.alias("gscore"), F.count("*").cast("long").alias("n_hits")
    )
    top = agg.orderBy(F.col("gscore").desc(), F.col(group_field).asc()).limit(k)
    w = Window.orderBy(F.col("gscore").desc(), F.col(group_field).asc())
    top = top.withColumn("rank", F.row_number().over(w).cast("long"))
    if inner_hits == 0:
        return top.select("rank", group_field, F.col("gscore").alias("score"), "n_hits")
    members = joined.join(
        F.broadcast(top.select(group_field, "rank", "gscore", "n_hits")), group_field
    )
    in_group = Window.partitionBy(group_field).orderBy(
        F.col("score").desc(), F.col("docID").asc()
    )
    return (
        members.withColumn("hit_rank", F.row_number().over(in_group).cast("long"))
        .where(F.col("hit_rank") <= inner_hits)
        .select(
            "rank",
            group_field,
            F.col("gscore").alias("score"),
            "n_hits",
            "hit_rank",
            "docID",
            F.col("score").alias("hit_score"),
        )
    )
