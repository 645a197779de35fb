"""Field collapsing — one best hit per field value (OpenSearch `collapse`).

OpenSearch's CollapsingTopDocsCollector keeps, per distinct value of the
collapse field, only the highest-scoring hit, then ranks the group winners;
`inner_hits` optionally retains the top-n per group. Relationally this is a
dense per-group top-n (window row_number over the collapse key), which
shuffles once on the key with map-side partial aggregation unavailable —
but the window input is the SCORED match set, not the corpus, and the
subsequent global top-k is the usual bounded-heap TakeOrderedAndProject.

At 100 TB the scored set for a selective query is itself small; for dense
match sets the key-partitioned window is the same cost class as the
score aggregation that produced them (one exchange each).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def collapse_topk(
    scored: DataFrame,
    docs: DataFrame,
    field: str,
    k: int = 10,
    inner_hits: int = 1,
    id_col: str = "docID",
) -> DataFrame:
    """(rank, docID, score, <field>[, group_rank]) — top-k group winners.

    `scored` is any (docID, score) frame; `docs` supplies the collapse
    field. Within a group, hits order by score desc / docID asc (the
    engine-wide tie-break); groups rank by their best hit. inner_hits > 1
    keeps that many hits per group (group_rank column added), still
    bounded by k groups.
    """
    if inner_hits < 1:
        raise ValueError("inner_hits must be >= 1")
    joined = scored.join(
        docs.select(F.col(id_col).alias("docID"), F.col(field)), "docID"
    )
    in_group = Window.partitionBy(field).orderBy(
        F.col("score").desc(), F.col("docID").asc()
    )
    ranked = joined.withColumn("group_rank", F.row_number().over(in_group))
    winners = ranked.where(F.col("group_rank") == 1)
    top_groups = (
        winners.orderBy(F.col("score").desc(), F.col("docID").asc())
        .limit(k)
        .select(
            F.col(field).alias("_g"),
            F.col("score").alias("_gscore"),
            F.col("docID").alias("_gdoc"),
        )
    )
    if inner_hits == 1:
        out = winners.join(F.broadcast(top_groups), winners[field] == F.col("_g"))
    else:
        out = ranked.where(F.col("group_rank") <= inner_hits).join(
            F.broadcast(top_groups), ranked[field] == F.col("_g")
        )
    w = Window.orderBy(
        F.col("_gscore").desc(), F.col("_gdoc").asc(), F.col("group_rank").asc()
    )
    out = out.withColumn("rank", F.row_number().over(w))
    cols = ["rank", "docID", "score", field]
    if inner_hits > 1:
        cols.append("group_rank")
    return out.select(*cols)
