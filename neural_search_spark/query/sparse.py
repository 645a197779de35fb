"""Sparse token-weight retrieval (`neural_sparse`) and the two-phase pruning
optimization.

Reference semantics:
- score(d) = Σ_{t ∈ q∩d} w_q(t) · quantize16(w_d(t)) — a linear dot product
  of query-token weights against indexed token weights
  (query/NeuralSparseQueryBuilder.java:364-376; oracle
  src/testFixtures/.../BaseNeuralSearchIT.java:1332-1345);
- quantize16 is Lucene FeatureField's 16-bit float truncation
  intBitsToFloat((floatToIntBits(x)>>15)<<15) (BaseNeuralSearchIT.java:
  1379-1384) — replicated here as a vectorized numpy bit-twiddle;
- two-phase: split query tokens at threshold = prune_ratio × max weight
  (defaults prune_ratio=0.4, expansion=5.0, max_window=10000 —
  processor/NeuralSparseTwoPhaseProcessor.java:48-53,127-155); phase 1
  scores high-weight tokens only and takes a window of size
  min(k×expansion, max_window); phase 2 adds low-weight-token contributions
  for window docs only, so window docs carry exact full scores and the rest
  keep phase-1 scores (NeuralSparseTwoPhaseProcessor.java:191-203).

The document-side weights come from any (docID, term, weight) DataFrame; the
default encoder stand-in is term frequency (no ML model in this sandbox —
the dataflow, not the weights, is what this engine owns).

Plan shape: query tokens are a broadcast literal relation; phase 2 is a
left-semi join against the (tiny) window docID set before the low-token
join, so the expensive postings scan is pruned to high-weight terms.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

PRUNE_RATIO = 0.4
EXPANSION_RATE = 5.0
MAX_WINDOW_SIZE = 10_000


from pyspark.sql.types import FloatType


@pandas_udf(FloatType())  # DataType instance: no active session needed at import
def quantize16(x: pd.Series) -> pd.Series:
    """FeatureField 16-bit quantization, vectorized: float32 bits with the
    low 15 mantissa bits zeroed."""
    bits = x.to_numpy(dtype=np.float32).view(np.int32)
    return pd.Series(((bits >> 15) << 15).view(np.float32))


def _query_df(spark, query_tokens: dict[str, float]) -> DataFrame:
    rows = [(t, float(w)) for t, w in sorted(query_tokens.items())]
    return spark.createDataFrame(rows, "term string, q_weight double")


def sparse_scores(
    doc_weights: DataFrame,
    query_tokens: dict[str, float],
    weight_col: str = "weight",
    quantize: bool = True,
) -> DataFrame:
    """(docID, score): Σ w_q(t)·[quantize16] w_d(t) over q∩d."""
    spark = doc_weights.sparkSession
    q = _query_df(spark, query_tokens)
    w_d = F.col(weight_col).cast("float")
    if quantize:
        w_d = quantize16(w_d)
    per = doc_weights.join(F.broadcast(q), "term").select(
        "docID", (F.col("q_weight") * w_d.cast("double")).alias("part")
    )
    return per.groupBy("docID").agg(F.sum("part").alias("score"))


def _ranked_topk(scores: DataFrame, k: int) -> DataFrame:
    top = scores.orderBy(F.col("score").desc(), F.col("docID").asc()).limit(k)
    w = Window.orderBy(F.col("score").desc(), F.col("docID").asc())
    return top.withColumn("rank", F.row_number().over(w)).select("rank", "docID", "score")


def sparse_topk(
    doc_weights: DataFrame,
    query_tokens: dict[str, float],
    k: int = 10,
    weight_col: str = "weight",
    quantize: bool = True,
) -> DataFrame:
    return _ranked_topk(sparse_scores(doc_weights, query_tokens, weight_col, quantize), k)


def split_query_tokens(
    query_tokens: dict[str, float], prune_ratio: float = PRUNE_RATIO
) -> tuple[dict[str, float], dict[str, float]]:
    """threshold = prune_ratio × max weight; high = w ≥ threshold
    (NeuralSparseTwoPhaseProcessor.java:134-154)."""
    if not query_tokens:
        return {}, {}
    thr = prune_ratio * max(query_tokens.values())
    high = {t: w for t, w in query_tokens.items() if w >= thr}
    low = {t: w for t, w in query_tokens.items() if w < thr}
    return high, low


def two_phase_sparse_topk(
    doc_weights: DataFrame,
    query_tokens: dict[str, float],
    k: int = 10,
    prune_ratio: float = PRUNE_RATIO,
    expansion_rate: float = EXPANSION_RATE,
    max_window_size: int = MAX_WINDOW_SIZE,
    weight_col: str = "weight",
    quantize: bool = True,
) -> DataFrame:
    """Two-phase pruned top-k; for the returned k docs scores are exact
    (high+low), matching the reference's rescore contract."""
    high, low = split_query_tokens(query_tokens, prune_ratio)
    window = min(int(k * expansion_rate), max_window_size)
    phase1 = sparse_scores(doc_weights, high, weight_col, quantize)
    win = phase1.orderBy(F.col("score").desc(), F.col("docID").asc()).limit(window)
    if low:
        low_scores = sparse_scores(
            doc_weights.join(win.select("docID"), "docID", "left_semi"),
            low,
            weight_col,
            quantize,
        ).withColumnRenamed("score", "low_score")
        rescored = win.join(low_scores, "docID", "left").select(
            "docID",
            (F.col("score") + F.coalesce(F.col("low_score"), F.lit(0.0))).alias("score"),
        )
    else:
        rescored = win
    return _ranked_topk(rescored, k)
