"""Text chunking operators, mirroring the reference's two chunker algorithms
(reference: processor/chunker/FixedTokenLengthChunker.java:120-157 — token
windows of `token_limit` advancing by token_limit − overlap; and
processor/chunker/DelimiterChunker.java:53-77 — split on a literal
delimiter). Reference defaults: token_limit=384, overlap_rate≤0.5, delimiter
"\\n\\n" (FixedTokenLengthChunker.java:44-52, DelimiterChunker defaults).

Spark-first: chunk start offsets are a `sequence(...)` array, exploded —
one codegen'd projection, no UDF; a 10^12-turn corpus chunks in a single
narrow (shuffle-free) stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from neural_search_spark.analysis.tokenizer import tokenize_col


def chunk_fixed_token_length(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    token_limit: int = 384,
    overlap_rate: float = 0.0,
) -> DataFrame:
    """(id, chunk_idx, chunk_text, n_chunk_tokens): token windows of size
    `token_limit`, consecutive windows overlap by floor(token_limit ×
    overlap_rate) tokens. Empty docs produce no chunks."""
    if not 0.0 <= overlap_rate <= 0.5:
        raise ValueError("overlap_rate must be in [0, 0.5] (reference FixedTokenLengthChunker)")
    step = token_limit - int(token_limit * overlap_rate)
    toks = tokenize_col(text_col)
    df = df.select(F.col(id_col), toks.alias("_toks")).where(F.size("_toks") > 0)
    starts = F.sequence(F.lit(1), F.size("_toks"), F.lit(step))
    out = df.select(
        F.col(id_col),
        F.posexplode(starts).alias("chunk_idx", "_start"),
        F.col("_toks"),
    )
    chunk = F.slice(F.col("_toks"), F.col("_start"), token_limit)
    return out.select(
        F.col(id_col),
        F.col("chunk_idx"),
        F.concat_ws(" ", chunk).alias("chunk_text"),
        F.size(chunk).alias("n_chunk_tokens"),
    )


def chunk_delimiter(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    delimiter: str = "\n\n",
) -> DataFrame:
    """(id, chunk_idx, chunk_text): split on a literal delimiter, drop empty
    chunks, keep original order via chunk_idx."""
    import re

    parts = F.split(F.col(text_col), re.escape(delimiter), -1)
    out = df.select(F.col(id_col), F.posexplode(parts).alias("chunk_idx", "chunk_text"))
    return out.where(F.length("chunk_text") > 0)
