"""Text chunking operators, mirroring the reference's two chunker algorithms
and their shared `max_chunk_limit` contract.

Reference semantics reproduced exactly:
- fixed_token_length (processor/chunker/FixedTokenLengthChunker.java:120-157):
  token windows of `token_limit` advancing by token_limit − floor(token_limit
  × overlap_rate); defaults token_limit=384, overlap_rate=0.0, tokenizer
  "standard" (FixedTokenLengthChunker.java:37-39). Divergence (documented):
  the reference slices the ORIGINAL string by token character offsets
  (gap characters included); we re-join tokens with single spaces —
  offset-tracking is not reproducible in the DuckDB oracle, and the token
  sequence per chunk is identical.
- delimiter (processor/chunker/DelimiterChunker.java:53-77): split on a
  literal delimiter, each chunk KEEPS its trailing delimiter
  (content.substring(start, delimiterEnd)); consecutive delimiters yield
  delimiter-only chunks (never dropped); the remainder after the last
  delimiter becomes a final chunk only if non-empty. Default "\\n\\n".
- max_chunk_limit (processor/chunker/Chunker.java:14-49, default 100,
  -1 = disabled): when adding another chunk would reach the limit, the
  REST of the content becomes one final unsplit chunk — output is capped
  at `max_chunk_limit` chunks with the tail merged, not truncated.

Spark-first: chunk arrays are built as pure Column expressions
(split/slice/transform/sequence) and posexploded — one codegen'd
projection, no UDF, no shuffle; a 10^12-turn corpus chunks in a single
narrow stage.
"""

from __future__ import annotations

import re as _re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from neural_search_spark.analysis.tokenizer import tokenize_col

DEFAULT_MAX_CHUNK_LIMIT = 100  # Chunker.java:17
DISABLED_MAX_CHUNK_LIMIT = -1  # Chunker.java:18


def _apply_chunk_limit(chunks: Column, remainder_from: Column, limit: int) -> Column:
    """Shared max_chunk_limit contract (Chunker.checkRunTimeMaxChunkLimit,
    Chunker.java:43-48 with chunk_string_count=1): when the natural chunk
    count exceeds `limit`, keep the first limit−1 chunks and merge the rest
    into one final chunk. `remainder_from` is a function-free Column:
    element i of the array it wraps is the merged tail starting at chunk i
    — we only read element limit−1."""
    if limit == DISABLED_MAX_CHUNK_LIMIT:
        return chunks
    if limit <= 0:
        raise ValueError("max_chunk_limit must be a positive integer or -1 (disabled)")
    truncated = F.concat(
        F.slice(chunks, 1, limit - 1) if limit > 1 else F.array(),
        F.array(remainder_from),
    )
    return F.when(F.size(chunks) > limit, truncated).otherwise(chunks)


def chunk_fixed_token_length(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    token_limit: int = 384,
    overlap_rate: float = 0.0,
    tokenizer: str = "standard",
    max_chunk_limit: int = DISABLED_MAX_CHUNK_LIMIT,
) -> DataFrame:
    """(id, chunk_idx, chunk_text, n_chunk_tokens): token windows of size
    `token_limit`, consecutive windows overlap by floor(token_limit ×
    overlap_rate) tokens. Empty docs produce no chunks. With
    `max_chunk_limit` ≠ -1 the final chunk extends to the end of the
    document once the limit is reached (FixedTokenLengthChunker.java:
    138-142 "include all characters till the end if exceeds max chunk
    limit")."""
    if not 0.0 <= overlap_rate <= 0.5:
        raise ValueError("overlap_rate must be in [0, 0.5] (reference FixedTokenLengthChunker)")
    if token_limit <= 0:
        raise ValueError("token_limit must be a positive integer")
    step = token_limit - int(token_limit * overlap_rate)
    toks = tokenize_col(text_col, tokenizer)
    df = df.select(F.col(id_col), toks.alias("_toks")).where(F.size("_toks") > 0)
    grid = F.sequence(F.lit(1), F.size("_toks"), F.lit(step))
    # the reference loop breaks once a window reaches the end of the token
    # sequence (start + token_limit >= size, FixedTokenLengthChunker.java:
    # 146-151) — drop grid starts past the first such "final" start, else a
    # short tail would be emitted twice
    starts = F.filter(
        grid,
        lambda s: (s == 1) | (s - 1 - step + token_limit < F.size("_toks")),
    )
    if max_chunk_limit != DISABLED_MAX_CHUNK_LIMIT:
        if max_chunk_limit <= 0:
            raise ValueError("max_chunk_limit must be a positive integer or -1 (disabled)")
        starts = F.when(
            F.size(starts) > max_chunk_limit, F.slice(starts, 1, max_chunk_limit)
        ).otherwise(starts)
    out = df.select(
        F.col(id_col),
        F.posexplode(starts).alias("chunk_idx", "_start"),
        F.col("_toks"),
    )
    # the chunk that hit the limit swallows every remaining token
    to_end = F.size("_toks") - F.col("_start") + 1
    length = (
        F.when(F.lit(max_chunk_limit != DISABLED_MAX_CHUNK_LIMIT) & (F.col("chunk_idx") == max_chunk_limit - 1), to_end)
        .otherwise(F.lit(token_limit))
    )
    chunk = F.slice(F.col("_toks"), F.col("_start"), length)
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
    max_chunk_limit: int = DISABLED_MAX_CHUNK_LIMIT,
) -> DataFrame:
    """(id, chunk_idx, chunk_text): reference-parity delimiter chunking
    (DelimiterChunker.java:53-77) — every chunk up to the last KEEPS its
    trailing delimiter (chunk = content.substring(start, delimiterEnd)),
    delimiter-only chunks from consecutive delimiters are kept, and the
    post-delimiter remainder is emitted only when non-empty. With
    `max_chunk_limit` ≠ -1 the tail past chunk limit−1 is re-joined into one
    final chunk (DelimiterChunker.java:63-65 break + :72-74 rest-append)."""
    if not delimiter:
        raise ValueError("delimiter must be a non-empty string (DelimiterChunker.java:41)")
    parts = F.split(F.col(text_col), _re.escape(delimiter), -1)
    n = F.size(parts)
    with_delim = F.transform(
        F.slice(parts, 1, n - 1), lambda p: F.concat(p, F.lit(delimiter))
    )
    last = F.filter(F.slice(parts, n, 1), lambda p: F.length(p) > 0)
    chunks = F.concat(with_delim, last)
    if max_chunk_limit != DISABLED_MAX_CHUNK_LIMIT:
        # rest of the content from part index `limit` on, delimiters intact
        # (equals content.substring(start) in the reference loop)
        remainder = F.array_join(F.slice(parts, max_chunk_limit, n - max_chunk_limit + 1), delimiter)
        chunks = _apply_chunk_limit(chunks, remainder, max_chunk_limit)
    out = df.select(F.col(id_col), F.posexplode(chunks).alias("chunk_idx", "chunk_text"))
    return out


# -- chunker registry (the ChunkerFactory analog, chunker/ChunkerFactory
# .java:1-36: algorithm name → chunker constructor) --------------------------

CHUNKERS = {
    "fixed_token_length": chunk_fixed_token_length,
    "delimiter": chunk_delimiter,
}


def get_chunker(algorithm: str):
    """Look up a chunking algorithm by name; raises on unknown names with
    the supported set, mirroring ChunkerFactory.create (ChunkerFactory
    .java:25-35)."""
    if algorithm not in CHUNKERS:
        raise ValueError(
            f"Chunking algorithm [{algorithm}] is not supported. "
            f"Supported algorithms are {sorted(CHUNKERS)}"
        )
    return CHUNKERS[algorithm]
