"""Compressed posting segments: salted build, block-max metadata, merge.

Output table (one row per posting block; parquet, directory-partitioned by
`shard` for query-time file pruning):

    shard: int            pmod(xxhash64(term), n_shards) — partition column
    term: string
    salt: int             range-salt bucket (see below), 0 for tail terms
    blockID: int          ordinal within (term, salt)
    first_docID: long     min docID in block   (block-level zone map)
    last_docID: long      max docID in block
    n: int                postings in block (≤ block_size)
    max_score_component: float
                          max over block of tf/(tf + k1·(1-b+b·dl/avgdl))
                          — exact per-block BM25 upper-bound factor; query UB
                          = w_q·idf(t)·max_score_component (block-max WAND,
                          the set-at-a-time analog of the reference's
                          HybridScoreBlockBoundaryPropagator.java:39-98)
    docids: binary        delta+varint (strictly increasing within block)
    tfs: binary           varint
    dls: binary           varint — doc length carried IN the segment so
                          query-time scoring needs no doclens shuffle join

Skew handling (the reference shards by document and never partitions by term
— term skew is specific to our term-major layout): head terms whose df
exceeds `postings_per_salt` are split into `s_t = ceil(df/postings_per_salt)`
*contiguous docID ranges* (salt = docID div ceil((maxDoc+1)/s_t)).  Range
salting (vs hash salting) keeps each salted sub-list sorted AND globally
ordered across salts, so the hierarchical merge of salted sub-segments is
pure concatenation — no k-way interleave.  Tail terms (the vast majority)
get salt 0 and hash-partition by term alone.

Physical build: one `repartition(term, salt)` shuffle, then
sortWithinPartitions(term, salt, docID) + mapInPandas — a single pass of
vectorized numpy per partition, carrying group fragments across Arrow batch
boundaries (no per-row Python, no per-term applyInPandas group overhead).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from neural_search_spark import B, K1
from neural_search_spark.index.codec import encode_docids, varint_encode

BLOCK_SIZE = 128
POSTINGS_PER_SALT = 250_000
N_SHARDS = 32

SEGMENT_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("salt", T.IntegerType(), False),
        T.StructField("blockID", T.IntegerType(), False),
        T.StructField("first_docID", T.LongType(), False),
        T.StructField("last_docID", T.LongType(), False),
        T.StructField("n", T.IntegerType(), False),
        T.StructField("max_score_component", T.FloatType(), False),
        T.StructField("docids", T.BinaryType(), False),
        T.StructField("tfs", T.BinaryType(), False),
        T.StructField("dls", T.BinaryType(), False),
    ]
)


def shard_col(term_col) -> F.Column:
    return F.pmod(F.xxhash64(term_col), F.lit(N_SHARDS)).cast("int")


def _encode_group(term: str, salt: int, doc: np.ndarray, tf: np.ndarray, dl: np.ndarray, avgdl: float, block_size: int):
    """One (term, salt) posting list → block rows. Input sorted by docID."""
    comp = tf / (tf + K1 * (1.0 - B + B * dl / avgdl))
    rows = []
    for b0 in range(0, doc.size, block_size):
        sl = slice(b0, min(b0 + block_size, doc.size))
        d, t, ln, c = doc[sl], tf[sl], dl[sl], comp[sl]
        rows.append(
            (
                term,
                salt,
                b0 // block_size,
                int(d[0]),
                int(d[-1]),
                int(d.size),
                np.float32(c.max()),
                encode_docids(d.astype(np.uint64)),
                varint_encode(t.astype(np.uint64)),
                varint_encode(ln.astype(np.uint64)),
            )
        )
    return rows


def build_segments(
    postings_with_dl: DataFrame,
    avgdl: float,
    max_doc_id: int,
    postings_per_salt: int = POSTINGS_PER_SALT,
    block_size: int = BLOCK_SIZE,
    num_partitions: int | None = None,
    term_stats: DataFrame | None = None,
) -> DataFrame:
    """postings_with_dl: (term, docID, tf, dl) → segment block table.

    `term_stats` (term, df) supplies the head-term list; only terms with
    df > postings_per_salt enter the (small, broadcast) salt map.
    """
    spark = postings_with_dl.sparkSession
    num_partitions = num_partitions or spark.sparkContext.defaultParallelism * 2

    if term_stats is None:
        term_stats = postings_with_dl.groupBy("term").agg(F.count("*").alias("df"))
    head = term_stats.filter(F.col("df") > postings_per_salt).select(
        "term",
        F.ceil(F.col("df") / postings_per_salt).cast("int").alias("n_salts"),
    )
    df = postings_with_dl.join(F.broadcast(head), "term", "left").withColumn(
        "n_salts", F.coalesce(F.col("n_salts"), F.lit(1))
    )
    width = F.greatest(F.ceil(F.lit(max_doc_id + 1) / F.col("n_salts")), F.lit(1))
    df = df.withColumn("salt", (F.col("docID") / width).cast("int")).drop("n_salts")

    shuffled = df.repartition(num_partitions, "term", "salt").sortWithinPartitions(
        "term", "salt", "docID"
    )

    def encode_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pending: pd.DataFrame | None = None

        def flush(chunk: pd.DataFrame, final: bool):
            nonlocal pending
            if pending is not None:
                chunk = pd.concat([pending, chunk], ignore_index=True)
                pending = None
            if chunk.empty:
                return None
            if not final:
                # hold back the trailing (term, salt) group — it may continue
                # in the next Arrow batch
                t_last = chunk["term"].iat[-1]
                s_last = chunk["salt"].iat[-1]
                tail_mask = (chunk["term"] == t_last) & (chunk["salt"] == s_last)
                # boundary of last group (groups are contiguous post-sort)
                cut = len(chunk) - int(tail_mask.values[::-1].argmin() if not tail_mask.all() else len(chunk))
                pending = chunk.iloc[cut:].copy()
                chunk = chunk.iloc[:cut]
                if chunk.empty:
                    return None
            out = []
            terms = chunk["term"].to_numpy()
            salts = chunk["salt"].to_numpy()
            docs = chunk["docID"].to_numpy(np.int64)
            tfs = chunk["tf"].to_numpy(np.int64)
            dls = chunk["dl"].to_numpy(np.int64)
            # group boundaries (sorted by term, salt)
            change = np.flatnonzero((terms[1:] != terms[:-1]) | (salts[1:] != salts[:-1])) + 1
            starts = np.concatenate(([0], change))
            ends = np.concatenate((change, [len(chunk)]))
            for s, e in zip(starts, ends):
                out.extend(
                    _encode_group(terms[s], int(salts[s]), docs[s:e], tfs[s:e], dls[s:e], avgdl, block_size)
                )
            return pd.DataFrame(out, columns=[f.name for f in SEGMENT_SCHEMA.fields])

        for batch in batches:
            res = flush(batch, final=False)
            if res is not None and not res.empty:
                yield res
        res = flush(pd.DataFrame(columns=["term", "salt", "docID", "tf", "dl"]), final=True)
        if res is not None and not res.empty:
            yield res

    return shuffled.mapInPandas(encode_partition, schema=SEGMENT_SCHEMA)


def write_segments(segments: DataFrame, path: str) -> None:
    """Sharded posting files: directory-partitioned by shard(term) so a
    query touching m terms scans at most m shard directories (partition
    pruning), with term-level row-group skipping inside via min/max stats."""
    (
        segments.withColumn("shard", shard_col(F.col("term")))
        .repartition("shard")
        .sortWithinPartitions("term", "salt", "blockID")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )


def merge_segments(spark, paths: list[str], out_path: str) -> None:
    """Hierarchical merge of segment runs covering *disjoint docID ranges*
    (the incremental-ingest case: each run indexes a new docID range).
    Because ranges are disjoint and blocks carry absolute first/last docIDs,
    merging = union + per-term re-numbering of (salt, blockID) in docID
    order — no decode/re-encode. Overlapping runs must be rebuilt instead
    (asserted)."""
    dfs = [spark.read.parquet(p) for p in paths]
    allseg = dfs[0]
    for d in dfs[1:]:
        allseg = allseg.unionByName(d)
    from pyspark.sql import Window

    # verify disjointness per term: max overlap check (cheap aggregate)
    w = Window.partitionBy("term").orderBy("first_docID")
    ordered = allseg.withColumn("_prev_last", F.lag("last_docID").over(w))
    bad = ordered.filter((F.col("_prev_last").isNotNull()) & (F.col("first_docID") <= F.col("_prev_last")))
    if bad.limit(1).count() > 0:
        raise ValueError("merge_segments: overlapping docID ranges — rebuild required")
    renum = ordered.withColumn("blockID", (F.row_number().over(w) - 1).cast("int")).withColumn(
        "salt", F.lit(0)
    ).drop("_prev_last")
    write_segments(renum.drop("shard"), out_path)
