"""Logical index tables: postings / doclens / term_stats / meta.

This is the uncompressed, relational view of the inverted index — the
equivalent of Lucene's postings + norms + collection statistics that the
reference plugin reads through FeatureField / BM25Similarity (reference
scoring surface: query/NeuralSparseQueryBuilder.java:364-376; stats are
implicit in Lucene, surfaced by the reference's test oracle
src/testFixtures/.../BaseNeuralSearchIT.java:1332-1345).

All construction is declarative DataFrame dataflow:
  tokenize (codegen'd regexp)  →  posexplode  →  groupBy(docID, term).count()
so Catalyst gives partial (map-side) aggregation before the shuffle on
(docID, term), and column pruning reaches the parquet scan (only the text +
id columns are read).

Scale notes (100 TB / 10^12 turns):
- the posexplode fan-out never materializes per-token rows wider than
  (docID, term); text is dropped before the shuffle.
- term_stats counts rows of the already-aggregated postings (exact df, no
  distinct over raw tokens).
- doclens aggregates by docID only — co-partitioned with the postings
  groupBy when AQE reuses the exchange.
- meta is 1 row; stats/meta are broadcast at query time, never shuffled.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from neural_search_spark.analysis.tokenizer import tokenize_col


@dataclass
class IndexTables:
    postings: DataFrame  # term, docID, tf
    doclens: DataFrame  # docID, dl
    term_stats: DataFrame  # term, df
    meta: DataFrame  # N, avgdl


def _tokens(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    return df.select(
        F.col(id_col).cast("long").alias("docID"),
        F.explode(tokenize_col(text_col)).alias("term"),
    )


def build_postings(
    df: DataFrame, text_col: str = "text", id_col: str = "docID", one_row_per_doc: bool = True
) -> DataFrame:
    """(term, docID, tf, dl). (term, docID) unique in the output — downstream
    segment encoding depends on it.

    `dl` (the document's token count) is carried ON the posting row: it is
    known for free in the same batch-local pass that counts tfs, and having
    it inline means neither the segment build nor relational BM25 scoring
    ever needs the postings ⋈ doclens shuffle join on docID again — at
    corpus scale that join re-shuffles the entire 10^13-row posting stream
    once more; here it costs one int32 column that parquet RLE-compresses
    to ~nothing (constant within a doc, rows arrive doc-clustered).

    PRECONDITION (default fast path): each docID occupies exactly ONE input
    row. The batch-local counter below relies on it; feeding multiple rows
    per docID (e.g. chunked or unioned documents) would silently emit
    duplicate (term, docID) rows with split tfs. Callers with multi-row
    docIDs must pass `one_row_per_doc=False`, which falls back to the
    global explode → groupBy(term, docID) aggregation (one extra shuffle,
    but correct for any row multiplicity).

    Fast path: tf is a PER-DOCUMENT quantity — every row of a document
    lives in one Arrow batch — so it is counted batch-locally (pandas khash
    groupby, C level) instead of explode → groupBy(term, docID): that
    formulation shuffles every token occurrence (10^13 rows at corpus
    scale) through a hash aggregation whose key cardinality ≈ total
    postings, measured as the single most memory-bound stage of the build.
    This stage is completely shuffle-free and ~1.4× faster than the JVM
    hash-agg even at small scale. (A pure-Column alternative with
    higher-order functions was measured slower: Spark HOF lambdas are
    interpreted per element.)"""
    if not one_row_per_doc:
        from pyspark.sql import Window

        toks = df.select(
            F.col(id_col).cast("long").alias("docID"),
            F.explode(tokenize_col(text_col)).alias("term"),
        )
        agg = toks.groupBy("term", "docID").agg(F.count("*").cast("int").alias("tf"))
        # dl = Σ tf per doc; the fallback path pays one extra docID exchange
        # for it (the fast path gets dl batch-locally)
        return agg.withColumn(
            "dl", F.sum("tf").over(Window.partitionBy("docID")).cast("int")
        )
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("term", T.StringType(), False),
            T.StructField("docID", T.LongType(), False),
            T.StructField("tf", T.IntegerType(), False),
            T.StructField("dl", T.IntegerType(), False),
        ]
    )

    def tf_batches(batches):
        # Arrow-NATIVE tf kernel (mapInArrow): token strings never become
        # Python objects. The old pandas formulation materialized every
        # token occurrence as a CPython str (10^7 allocations per batch) —
        # measured as an allocator/page-fault storm at high parallelism
        # (32-worker run: 87s utime vs 669s KERNEL time) on top of a slow
        # object-key groupby. Here: list_flatten + dictionary_encode give
        # int term codes in C++ over Arrow buffers, the (term, doc)
        # composite key is int64 arithmetic, tf is a bincount, and the
        # output batch's term column is built by pc.take on the batch
        # dictionary — fixed-width numpy + Arrow end to end.
        import pyarrow as pa
        import pyarrow.compute as pc

        for rb in batches:
            nrows = rb.num_rows
            if nrows == 0:
                continue
            toks = rb.column(rb.schema.get_field_index("toks"))
            docid = rb.column(rb.schema.get_field_index("docID"))
            lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
            flat = pc.list_flatten(toks)
            if len(flat) == 0:
                continue
            denc = pc.dictionary_encode(flat)
            tcodes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            docidx = np.repeat(np.arange(nrows, dtype=np.int64), lens)
            key = tcodes * nrows + docidx  # < vocab_batch × batch_rows ≪ 2⁶³
            kcodes, kuniq = pd.factorize(key, sort=False)  # int64 khash — no objects
            kuniq = np.asarray(kuniq, dtype=np.int64)
            tf = np.bincount(kcodes).astype(np.int32)
            g_t = kuniq // nrows
            g_d = kuniq % nrows
            docs_arr = docid.to_numpy(zero_copy_only=False)
            yield pa.record_batch(
                [
                    pc.take(denc.dictionary, pa.array(g_t)).cast(pa.string()),
                    pa.array(docs_arr[g_d], type=pa.int64()),
                    pa.array(tf, type=pa.int32()),
                    pa.array(lens[g_d].astype(np.int32), type=pa.int32()),
                ],
                names=["term", "docID", "tf", "dl"],
            )

    base = df.select(
        F.col(id_col).cast("long").alias("docID"), tokenize_col(text_col).alias("toks")
    )
    return base.mapInArrow(tf_batches, schema=schema)


def build_doclens(df: DataFrame, text_col: str = "text", id_col: str = "docID") -> DataFrame:
    """(docID, dl): dl = token count. Computed from the token array length —
    no explode needed, stays one row per doc end-to-end."""
    return df.select(
        F.col(id_col).cast("long").alias("docID"),
        F.size(tokenize_col(text_col)).alias("dl"),
    )


def build_doclens_from_postings(
    postings: DataFrame, docs: DataFrame | None = None, id_col: str = "docID"
) -> DataFrame:
    """(docID, dl) derived as Σ tf over the postings — identical to
    build_doclens but avoids re-tokenizing the corpus when the postings are
    already materialized (the pipeline case: postings persist/parquet is
    the barrier, everything downstream derives from it). Because a doc's
    postings are emitted batch-locally, the map-side partial aggregate
    collapses each partition to one row per doc before the exchange — the
    shuffle carries ~N rows however many postings there are. Docs with zero
    tokens have no postings rows; pass `docs` to complete them with dl=0.
    """
    dl = postings.groupBy("docID").agg(F.sum("tf").cast("int").alias("dl"))
    if docs is not None:
        ids = docs.select(F.col(id_col).cast("long").alias("docID"))
        dl = ids.join(dl, "docID", "left").select(
            "docID", F.coalesce(F.col("dl"), F.lit(0)).alias("dl")
        )
    return dl


def build_term_stats(postings: DataFrame) -> DataFrame:
    """(term, df) — exact document frequency (north rule forbids approx:
    rank-identity requires exact idf)."""
    return postings.groupBy("term").agg(F.count("*").cast("long").alias("df"))


def collection_meta(doclens: DataFrame) -> DataFrame:
    """(N, avgdl) — single row, broadcast at query time."""
    return doclens.agg(
        F.count("*").alias("N"),
        F.avg("dl").alias("avgdl"),
    )


def build_index_tables(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "docID",
    doclens_source: str = "docs",
) -> IndexTables:
    """doclens_source='docs' tokenizes the corpus a second time for the
    doclens (correct for any caller); 'postings' derives dl = Σ tf from the
    postings + a pruned id scan — choose it when the postings are persisted
    or checkpointed, so the corpus is read (and tokenized) exactly once in
    the whole build."""
    postings = build_postings(df, text_col, id_col)
    if doclens_source == "postings":
        doclens = build_doclens_from_postings(postings, docs=df, id_col=id_col)
    else:
        doclens = build_doclens(df, text_col, id_col)
    return IndexTables(
        postings=postings,
        doclens=doclens,
        term_stats=build_term_stats(postings),
        meta=collection_meta(doclens),
    )
