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


def build_postings(df: DataFrame, text_col: str = "text", id_col: str = "docID") -> DataFrame:
    """(term, docID, tf). (term, docID) unique by construction.

    tf is a PER-DOCUMENT quantity, so it is computed entirely inside the row
    (sort the doc's token array, take run lengths) instead of
    explode → groupBy(term, docID): that formulation shuffles every token
    occurrence (10^13 rows at corpus scale) through a hash aggregation whose
    key cardinality ≈ total postings — measured memory-bound and the single
    largest cost of the build. Here the sort is ~100 elements, cache-local,
    whole-stage-codegen'd, and the stage is completely shuffle-free."""
    toks = tokenize_col(text_col)
    s = F.array_sort(toks)
    n = F.size(s)
    # 1-based end positions of equal-term runs in the sorted array
    ends = F.when(
        n > 0,
        F.filter(
            F.sequence(F.lit(1), n),
            lambda i: (i == n) | (F.element_at(s, i) != F.element_at(s, i + 1)),
        ),
    ).otherwise(F.array().cast("array<int>"))
    starts = F.when(
        F.size(ends) > 0,
        F.concat(F.array(F.lit(0)), F.slice(ends, F.lit(1), F.greatest(F.size(ends) - 1, F.lit(0)))),
    ).otherwise(F.array().cast("array<int>"))
    entries = F.zip_with(
        ends,
        starts,
        lambda e, st: F.struct(
            F.element_at(s, e).alias("term"), (e - st).cast("int").alias("tf")
        ),
    )
    return df.select(
        F.col(id_col).cast("long").alias("docID"), F.explode(entries).alias("kv")
    ).select(F.col("kv.term").alias("term"), "docID", F.col("kv.tf").alias("tf"))


def build_doclens(df: DataFrame, text_col: str = "text", id_col: str = "docID") -> DataFrame:
    """(docID, dl): dl = token count. Computed from the token array length —
    no explode needed, stays one row per doc end-to-end."""
    return df.select(
        F.col(id_col).cast("long").alias("docID"),
        F.size(tokenize_col(text_col)).alias("dl"),
    )


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


def build_index_tables(df: DataFrame, text_col: str = "text", id_col: str = "docID") -> IndexTables:
    postings = build_postings(df, text_col, id_col)
    doclens = build_doclens(df, text_col, id_col)
    return IndexTables(
        postings=postings,
        doclens=doclens,
        term_stats=build_term_stats(postings),
        meta=collection_meta(doclens),
    )
