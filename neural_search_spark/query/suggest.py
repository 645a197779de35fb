"""Term suggester (did-you-mean) over the term dictionary.

The OpenSearch term suggester proposes corrections for a possibly
misspelled input token from the indexed vocabulary. Semantics here
(documented, deterministic):

- candidates = dictionary terms within `max_edits` classic Levenshtein
  (same ``fuzzy_transpositions: false`` convention as query/multiterm.py,
  so Spark and the DuckDB oracle agree exactly), optionally constrained to
  share a `prefix_length` prefix (the OpenSearch default prefix_length=1
  — misspellings rarely break the first letter, and the prefix pushes
  into the dictionary scan);
- an exact dictionary hit (distance 0) is excluded, matching the
  suggester's default suggest_mode=missing spirit: you ask for
  corrections, not confirmation;
- ranking: distance asc, document frequency desc, term asc — the
  "score by edit proximity, break ties by popularity" default.

Scale shape: one filter + TakeOrderedAndProject over the term DICTIONARY
(vocabulary-sized, orders of magnitude smaller than postings); the
length-window and prefix conditions push into the dictionary scan and the
Levenshtein residual runs on survivors only — same pattern as fuzzy
expansion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def term_suggest(
    term_stats: DataFrame,
    value: str,
    size: int = 5,
    max_edits: int = 2,
    prefix_length: int = 1,
) -> DataFrame:
    """Top-`size` corrections for `value`: (suggestion, distance, df, rank)."""
    if max_edits < 1:
        raise ValueError("max_edits must be >= 1")
    term = F.col("term")
    cond = (
        F.length(term).between(len(value) - max_edits, len(value) + max_edits)
        & (term != F.lit(value))
    )
    if prefix_length > 0:
        cond = cond & term.startswith(value[:prefix_length])
    cand = term_stats.where(cond).withColumn(
        "distance", F.levenshtein(term, F.lit(value))
    ).where(F.col("distance") <= F.lit(max_edits))
    top = cand.orderBy(
        F.col("distance").asc(), F.col("df").desc(), F.col("term").asc()
    ).limit(size)
    w = Window.orderBy(F.col("distance").asc(), F.col("df").desc(), F.col("term").asc())
    return top.withColumn("rank", F.row_number().over(w).cast("long")).select(
        "rank", F.col("term").alias("suggestion"),
        F.col("distance").cast("long").alias("distance"), F.col("df").cast("long").alias("df"),
    )


def completion_suggest(
    term_stats: DataFrame,
    prefix: str,
    size: int = 5,
) -> DataFrame:
    """Completion suggester (search-as-you-type): dictionary terms starting
    with `prefix`, ranked df desc / term asc — popularity-first, like the
    completion suggester's default weight ordering. (rank, suggestion, df).

    Scale shape: StringStartsWith pushes into the dictionary scan;
    TakeOrderedAndProject bounds the result — no global sort. The
    OpenSearch completion suggester uses a dedicated FST field; over a
    vocabulary-sized dictionary table the pushed prefix scan is the
    Spark-idiomatic equivalent."""
    if not prefix:
        raise ValueError("prefix must be non-empty")
    cand = term_stats.where(F.col("term").startswith(prefix))
    top = cand.orderBy(F.col("df").desc(), F.col("term").asc()).limit(size)
    w = Window.orderBy(F.col("df").desc(), F.col("term").asc())
    return top.withColumn("rank", F.row_number().over(w).cast("long")).select(
        "rank", F.col("term").alias("suggestion"), F.col("df").cast("long").alias("df")
    )
