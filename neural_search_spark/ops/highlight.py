"""Search-hit highlighting — best-window fragment per matching doc.

The analog of Lucene's UnifiedHighlighter for the engine's token-stream
world: pick the token window with the most query-term hits (Lucene scores
passages with BM25 over passage term stats — documented divergence: hit
count is deterministic, stats-free, and rank-equivalent for single-field
fragments), emit it with matched tokens wrapped in pre/post tags.

Window selection: candidate starts are the hit positions themselves
(a best window always exists that starts at a hit); the winner maximizes
hits in [h, h + frag_size), ties → earliest. The emitted fragment starts
`lead` tokens before the winning hit (clamped to 0) to give context.

Everything is Spark higher-order functions over the tokenized column —
whole-stage-codegen, zero Python, zero shuffles; cost is O(hits²) per doc
with hits = query-term occurrences, the same row-local work Lucene's
passage former does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from neural_search_spark.analysis.tokenizer import tokenize_col


def highlight(
    docs: DataFrame,
    terms: list[str],
    text_col: str = "text",
    id_col: str = "docID",
    frag_size: int = 10,
    lead: int = 2,
    pre_tag: str = "<em>",
    post_tag: str = "</em>",
    tokenizer: str = "standard",
) -> DataFrame:
    """(id, n_hits, fragment) for every doc containing ≥1 query term.

    The fragment is `frag_size` tokens starting `lead` tokens before the
    best-window hit, matched tokens wrapped in pre/post tags, joined by
    single spaces (the engine tokenizes for matching, so fragments are in
    token space — original whitespace/casing is not reconstructed).
    """
    if frag_size < 1 or lead < 0:
        raise ValueError("frag_size must be >= 1 and lead >= 0")
    uniq = sorted(set(terms))
    if not uniq:
        raise ValueError("highlight needs at least one term")
    tset = F.array(*[F.lit(t) for t in uniq])
    base = docs.select(
        F.col(id_col).alias("id"), tokenize_col(text_col, tokenizer).alias("_toks")
    )
    # 0-based positions of query-term hits
    hits = F.filter(
        F.transform(
            "_toks",
            lambda t, i: F.when(F.array_contains(tset, t), i).otherwise(F.lit(-1)),
        ),
        lambda x: x >= 0,
    )
    withhits = base.withColumn("_hits", hits).where(F.size("_hits") > 0)
    # best window start: the hit maximizing hits within [h, h+frag_size);
    # fold keeps (best_count, best_h), ties resolved to the EARLIEST hit
    # because a later equal count does not displace the incumbent
    best = F.aggregate(
        "_hits",
        F.struct(F.lit(0).alias("cnt"), F.lit(0).alias("h")),
        lambda acc, h: F.when(
            F.size(
                F.filter("_hits", lambda q: (q >= h) & (q < h + F.lit(frag_size)))
            )
            > acc["cnt"],
            F.struct(
                F.size(
                    F.filter("_hits", lambda q: (q >= h) & (q < h + F.lit(frag_size)))
                ).alias("cnt"),
                h.alias("h"),
            ),
        ).otherwise(acc),
    )
    sel = withhits.withColumn("_best", best).select(
        "id",
        F.size("_hits").cast("int").alias("n_hits"),
        F.greatest(F.col("_best")["h"] - F.lit(lead), F.lit(0)).alias("_start"),
        "_toks",
    )
    # slice is 1-based; wrap matched tokens, join with single spaces
    frag = F.array_join(
        F.transform(
            F.slice("_toks", F.col("_start") + 1, frag_size),
            lambda t: F.when(
                F.array_contains(tset, t), F.concat(F.lit(pre_tag), t, F.lit(post_tag))
            ).otherwise(t),
        ),
        " ",
    )
    return sel.select("id", "n_hits", frag.alias("fragment"))
