"""Batch-vs-looped multi-query benchmark (query/batch.py evidence).

Builds the synthetic transcripts index at --turns (Zipf vocabulary), then
times the SAME query set two ways, interleaved:
  looped : one engine call per query — Q corpus scans, Q jobs (the
           reference's one-query-per-request model mapped onto Spark)
  batch  : *_topk_batch — ONE corpus scan (+ the per-mode exchanges)
           for the whole set
across three --mode values: bm25 (bm25_topk vs bm25_topk_batch), sparse
(sparse_topk vs sparse_topk_batch, quantized), hybrid (hybrid_topk vs
hybrid_topk_batch — each query split into 2 sub-queries, min_max +
arithmetic mean). Rank identity between the two paths is asserted per
trial. Prints one JSON line with both walls and the amortization factor.

Usage: python tools/batch_query_bench.py [--turns 2000000] [--nq 32]
                                         [--mode bm25|sparse|hybrid]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--turns", type=int, default=2_000_000)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--nq", type=int, default=32, help="queries in the batch")
    ap.add_argument("--trials", type=int, default=2)
    ap.add_argument("--vocab-size", type=int, default=100_000)
    ap.add_argument("--mode", choices=("bm25", "sparse", "hybrid"), default="bm25")
    args = ap.parse_args()

    from neural_search_spark.data import assign_doc_ids, synthesize_transcripts
    from neural_search_spark.index.build import build_index_tables
    from neural_search_spark.query.batch import bm25_topk_batch
    from neural_search_spark.query.bm25 import bm25_topk
    from neural_search_spark.session import get_spark

    spark = get_spark(
        "batch-bench", master=f"local[{args.cpus}]", shuffle_partitions=args.cpus
    )
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="batch_bench_")
    t0 = time.time()
    tr = assign_doc_ids(
        synthesize_transcripts(
            spark, n_convs=args.turns // 10, turns_per_conv=10,
            partitions=args.cpus, tokens_per_turn=48, min_tokens=6,
            burstiness=0.15, vocab_size=args.vocab_size,
        )
    )
    t = build_index_tables(tr, doclens_source="postings")
    t.postings.write.mode("overwrite").parquet(f"{tmp}/postings")
    postings = spark.read.parquet(f"{tmp}/postings")
    from neural_search_spark.index.build import (
        build_doclens_from_postings,
        build_term_stats,
        collection_meta,
    )

    build_doclens_from_postings(postings).write.mode("overwrite").parquet(f"{tmp}/doclens")
    doclens = spark.read.parquet(f"{tmp}/doclens")
    build_term_stats(postings).write.mode("overwrite").parquet(f"{tmp}/stats")
    term_stats = spark.read.parquet(f"{tmp}/stats")
    meta_df = collection_meta(doclens)
    log(f"built {args.turns} turns in {time.time() - t0:.1f}s")

    # query mix spanning the idf spectrum: head+mid pairs, mid triples,
    # rare singletons — deterministic in the query index
    V = args.vocab_size
    qdefs: dict[int, dict[str, float]] = {}
    for i in range(args.nq):
        if i % 4 == 0:
            qdefs[i] = {f"w{1 + i % 7}": 1.0, f"w{V // 200 + i}": 1.0}
        elif i % 4 == 1:
            qdefs[i] = {f"w{V // 100 + i}": 1.0, f"w{V // 50 + i}": 2.0, f"w{V // 20 + i}": 1.0}
        elif i % 4 == 2:
            qdefs[i] = {f"w{V // 10 + i}": 1.0}
        else:
            qdefs[i] = {f"w{2 + i % 11}": 1.0, f"w{V // 500 + i}": 1.0, f"w{V // 25 + i}": 3.0}
    qrows = [(qid, term, w) for qid, terms in qdefs.items() for term, w in sorted(terms.items())]
    queries = spark.createDataFrame(qrows, "query_id long, term string, weight double")

    def keyed(rows):
        return {
            (r["query_id"], r["rank"]): (r["docID"], round(r["score"], 9)) for r in rows
        }

    if args.mode == "bm25":

        def run_batch():
            return keyed(
                bm25_topk_batch(postings, doclens, term_stats, meta_df, queries, k=10).collect()
            )

        def run_looped():
            res = {}
            for qid, terms in qdefs.items():
                for r in bm25_topk(postings, doclens, term_stats, meta_df, terms, k=10).collect():
                    res[(qid, r["rank"])] = (r["docID"], round(r["score"], 9))
            return res

    elif args.mode == "sparse":
        from pyspark.sql import functions as F

        from neural_search_spark.query.batch import sparse_topk_batch
        from neural_search_spark.query.sparse import sparse_topk

        weights_df = postings.select(
            "term", "docID", F.col("tf").cast("double").alias("weight")
        )

        def run_batch():
            return keyed(sparse_topk_batch(weights_df, queries, k=10).collect())

        def run_looped():
            res = {}
            for qid, terms in qdefs.items():
                for r in sparse_topk(weights_df, terms, k=10).collect():
                    res[(qid, r["rank"])] = (r["docID"], round(r["score"], 9))
            return res

    else:  # hybrid: each query's terms split into 2 sub-queries
        from neural_search_spark.index.build import IndexTables
        from neural_search_spark.query.batch import hybrid_topk_batch
        from neural_search_spark.query.hybrid import hybrid_topk

        def split2(terms: dict[str, float]) -> list[dict[str, float]]:
            ks = sorted(terms)
            a = {t: terms[t] for t in ks[: max(1, len(ks) // 2)]}
            b = {t: terms[t] for t in ks[max(1, len(ks) // 2):]} or dict(
                list(a.items())[:1]
            )
            return [a, b]

        hdefs = {qid: split2(terms) for qid, terms in qdefs.items()}
        hrows = [
            (qid, si, term, w)
            for qid, subs in hdefs.items()
            for si, sub in enumerate(subs)
            for term, w in sorted(sub.items())
        ]
        hqueries = spark.createDataFrame(
            hrows, "query_id long, subquery_idx int, term string, weight double"
        )
        tables = IndexTables(
            postings=postings, doclens=doclens, term_stats=term_stats, meta=meta_df
        )

        def run_batch():
            return keyed(
                hybrid_topk_batch(
                    postings, doclens, term_stats, meta_df, hqueries,
                    n_subqueries=2, k=10,
                ).collect()
            )

        def run_looped():
            res = {}
            for qid, subs in hdefs.items():
                for r in hybrid_topk(tables, subs, k=10).collect():
                    res[(qid, r["rank"])] = (r["docID"], round(r["score"], 9))
            return res

    # warm both paths once (JIT, python workers, page faults)
    wb, wl = run_batch(), run_looped()
    assert wb == wl, "batch != looped on warm pass"
    log(f"warm pass done ({len(wb)} ranked rows, identical)")

    batch_walls, loop_walls = [], []
    for trial in range(args.trials):
        t1 = time.time()
        rb = run_batch()
        batch_walls.append(round(time.time() - t1, 3))
        t1 = time.time()
        rl = run_looped()
        loop_walls.append(round(time.time() - t1, 3))
        assert rb == rl, f"trial {trial}: batch != looped"
        log(f"trial {trial}: batch {batch_walls[-1]}s, looped {loop_walls[-1]}s")

    out = {
        "mode": args.mode,
        "turns": args.turns,
        "n_queries": args.nq,
        "cpus": args.cpus,
        "batch_sec": min(batch_walls),
        "looped_sec": min(loop_walls),
        "amortization": round(min(loop_walls) / min(batch_walls), 2),
        "all_walls": {"batch": batch_walls, "looped": loop_walls},
        "rank_identical": True,
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
