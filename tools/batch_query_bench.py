"""Batch-vs-looped multi-query BM25 benchmark (query/batch.py evidence).

Builds the synthetic transcripts index at --turns (Zipf vocabulary), then
times the SAME query set two ways, interleaved:
  looped : bm25_topk once per query — Q postings scans, Q jobs (the
           reference's one-query-per-request model mapped onto Spark)
  batch  : bm25_topk_batch — ONE postings scan + one (query_id, docID)
           exchange for the whole set
Rank identity between the two paths is asserted per trial. Prints one
JSON line with both walls and the amortization factor.

Usage: python tools/batch_query_bench.py [--turns 2000000] [--nq 32]
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

    def run_batch():
        out = bm25_topk_batch(postings, doclens, term_stats, meta_df, queries, k=10)
        return {
            (r["query_id"], r["rank"]): (r["docID"], round(r["score"], 9))
            for r in out.collect()
        }

    def run_looped():
        res = {}
        for qid, terms in qdefs.items():
            for r in bm25_topk(postings, doclens, term_stats, meta_df, terms, k=10).collect():
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
