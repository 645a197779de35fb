"""WAND-vs-relational crossover benchmark.

At small corpora the block-max WAND path pays ~6 fixed Spark jobs (θ seed,
block filter, rescue) and loses to the brute-force relational join-agg; the
pruning only pays once per-term posting lists dwarf that overhead. This
tool demonstrates the crossover: build a transcripts index at --turns
(default 2M), store postings AND segments as parquet, then time both paths
on the same queries with pruning telemetry (block counts from stats_out).

Both paths read from parquet with term-predicate pushdown, so the
comparison isolates execution strategy (decode-prune-score vs join-agg),
not storage access.

Usage: python tools/wand_crossover.py [--turns 2000000] [--cpus 32]
Prints one JSON line per query plus a summary JSON to stdout.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
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
    ap.add_argument("--trials", type=int, default=2)
    ap.add_argument("--tokens", type=int, default=48)
    ap.add_argument("--min-tokens", type=int, default=6)
    ap.add_argument("--burstiness", type=float, default=0.15)
    ap.add_argument("--vocab-size", type=int, default=None,
                    help="synthetic Zipf vocabulary size (w1..wV); default = 70-word fixture vocab")
    ap.add_argument("--keep", action="store_true")
    ap.add_argument("--queries", type=str, default=None,
                    help="comma list of query names to run (default: all)")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from neural_search_spark.data import assign_doc_ids, synthesize_transcripts
    from neural_search_spark.index.build import build_index_tables
    from neural_search_spark.index.segments import build_segments, write_segments
    from neural_search_spark.query.bm25 import bm25_topk
    from neural_search_spark.query.segment_search import wand_topk
    from neural_search_spark.session import get_spark

    spark = get_spark(
        "wand-crossover", master=f"local[{args.cpus}]", shuffle_partitions=args.cpus
    )
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="wand_crossover_")
    try:
        t0 = time.time()
        # length variance + term burstiness give posting blocks the score
        # variance block-max pruning exploits on real corpora
        tr = assign_doc_ids(
            synthesize_transcripts(
                spark, n_convs=args.turns // 10, turns_per_conv=10, partitions=args.cpus,
                tokens_per_turn=args.tokens, min_tokens=args.min_tokens,
                burstiness=args.burstiness, vocab_size=args.vocab_size,
            )
        )
        tables = build_index_tables(tr, doclens_source="postings")
        tables.postings.write.mode("overwrite").parquet(f"{tmp}/postings")
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
        m = collection_meta(doclens).first()
        n_docs, avgdl = int(m["N"]), float(m["avgdl"])
        segs = build_segments(
            postings, avgdl=avgdl, max_doc_id=n_docs - 1,
            term_stats=term_stats,
        )
        write_segments(segs, f"{tmp}/segments")
        segments = spark.read.parquet(f"{tmp}/segments")
        log(f"built {args.turns} turns in {time.time() - t0:.1f}s; "
            f"{postings.count()} postings, {segments.count()} blocks")

        if args.vocab_size:
            # Zipf vocab: ranks span the idf spectrum — w1 is the head term
            # (df ≈ N·tokens/lnV), w{V/100} mid-frequency, w{V/10} rare-ish
            V = args.vocab_size
            queries = {
                "head1": ["w1"],
                "head3": ["w1", "w2", "w3"],
                "mid2": [f"w{max(V // 200, 10)}", f"w{max(V // 100, 20)}"],
                "mixed4": ["w1", "w5", f"w{max(V // 100, 20)}", f"w{max(V // 20, 40)}"],
                "midhead2": ["w2", f"w{max(V // 50, 30)}"],
            }
        else:
            queries = {
                "head3": ["the", "data", "spark"],
                "head1": ["the"],
                "mid2": ["index", "query"],
                "mixed4": ["the", "a", "score", "merge"],
            }
        if args.queries:
            want = set(args.queries.split(","))
            queries = {k: v for k, v in queries.items() if k in want}
        results = []
        for name, terms in queries.items():
            rel_times, wand_times = [], []
            # telemetry pass first, OUTSIDE the timed trials: the pruning
            # counters cost ~2s of extra Spark jobs that the relational
            # path doesn't run — timing them in the wand window biased the
            # comparison (and doubles as a page-cache warm for both paths)
            stats = {}
            wand_topk(segments, term_stats, n_docs, avgdl, terms, k=10,
                      stats_out=stats).collect()
            bm25_topk(postings, doclens, term_stats,
                      collection_meta(doclens), terms, k=10).collect()
            for _ in range(args.trials):
                t = time.time()
                rel = bm25_topk(postings, doclens, term_stats,
                                collection_meta(doclens), terms, k=10).collect()
                rel_times.append(time.time() - t)
                t = time.time()
                wnd = wand_topk(segments, term_stats, n_docs, avgdl, terms, k=10)
                wrows = wnd.collect()
                wand_times.append(time.time() - t)
                # compare on 9dp-rounded scores: the two paths sum float
                # contributions in different orders, so exact ties can swap
                # adjacent ranks by one ulp
                a = sorted((round(r["score"], 9), r["docID"]) for r in rel)
                b = sorted((round(r["score"], 9), r["docID"]) for r in wrows)
                assert a == b, f"rank mismatch on {name}: {a} vs {b}"
            rec = {
                "query": name,
                "terms": terms,
                "relational_sec": round(min(rel_times), 3),
                "wand_sec": round(min(wand_times), 3),
                "speedup": round(min(rel_times) / min(wand_times), 3),
                "blocks_total": stats.get("blocks_total"),
                "blocks_surviving": stats.get("blocks_surviving"),
                "blocks_rescued": stats.get("blocks_rescued"),
                "rescue_candidates": stats.get("rescue_candidates"),
                "pruned_ratio": round(
                    1 - (stats.get("blocks_surviving", 0) + stats.get("blocks_rescued", 0))
                    / max(stats.get("blocks_total", 1), 1), 4),
                "zones_total": stats.get("zones_total"),
                "zones_surviving": stats.get("zones_surviving"),
                "blocks_wide": stats.get("blocks_wide"),
                "theta": stats.get("theta"),
            }
            results.append(rec)
            log(json.dumps(rec))
        print(json.dumps({
            "turns": args.turns, "cpus": args.cpus, "n_docs": n_docs,
            "queries": results,
        }))
    finally:
        if not args.keep:
            shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
