"""MAXSCORE non-essential handling: kernel vs distributed-semijoin vs
relational, interleaved in one window (BENCH.md §4.1 evidence).

Reuses the index tools/latency_bench.py builds at /dev/shm/latency_bench/idx
(2 M turns, Zipf 100k vocab, 48 tok/turn by default — build it first if
missing). Queries mix dense head terms with upweighted rare terms so the
essential/non-essential split activates; each trial runs the three modes
back-to-back so host drift hits them equally:

  relational : bm25_topk join-agg (the auto-router's head-query choice)
  kernel     : wand_topk, cand_limit=2M — candidate docIDs broadcast,
               NE postings filtered inside the decode kernel
  semijoin   : wand_topk, cand_limit=0 — forces the >cand_limit regime:
               candidate zones + docIDs stay distributed (left-semi joins)

Rank+score identity (6dp) asserted across all three every trial.

Usage: python tools/maxscore_semijoin_bench.py [--idx PATH] [--trials 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


QUERIES: dict[str, dict[str, float]] = {
    # two dense heads + two upweighted mid/rare terms — the split classifies
    # the heads non-essential once θ is seeded from the rare terms
    "mixed4": {"w1": 1.0, "w5": 1.0, "w5017": 4.0, "w20011": 2.0},
    # three heads + one heavily upweighted rare term
    "head3_rare": {"w2": 1.0, "w3": 1.0, "w7": 1.0, "w40009": 8.0},
    # head pair + rare pair
    "pairs": {"w1": 1.0, "w11": 1.0, "w30013": 3.0, "w60017": 3.0},
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--idx", type=str, default="/dev/shm/latency_bench/idx")
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--trials", type=int, default=3)
    args = ap.parse_args()

    from neural_search_spark.index.store import IndexStore
    from neural_search_spark.query.segment_search import wand_topk
    from neural_search_spark.session import get_spark

    if not os.path.exists(os.path.join(args.idx, "meta.json")):
        raise SystemExit(f"no index at {args.idx} — run tools/latency_bench.py first")
    spark = get_spark(
        "maxscore-bench", master=f"local[{args.cpus}]", shuffle_partitions=args.cpus
    )
    spark.sparkContext.setLogLevel("ERROR")
    store = IndexStore(spark, args.idx)
    n_docs, avgdl = store.meta["N"], store.meta["avgdl"]

    def run(qname: str, mode: str):
        terms = QUERIES[qname]
        t0 = time.time()
        stats: dict = {}
        if mode == "relational":
            rows = store.topk(terms, k=10, strategy="relational").collect()
        else:
            limit = 2_000_000 if mode == "kernel" else 0
            rows = wand_topk(
                store.segments, store.term_stats, n_docs, avgdl, terms,
                k=10, cand_limit=limit, stats_out=stats,
            ).collect()
        wall = time.time() - t0
        if mode != "relational":
            assert stats.get("nonessential_terms"), (qname, mode, stats)
            want = "kernel" if mode == "kernel" else "semijoin"
            assert stats.get("cand_mode") == want, (qname, mode, stats)
        return wall, [(r["docID"], round(r["score"], 6)) for r in rows], stats

    modes = ("relational", "kernel", "semijoin")
    # warm pass: every (query, mode) once, identity asserted
    for qname in QUERIES:
        ref = None
        for mode in modes:
            _, rows, _ = run(qname, mode)
            if ref is None:
                ref = rows
            assert rows == ref, (qname, mode)
    log("warm pass done, all modes rank+score identical")

    walls: dict[str, dict[str, list[float]]] = {q: {m: [] for m in modes} for q in QUERIES}
    tele: dict[str, dict] = {}
    for trial in range(args.trials):
        for qname in QUERIES:
            for mode in modes:
                w, _rows, stats = run(qname, mode)
                walls[qname][mode].append(round(w, 3))
                if mode != "relational":
                    tele[f"{qname}:{mode}"] = {
                        k: stats.get(k)
                        for k in ("theta", "blocks_total", "blocks_surviving",
                                  "blocks_ne_decoded", "nonessential_terms",
                                  "cand_mode", "cand_count")
                    }
            log(f"trial {trial} {qname}: " + ", ".join(
                f"{m}={walls[qname][m][-1]}s" for m in modes))

    out = {"turns_index": args.idx, "trials": args.trials, "queries": {}}
    for qname in QUERIES:
        mins = {m: min(walls[qname][m]) for m in modes}
        out["queries"][qname] = {
            **{f"{m}_sec": mins[m] for m in modes},
            "semijoin_vs_kernel": round(mins["kernel"] / mins["semijoin"], 2),
            "wand_vs_relational_kernel": round(mins["relational"] / mins["kernel"], 2),
            "wand_vs_relational_semijoin": round(mins["relational"] / mins["semijoin"], 2),
            "all_walls": walls[qname],
            "telemetry": {m: tele.get(f"{qname}:{m}") for m in ("kernel", "semijoin")},
        }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
