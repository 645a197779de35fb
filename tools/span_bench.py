"""Span-near scale check: positional build + proximity queries at N turns.

Validates the span_near join-chain design beyond fixture scale: builds
positional postings over the synthetic transcripts corpus (Zipf-ish
vocabulary), then times in-order and unordered 2- and 3-term span queries
against the exact-phrase path, asserting result parity where semantics
coincide (slop=0 in-order == exact phrase match set).

Usage: python tools/span_bench.py [--turns 2000000] [--cpus 32]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--turns", type=int, default=2_000_000)
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from neural_search_spark.data import assign_doc_ids, synthesize_transcripts
    from neural_search_spark.query.phrase import (
        build_positional_postings,
        phrase_match,
        span_near_match,
    )
    from neural_search_spark.session import get_spark

    spark = get_spark(
        "span-bench", master=f"local[{args.cpus}]", shuffle_partitions=args.cpus
    )
    tr = assign_doc_ids(
        synthesize_transcripts(spark, n_convs=args.turns // 10, turns_per_conv=10)
    )
    t0 = time.time()
    pos = build_positional_postings(tr).persist()
    n_pos = pos.count()
    build_wall = time.time() - t0
    print(
        f"positional build: {build_wall:.1f}s ({n_pos} rows, "
        f"{args.turns / build_wall:.0f} turns/s)",
        file=sys.stderr,
    )

    # pick a head pair and a mid pair from the actual vocabulary
    stats = (
        pos.groupBy("term").count().orderBy(F.col("count").desc()).limit(200).collect()
    )
    head = [r["term"] for r in stats[:2]]
    mid = [r["term"] for r in stats[100:102]]
    results = {}
    for name, terms, slop, in_order in (
        ("head2_inorder_slop2", head, 2, True),
        ("head2_unordered_slop2", head, 2, False),
        ("mid2_inorder_slop3", mid, 3, True),
        ("head3_inorder_slop4", [r["term"] for r in stats[:3]], 4, True),
    ):
        t = time.time()
        n = span_near_match(pos, terms, slop=slop, in_order=in_order).count()
        results[name] = {"wall": round(time.time() - t, 2), "matches": n}
        print(f"  {name} {terms}: {results[name]}", file=sys.stderr)
    # parity: slop=0 in-order == exact phrase match set
    t = time.time()
    a = sorted(
        (r["docID"], r["sntf"]) for r in span_near_match(pos, head, slop=0).collect()
    )
    span0_wall = time.time() - t
    t = time.time()
    b = sorted((r["docID"], r["ptf"]) for r in phrase_match(pos, head).collect())
    phrase_wall = time.time() - t
    assert a == b, "slop=0 in-order must equal the exact phrase match set"
    results["parity"] = {
        "span0_wall": round(span0_wall, 2),
        "phrase_wall": round(phrase_wall, 2),
        "docs": len(a),
    }
    print(json.dumps({"turns": args.turns, "positional_rows": n_pos,
                      "build_wall": round(build_wall, 2), "queries": results}))


if __name__ == "__main__":
    main()
