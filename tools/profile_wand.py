"""Phase-level profile of wand_topk vs relational bm25 on a kept index.

Builds the crossover corpus index into /dev/shm/wand_prof_<turns> once
(reused across invocations), then times both paths with wand phase
breakdown. Usage: python tools/profile_wand.py <turns> [query_terms...]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    turns = int(sys.argv[1])
    terms = sys.argv[2:] or ["the"]
    from pyspark.sql import functions as F

    from neural_search_spark.data import assign_doc_ids, synthesize_transcripts
    from neural_search_spark.index.build import (
        build_doclens_from_postings,
        build_index_tables,
        build_term_stats,
        collection_meta,
    )
    from neural_search_spark.index.segments import build_segments, write_segments
    from neural_search_spark.query.bm25 import bm25_topk
    from neural_search_spark.query.segment_search import wand_topk
    from neural_search_spark.session import get_spark

    spark = get_spark("wand-prof", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    base = f"/dev/shm/wand_prof_{turns}"
    if not os.path.exists(os.path.join(base, "_done")):
        t0 = time.time()
        tr = assign_doc_ids(
            synthesize_transcripts(
                spark, n_convs=turns // 10, turns_per_conv=10, partitions=32,
                tokens_per_turn=48, min_tokens=6, burstiness=0.15,
            )
        )
        tables = build_index_tables(tr, doclens_source="postings")
        tables.postings.write.mode("overwrite").parquet(f"{base}/postings")
        postings = spark.read.parquet(f"{base}/postings")
        build_doclens_from_postings(postings).write.mode("overwrite").parquet(f"{base}/doclens")
        doclens = spark.read.parquet(f"{base}/doclens")
        build_term_stats(postings).write.mode("overwrite").parquet(f"{base}/stats")
        term_stats = spark.read.parquet(f"{base}/stats")
        m = collection_meta(doclens).first()
        n_docs, avgdl = int(m["N"]), float(m["avgdl"])
        segs = build_segments(postings, avgdl=avgdl, max_doc_id=n_docs - 1, term_stats=term_stats)
        write_segments(segs, f"{base}/segments")
        json.dump({"N": n_docs, "avgdl": avgdl}, open(f"{base}/_done", "w"))
        print(f"built in {time.time()-t0:.1f}s", file=sys.stderr)
    meta = json.load(open(f"{base}/_done"))
    n_docs, avgdl = meta["N"], meta["avgdl"]
    postings = spark.read.parquet(f"{base}/postings")
    doclens = spark.read.parquet(f"{base}/doclens")
    term_stats = spark.read.parquet(f"{base}/stats")
    segments = spark.read.parquet(f"{base}/segments")

    out = {"turns": turns, "terms": terms}
    for trial in range(2):
        t = time.time()
        rel = bm25_topk(postings, doclens, term_stats, collection_meta(doclens), terms, k=10).collect()
        out[f"relational_{trial}"] = round(time.time() - t, 3)
        stats: dict = {}
        t = time.time()
        wnd = wand_topk(segments, term_stats, n_docs, avgdl, terms, k=10, stats_out=stats).collect()
        out[f"wand_{trial}"] = round(time.time() - t, 3)
        out[f"phases_{trial}"] = stats.get("phase_sec")
        a = sorted((round(r["score"], 9), r["docID"]) for r in rel)
        b_ = sorted((round(r["score"], 9), r["docID"]) for r in wnd)
        assert a == b_, "rank mismatch"
    out["blocks_total"] = stats.get("blocks_total")
    out["blocks_surviving"] = stats.get("blocks_surviving")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
