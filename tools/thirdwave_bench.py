"""Third-wave operator scale check at N turns (default 2 M docs).

Measures, on the synthetic transcripts corpus:
  1. dis_max fused single-scan vs composed per-sub-query scoring
     (interleaved A/B, rank parity asserted) — the plan the DSL picks
     automatically for all-lexical disjunctions must actually win;
  2. terms_set with a per-doc minimum_should_match column over head terms
     (worst case: every posting row of 4 frequent terms flows into the
     threshold aggregation);
  3. match_phrase_prefix with a head fixed term + a fat prefix expansion
     (worst case: positions of `max_expansions` frequent terms union into
     the last slot);
  4. composite-agg bucket paging over conv_id (≈ N/10 buckets): per-page
     cost must stay flat as pages advance — the bounded-paging claim.

Usage: python tools/thirdwave_bench.py [--turns 2000000] [--cpus 32]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def wall(fn) -> tuple[float, int]:
    t0 = time.time()
    n = fn()
    return time.time() - t0, n


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--turns", type=int, default=2_000_000)
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from neural_search_spark.data import assign_doc_ids, synthesize_transcripts
    from neural_search_spark.index.build import build_index_tables
    from neural_search_spark.query.dsl import QueryEngine
    from neural_search_spark.query.phrase import build_positional_postings
    from neural_search_spark.session import get_spark

    spark = get_spark(
        "thirdwave-bench", master=f"local[{args.cpus}]", shuffle_partitions=args.cpus
    )
    tr = assign_doc_ids(
        synthesize_transcripts(spark, n_convs=args.turns // 10, turns_per_conv=10)
    ).persist()
    t = build_index_tables(tr)
    t.postings = t.postings.persist()
    t.postings.count()
    t.doclens = t.doclens.persist()
    t.term_stats = t.term_stats.persist()

    head = [
        r["term"]
        for r in t.term_stats.orderBy(F.col("df").desc()).limit(6).collect()
    ]
    print(f"head terms: {head}", file=sys.stderr)
    docs_msm = tr.withColumn("req_m", (F.col("docID") % 3 + 1).cast("int"))
    eng = QueryEngine(tables=t, docs=docs_msm)

    sub_a = {"match": {"text": {"query": f"{head[0]} {head[2]}"}}}
    sub_b = {"match": {"text": {"query": f"{head[1]} {head[3]}"}}}
    dm_fused = {"dis_max": {"queries": [sub_a, sub_b], "tie_breaker": 0.3}}
    # a bool wrapper has no lexical weights -> forces the composed path
    dm_comp = {"dis_max": {"queries": [sub_a, {"bool": {"must": [sub_b]}}],
                           "tie_breaker": 0.3}}

    def topk_ids(q):
        rows = eng.search(q, k=10).collect()
        return [(r["docID"], round(r["score"], 9)) for r in rows]

    # interleaved A/B, 2 rounds each, min wall
    fused_w, comp_w = [], []
    fused_ids = comp_ids = None
    for _ in range(2):
        w, _n = wall(lambda: len(topk_ids(dm_fused)))
        fused_w.append(w)
        fused_ids = topk_ids(dm_fused)
        w, _n = wall(lambda: len(topk_ids(dm_comp)))
        comp_w.append(w)
        comp_ids = topk_ids(dm_comp)
    assert fused_ids == comp_ids, "fused vs composed rank/score mismatch"
    print(
        f"dis_max 2M docs head-terms: fused {min(fused_w):.2f}s vs composed "
        f"{min(comp_w):.2f}s ({min(comp_w) / min(fused_w):.2f}x), rank-identical",
        file=sys.stderr,
    )

    ts_query = {"terms_set": {"text": {"terms": head[:4],
                                       "minimum_should_match_field": "req_m"}}}
    w, n = wall(lambda: eng.search(ts_query, k=10).count())
    print(f"terms_set 4 head terms, per-doc msm: {w:.2f}s ({n} hits)", file=sys.stderr)

    pos = build_positional_postings(tr).persist()
    pos.count()
    eng_pos = QueryEngine(tables=t, docs=tr, positional=pos)
    ppq = {"match_phrase_prefix": {"text": {
        "query": f"{head[0]} {head[1][0]}", "max_expansions": 50}}}
    w, n = wall(lambda: eng_pos.search(ppq, k=10).count())
    print(
        f"match_phrase_prefix head fixed + '{head[1][0]}*' expansion: "
        f"{w:.2f}s ({n} hits)",
        file=sys.stderr,
    )

    match_all = {"match_all": {}}
    after = None
    walls = []
    for page in range(3):
        body = {"sources": [{"conv": {"terms": {"field": "conv_id"}}}], "size": 1000}
        if after is not None:
            body["after"] = after
        t0 = time.time()
        _, aggs = eng.search_with_aggs(match_all, {"p": {"composite": body}})
        rows = aggs["p"].collect()
        walls.append(time.time() - t0)
        after = {"conv": rows[-1]["conv"]}
    print(
        f"composite paging over ~{args.turns // 10} conv buckets, 1000/page: "
        f"walls {[round(w, 2) for w in walls]} (flat = bounded paging)",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
