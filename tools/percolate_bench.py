"""Million-rule percolate witness (round-5 task: VERDICT r4 #6).

Registers 10⁵ and 10⁶ boolean term rules against a 2 M-turn synthetic
transcripts corpus and times the percolate pass on BOTH physical rule
paths — broadcast (default) and shuffle hash join (broadcast_rules=False)
— asserting identical match counts. The rule table is generated
DISTRIBUTED (spark.range → explode), never a driver-side list, so 10⁶
rules cost no driver memory.

The point being witnessed: percolate is ONE pass over the docs regardless
of rule count — rules ride a broadcast (or one small exchange), the only
corpus-sized shuffle is the map-side-combinable (docID, query_id) count.
No per-rule Spark job exists anywhere.

Usage: python tools/percolate_bench.py [--turns 2000000] [--cpus 32]
Prints one JSON report; paste into BENCH.md.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def synthesize_rules(
    spark: SparkSession, n_rules: int, vocab_size: int, max_terms: int = 4
) -> DataFrame:
    """(query_id, term, min_match) generated distributed and deterministic:
    rule i has 2..max_terms terms drawn from the Zipf vocabulary by a
    xxhash-derived index (head-biased via modular squashing, matching how
    real alerting rules over-target frequent terms), min_match=2."""
    n_terms = F.lit(2) + F.pmod(F.xxhash64(F.col("id"), F.lit(7)), F.lit(max_terms - 1))
    rules = spark.range(n_rules).select(
        F.col("id").alias("query_id"),
        F.explode(F.sequence(F.lit(0), n_terms - 1)).alias("slot"),
        n_terms.alias("_nt"),
    )
    # term index: UNIFORM over the vocabulary. Alerting rules target
    # selective terms; a head-biased draw (an earlier revision squared the
    # hash into the Zipf head) makes every rule contain w1-class terms and
    # the candidate join explodes to billions of rows — that measures the
    # rule AUTHOR's mistake, not the engine. Uniform terms give
    # E[hit rows] = rule_rows/vocab × total corpus tokens (~300 M at 10⁶
    # rules on 2 M turns), the realistic bulk-tagging shape.
    u = F.pmod(F.xxhash64(F.col("query_id"), F.col("slot"), F.lit(13)), F.lit(10_000))
    tidx = (u * F.lit(vocab_size) / F.lit(10_000)).cast("long") + 1
    return (
        rules.select(
            "query_id",
            F.concat(F.lit("w"), tidx.cast("string")).alias("term"),
            F.lit(2).cast("int").alias("min_match"),
        )
        .dropDuplicates(["query_id", "term"])
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--turns", type=int, default=2_000_000)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--vocab-size", type=int, default=100_000)
    ap.add_argument("--rule-counts", type=str, default="100000,1000000")
    args = ap.parse_args()

    sys.path.insert(0, __file__.rsplit("/tools/", 1)[0])
    from neural_search_spark.data import synthesize_transcripts
    from neural_search_spark.query.percolate import percolate
    from neural_search_spark.session import get_spark

    spark = get_spark(
        "percolate-bench", master=f"local[{args.cpus}]", shuffle_partitions=args.cpus
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = synthesize_transcripts(
        spark,
        n_convs=args.turns // 10,
        turns_per_conv=10,
        partitions=args.cpus,
        tokens_per_turn=48,
        min_tokens=6,
        burstiness=0.15,
        vocab_size=args.vocab_size,
    ).withColumn("docID", F.monotonically_increasing_id()).persist()
    n_docs = docs.count()  # materialize once, outside every timed window

    report: dict = {"turns": n_docs, "cpus": args.cpus, "runs": []}
    for n_rules in [int(x) for x in args.rule_counts.split(",")]:
        rules = synthesize_rules(spark, n_rules, args.vocab_size).persist()
        n_rule_rows = rules.count()
        for bcast in (True, False):
            # warm once (page cache, python workers), then time min-of-2
            walls, matches = [], None
            for _ in range(3):
                t0 = time.time()
                m = (
                    percolate(docs, rules, broadcast_rules=bcast)
                    .agg(
                        F.count("*").alias("pairs"),
                        F.countDistinct("query_id").alias("rules_hit"),
                    )
                    .first()
                )
                walls.append(time.time() - t0)
                matches = (int(m["pairs"]), int(m["rules_hit"]))
            plan = (
                percolate(docs, rules, broadcast_rules=bcast)
                ._jdf.queryExecution().executedPlan().toString()
            )
            report["runs"].append(
                {
                    "n_rules": n_rules,
                    "n_rule_rows": n_rule_rows,
                    "path": "broadcast" if bcast else "shuffle",
                    "wall_min_s": round(min(walls[1:]), 2),
                    "wall_all_s": [round(w, 2) for w in walls],
                    "match_pairs": matches[0],
                    "rules_hit": matches[1],
                    "docs_per_sec": int(n_docs / min(walls[1:])),
                    "join": (
                        "BroadcastHashJoin"
                        if "BroadcastHashJoin" in plan
                        else ("ShuffledHashJoin" if "ShuffledHashJoin" in plan
                              else "SortMergeJoin")
                    ),
                }
            )
            print(json.dumps(report["runs"][-1]), file=sys.stderr, flush=True)
        # both paths must agree per rule count
        pair_counts = {r["match_pairs"] for r in report["runs"] if r["n_rules"] == n_rules}
        assert len(pair_counts) == 1, f"path mismatch at {n_rules}: {pair_counts}"
        rules.unpersist()
    docs.unpersist()
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
