"""One-off profiler: where does the segments stage spend time at local[N]?

Synthesizes the 2M-turn bench corpus, materializes the postings parquet once
(same as the staged build), then times segment sub-steps separately:
  encode_only   build_segments -> noop count (first shuffle + sort + encode + dict join)
  write_full    current write path (repartition("shard") + sort + parquet)
  write_bucketed repartition(shard, subbucket) with k sub-buckets
  write_direct  no second shuffle: partitionBy from encode partitions

Usage: python tools/profile_segments.py <cores> [turns]
Prints one JSON line to stdout.
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cores = int(sys.argv[1])
    turns = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
    from pyspark.sql import functions as F

    from neural_search_spark.session import get_spark
    from neural_search_spark.data import synthesize_transcripts
    from neural_search_spark.index.store import build_index
    from neural_search_spark.index.segments import build_segments, shard_col

    spark = get_spark("profile-segments", master=f"local[{cores}]", shuffle_partitions=64)
    base = f"/dev/shm/prof_seg_{cores}"
    shutil.rmtree(base, ignore_errors=True)
    tr = synthesize_transcripts(
        spark, n_convs=turns // 10, turns_per_conv=10, tokens_per_turn=24, partitions=64
    )
    build_index(spark, tr, base, source_fingerprint="prof", resume=False)

    postings = spark.read.parquet(os.path.join(base, "postings"))
    term_stats = spark.read.parquet(os.path.join(base, "term_stats"))
    doclens = spark.read.parquet(os.path.join(base, "doclens"))
    m = doclens.agg(F.count("*").alias("N"), F.avg("dl").alias("avgdl")).first()
    n_docs, avgdl = int(m["N"]), float(m["avgdl"])

    def segs():
        return build_segments(postings, avgdl=avgdl, max_doc_id=n_docs - 1, term_stats=term_stats)

    out: dict[str, float] = {"cores": cores, "turns": turns}

    def timed(name, fn):
        t0 = time.time()
        fn()
        out[name] = round(time.time() - t0, 2)
        print(f"  {name}: {out[name]}s", file=sys.stderr)

    # warm pass (encode + write) so faults/JIT don't pollute the comparison
    p = f"{base}/warm"
    segs().withColumn("shard", shard_col(F.col("term"))).write.mode("overwrite").partitionBy("shard").parquet(p)
    shutil.rmtree(p, ignore_errors=True)

    timed("encode_only", lambda: segs().count())

    def write_full():
        (
            segs().withColumn("shard", shard_col(F.col("term")))
            .repartition("shard")
            .sortWithinPartitions("term", "salt", "blockID")
            .write.mode("overwrite").partitionBy("shard").parquet(f"{base}/w_full")
        )

    def write_bucketed():
        k = max(1, cores // 4)
        (
            segs().withColumn("shard", shard_col(F.col("term")))
            .withColumn("_b", F.pmod(F.xxhash64("term", F.lit(7)), F.lit(k)).cast("int"))
            .repartition("shard", "_b")
            .sortWithinPartitions("term", "salt", "blockID")
            .drop("_b")
            .write.mode("overwrite").partitionBy("shard").parquet(f"{base}/w_bkt")
        )

    def write_direct():
        (
            segs().withColumn("shard", shard_col(F.col("term")))
            .write.mode("overwrite").partitionBy("shard").parquet(f"{base}/w_dir")
        )

    timed("write_full", write_full)
    timed("write_bucketed", write_bucketed)
    timed("write_direct", write_direct)
    print(json.dumps(out))
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
