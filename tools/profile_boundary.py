"""Isolate mapInArrow boundary cost: passthrough UDF over the shuffled
posting stream, vs pure JVM count, at a given core count / Arrow batch size.

Usage: python tools/profile_boundary.py <cores> [batch_rows] [turns]
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
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 65536
    turns = int(sys.argv[3]) if len(sys.argv) > 3 else 2_000_000
    from pyspark.sql import functions as F

    from neural_search_spark.session import get_spark
    from neural_search_spark.data import synthesize_transcripts
    from neural_search_spark.index.store import build_index
    from neural_search_spark.index import segments as S

    spark = get_spark(
        "profile-boundary", master=f"local[{cores}]", shuffle_partitions=64,
        extra_conf={"spark.sql.execution.arrow.maxRecordsPerBatch": str(batch)},
    )
    base = f"/dev/shm/prof_bnd_{cores}"
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

    shuffled = (
        postings.select(
            F.xxhash64("term").alias("_tid"),
            F.xxhash64("term", F.lit(0x9E3779B9)).alias("_tid2"),
            F.lit(0).alias("salt"), "docID", "tf", "dl",
        )
        .repartition(64, "_tid", "salt")
        .sortWithinPartitions("_tid", "_tid2", "salt", "docID")
    )
    schema = "_tid long, _tid2 long, salt int, docID long, tf int, dl int"

    def passthrough(batches):
        for b in batches:
            yield b

    out = {"cores": cores, "batch": batch, "turns": turns}

    def timed(name, fn, reps=2):
        walls = []
        for _ in range(reps):
            t0 = time.time()
            fn()
            walls.append(round(time.time() - t0, 2))
        out[name] = min(walls)
        out[name + "_all"] = walls
        print(f"  {name}: {walls}", file=sys.stderr)

    full = S.build_segments(postings, avgdl=avgdl, max_doc_id=n_docs - 1, term_stats=term_stats)
    full.count()  # warm everything incl. python workers
    timed("jvm_count", lambda: shuffled.count())
    timed("passthrough", lambda: shuffled.mapInArrow(passthrough, schema).count())
    timed("full_encode", lambda: full.count())
    print(json.dumps(out))
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
