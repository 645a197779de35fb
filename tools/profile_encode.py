"""Bisect the segments encode path: shuffle+sort vs python encode vs dict join.

Usage: python tools/profile_encode.py <cores> [turns]
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
    from neural_search_spark.index import segments as S

    spark = get_spark("profile-encode", master=f"local[{cores}]", shuffle_partitions=64)
    base = f"/dev/shm/prof_enc_{cores}"
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
    num_partitions = spark.sparkContext.defaultParallelism * 2

    head = term_stats.filter(F.col("df") > S.POSTINGS_PER_SALT).select(
        "term", F.ceil(F.col("df") / S.POSTINGS_PER_SALT).cast("int").alias("n_salts")
    )
    df = postings.join(F.broadcast(head), "term", "left").withColumn(
        "n_salts", F.coalesce(F.col("n_salts"), F.lit(1))
    )
    width = F.greatest(F.ceil(F.lit(n_docs) / F.col("n_salts")), F.lit(1))
    df = df.withColumn("salt", (F.col("docID") / width).cast("int")).drop("n_salts")
    shuffled = (
        df.select(
            F.xxhash64("term").alias("_tid"),
            F.xxhash64("term", F.lit(0x9E3779B9)).alias("_tid2"),
            "salt", "docID", "tf", "dl",
        )
        .repartition(num_partitions, "_tid", "salt")
        .sortWithinPartitions("_tid", "_tid2", "salt", "docID")
    )

    out: dict[str, float] = {"cores": cores, "turns": turns}

    def timed(name, fn):
        t0 = time.time()
        fn()
        out[name] = round(time.time() - t0, 2)
        print(f"  {name}: {out[name]}s", file=sys.stderr)

    full = S.build_segments(postings, avgdl=avgdl, max_doc_id=n_docs - 1, term_stats=term_stats)
    full.count()  # warm

    timed("scan_only", lambda: postings.count())
    timed("salt_scan", lambda: df.count())
    timed("shuffle_sort", lambda: shuffled.count())
    # shuffle+sort+python encode, NO dict join
    in_cols = ["_tid", "_tid2", "salt", "docID", "tf", "dl"]
    tid_schema = "_tid long, _tid2 long, salt int, blockID int, first_docID long, last_docID long, n int, max_score_component float, docids binary, tfs binary, dls binary"
    import numpy as np

    def encode_partition(batches):
        pending = None
        for batch in batches:
            if batch.num_rows == 0:
                continue
            cols = {name: batch.column(name).to_numpy().astype(np.int64, copy=False) for name in in_cols}
            if pending is not None:
                cols = {k: np.concatenate([pending[k], cols[k]]) for k in in_cols}
                pending = None
            g, g2, s = cols["_tid"], cols["_tid2"], cols["salt"]
            tail = (g == g[-1]) & (g2 == g2[-1]) & (s == s[-1])
            ntail = len(g) if tail.all() else int(tail[::-1].argmin())
            cut = len(g) - ntail
            pending = {k: v[cut:].copy() for k, v in cols.items()}
            if cut:
                yield S._encode_chunk({k: v[:cut] for k, v in cols.items()}, avgdl, S.BLOCK_SIZE)
        if pending is not None and len(pending["_tid"]):
            yield S._encode_chunk(pending, avgdl, S.BLOCK_SIZE)

    enc = shuffled.mapInArrow(encode_partition, schema=tid_schema)
    timed("shuffle_sort_encode", lambda: enc.count())
    timed("full_with_dictjoin", lambda: full.count())
    print(json.dumps(out))
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
