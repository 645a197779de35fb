"""A/B: packed (4×int64) vs unpacked (6-column) segment exchange.

The host's wall clock swings 2-4× between identical runs, so cross-commit
wall comparisons are meaningless. This tool runs BOTH exchange layouts in
ONE process, interleaved (A,B,A,B,…), over the same materialized postings
parquet, timing shuffle + sort + encode + dict-join (count only, no write)
and sampling the process tree's CPU seconds around each run — cpu-sec is
robust to co-tenant wall noise; bytes moved come from the shuffle metrics.

Usage: python tools/ab_packed_exchange.py <cores> [turns] [trials]
Prints one JSON line to stdout.
"""
from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def tree_cpu_sec() -> tuple[float, float]:
    me = os.getpid()
    children: dict[int, list] = {}
    for stat in glob.glob("/proc/[0-9]*/stat"):
        try:
            parts = open(stat).read().rsplit(")", 1)[1].split()
            pid = int(stat.split("/")[2])
            ppid = int(parts[1])
            ut = int(parts[11]) / os.sysconf("SC_CLK_TCK")
            st = int(parts[12]) / os.sysconf("SC_CLK_TCK")
            children.setdefault(ppid, []).append((pid, ut, st))
        except Exception:
            pass
    tu, ts, stack, seen = 0.0, 0.0, [me], set()
    pid_cpu = {pid: (ut, st) for kids in children.values() for pid, ut, st in kids}
    while stack:
        pid = stack.pop()
        if pid in seen:
            continue
        seen.add(pid)
        u, s = pid_cpu.get(pid, (0.0, 0.0))
        tu += u
        ts += s
        stack.extend(k for k, _, _ in children.get(pid, []))
    return tu, ts


def main() -> None:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    turns = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
    trials = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from neural_search_spark.data import synthesize_transcripts
    from neural_search_spark.index.segments import (
        BLOCK_SIZE,
        POSTINGS_PER_SALT,
        SEGMENT_SCHEMA,
        _encode_chunk,
        build_segments,
    )
    from neural_search_spark.index.store import build_index
    from neural_search_spark.session import get_spark

    spark = get_spark("ab-packed", master=f"local[{cores}]", shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    base = f"/dev/shm/ab_packed_{cores}"
    shutil.rmtree(base, ignore_errors=True)
    tr = synthesize_transcripts(
        spark, n_convs=turns // 10, turns_per_conv=10, tokens_per_turn=24, partitions=64
    )
    build_index(spark, tr, base, source_fingerprint="ab", resume=False)
    postings = spark.read.parquet(os.path.join(base, "postings"))
    term_stats = spark.read.parquet(os.path.join(base, "term_stats"))
    doclens = spark.read.parquet(os.path.join(base, "doclens"))
    m = doclens.agg(F.count("*").alias("N"), F.avg("dl").alias("avgdl")).first()
    n_docs, avgdl = int(m["N"]), float(m["avgdl"])

    def packed():
        return build_segments(
            postings, avgdl=avgdl, max_doc_id=n_docs - 1, term_stats=term_stats
        )

    # the round-2 layout: 6 separate columns through the exchange/sort
    def unpacked():
        num_partitions = spark.sparkContext.defaultParallelism * 2
        head = term_stats.filter(F.col("df") > POSTINGS_PER_SALT).select(
            "term", F.ceil(F.col("df") / POSTINGS_PER_SALT).cast("int").alias("n_salts")
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
        in_cols = ["_tid", "_tid2", "salt", "docID", "tf", "dl"]

        def encode_partition(batches):
            pending = None
            for batch in batches:
                if batch.num_rows == 0:
                    continue
                cols = {
                    name: batch.column(name).to_numpy().astype(np.int64, copy=False)
                    for name in in_cols
                }
                if pending is not None:
                    cols = {k: np.concatenate([pending[k], cols[k]]) for k in in_cols}
                    pending = None
                g, g2, s = cols["_tid"], cols["_tid2"], cols["salt"]
                tail = (g == g[-1]) & (g2 == g2[-1]) & (s == s[-1])
                ntail = len(g) if tail.all() else int(tail[::-1].argmin())
                cut = len(g) - ntail
                pending = {k: v[cut:].copy() for k, v in cols.items()}
                if cut:
                    yield _encode_chunk({k: v[:cut] for k, v in cols.items()}, avgdl, BLOCK_SIZE)
            if pending is not None and len(pending["_tid"]):
                yield _encode_chunk(pending, avgdl, BLOCK_SIZE)

        tid_schema = T.StructType(
            [T.StructField("_tid", T.LongType(), False), T.StructField("_tid2", T.LongType(), False)]
            + [f for f in SEGMENT_SCHEMA.fields if f.name != "term"]
        )
        blocks = shuffled.mapInArrow(encode_partition, schema=tid_schema)
        tdict = term_stats.select(
            F.xxhash64("term").alias("_tid"),
            F.xxhash64("term", F.lit(0x9E3779B9)).alias("_tid2"),
            "term",
        )
        return blocks.join(tdict, ["_tid", "_tid2"]).select(
            *[f.name for f in SEGMENT_SCHEMA.fields]
        )

    # warm both paths (page-backing + JIT), then interleave timed trials
    na = packed().count()
    nb = unpacked().count()
    assert na == nb, (na, nb)
    results: dict[str, list] = {"packed": [], "unpacked": []}
    for _ in range(trials):
        for name, fn in (("packed", packed), ("unpacked", unpacked)):
            u0, s0 = tree_cpu_sec()
            t0 = time.time()
            fn().count()
            wall = time.time() - t0
            u1, s1 = tree_cpu_sec()
            results[name].append(
                {"wall": round(wall, 2), "utime": round(u1 - u0, 1), "stime": round(s1 - s0, 1)}
            )
            print(f"  {name}: {results[name][-1]}", file=sys.stderr, flush=True)
    out = {
        "cores": cores, "turns": turns, "blocks": na,
        "packed_best": min(results["packed"], key=lambda r: r["wall"]),
        "unpacked_best": min(results["unpacked"], key=lambda r: r["wall"]),
        "packed_min_cpu": min(r["utime"] + r["stime"] for r in results["packed"]),
        "unpacked_min_cpu": min(r["utime"] + r["stime"] for r in results["unpacked"]),
        "all": results,
    }
    print(json.dumps(out), flush=True)
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
