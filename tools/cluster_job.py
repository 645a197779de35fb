"""spark-submit job for the standalone-cluster scaling bench.

Runs the production staged index build (store.build_index) over the
deterministic synthetic transcripts table on whatever cluster the submit
gave us (master/executors come from spark-submit conf, NOT from
session.get_spark). One full-size warm pass (fresh executors are cold —
long-lived cluster executors are not), then `trials` timed runs; prints one
JSON line with the best wall and per-stage times.

Usage (via spark-submit): cluster_job.py <turns> <tokens> <shuffle> <seg_path> <trials>
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time


def main() -> None:
    from pyspark.sql import SparkSession

    turns = int(sys.argv[1])
    tokens = int(sys.argv[2])
    shuffle = int(sys.argv[3])
    seg_path = sys.argv[4]
    trials = int(sys.argv[5])

    spark = (
        SparkSession.builder.appName("cluster-scale-bench")
        # same engine conf as session.get_spark, minus master/driver-memory
        # (owned by spark-submit in cluster runs)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.shuffle.sort.bypassMergeThreshold", "1")
        .config("spark.shuffle.file.buffer", "1m")
        .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        # pin to Int.MaxValue: disables the per-row ArrowWriter.sizeInBytes
        # walk in BatchedPythonArrowInput (see session.py)
        .config("spark.sql.execution.arrow.maxBytesPerBatch", str((1 << 31) - 1))
        .config("spark.sql.files.maxPartitionBytes", str(4 * 1024 * 1024))
        .config("spark.sql.files.openCostInBytes", str(256 * 1024))
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", str(4 * 1024 * 1024))
        .config("spark.hadoop.parquet.block.size", str(4 * 1024 * 1024))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    from neural_search_spark.data import synthesize_transcripts
    from neural_search_spark.index.store import build_index

    sc = spark.sparkContext
    n_exec_cores = int(sc.getConf().get("spark.cores.max", "0")) or sc.defaultParallelism

    def run_once(keep: bool = False):
        shutil.rmtree(seg_path, ignore_errors=True)
        tr = synthesize_transcripts(
            spark,
            n_convs=turns // 10,
            turns_per_conv=10,
            tokens_per_turn=tokens,
            partitions=shuffle,
        )
        t0 = time.time()
        stages = build_index(spark, tr, seg_path, source_fingerprint="bench", resume=False)
        t1 = time.time()
        n_blocks = spark.read.parquet(os.path.join(seg_path, "segments")).count()
        if not keep:
            shutil.rmtree(seg_path, ignore_errors=True)
        return {
            "wall": t1 - t0,
            "blocks": n_blocks,
            "stages": {s.stage: round(s.wall_sec, 2) for s in stages},
        }

    run_once()  # full-size warm (fresh executors; see module docstring)
    runs = [run_once(keep=(i == trials - 1)) for i in range(trials)]
    best = min(runs, key=lambda r: r["wall"])

    # query phase over the store the LAST build left behind — the north
    # rule's full pipeline (build → query) under the same spark-submit
    # executors; auto strategy routes relational vs block-max per query
    from neural_search_spark.index.store import IndexStore

    store = IndexStore(spark, seg_path)
    qdefs = {
        "bm25_head": {"the": 1.0, "spark": 1.0, "query": 1.0},
        "bm25_selective": {"tok17": 1.0, "cache": 1.0},
    }
    queries = {}
    for qname, terms in qdefs.items():
        terms = {t: w for t, w in terms.items()}
        t0 = time.time()
        rows = store.topk(terms, k=10).collect()
        queries[qname] = {"wall": round(time.time() - t0, 2), "hits": len(rows)}
    shutil.rmtree(seg_path, ignore_errors=True)

    print(
        json.dumps(
            {
                "cores_max": n_exec_cores,
                "wall_sec": round(best["wall"], 2),
                "turns_per_sec": round(turns / best["wall"], 1),
                "blocks": best["blocks"],
                "stages": best["stages"],
                "all_walls": [round(r["wall"], 2) for r in runs],
                "queries": queries,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
